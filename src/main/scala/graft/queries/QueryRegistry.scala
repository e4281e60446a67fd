package graft.queries

/** Aggregates every query group into the single driver-visible registry.
  * Group files: RelationalQueries (SURVEY.md §2.2–2.8), TextQueries
  * (dedup + text analysis), VectorQueries (similarity search / M-ops),
  * EventQueries (time windows / sessionization), MultimodalQueries.
  */
object QueryRegistry {
  def all: Seq[Q] =
    RelationalQueries.all ++ TextQueries.all ++ VectorQueries.all ++
      EventQueries.all ++ MultimodalQueries.all ++ GraphQueries.all
}
