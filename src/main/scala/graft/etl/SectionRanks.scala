package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Publication-section importance table (reference reference.conf:24–32,
  * case class at Configuration.scala:16). Lower rank = more important;
  * weight feeds the harmonic relevance score.
  */
final case class SectionRank(section: String, rank: Int, weight: Double)

object SectionRanks {
  val default: Seq[SectionRank] = Seq(
    SectionRank("title", 1, 1.0),
    SectionRank("abstract", 1, 0.8),
    SectionRank("concl", 1, 0.7),
    SectionRank("results", 2, 0.6),
    SectionRank("discuss", 2, 0.5),
    SectionRank("methods", 3, 0.3),
    SectionRank("other", 4, 0.1))

  def titleWeight(ranks: Seq[SectionRank]): Double =
    ranks.find(_.section == "title").map(_.weight).getOrElse(1.0)

  /** As a broadcastable DataFrame. The reference orderBy'd this before
    * broadcast (Processing.scala:60–64) — physically pointless (broadcast
    * collapses ordering), dropped here.
    */
  def table(spark: SparkSession, ranks: Seq[SectionRank] = default): DataFrame = {
    import spark.implicits._
    ranks.toDF()
  }
}
