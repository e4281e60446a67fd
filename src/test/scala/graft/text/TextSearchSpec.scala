package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "quantum physics of black holes and the event horizon"),
    (2L, "gardening tips the best soil for tomato plants"),
    (3L, "black holes emit hawking radiation says quantum theory"),
    (4L, "the the the the the the the the common words only"),
    (5L, "tomato soup recipe with garden tomato and basil"))
    .toDF("doc_id", "text")

  "bm25TopK" should "rank term-matching docs first with positive scores" in {
    val queries = Seq((100L, Seq("quantum", "holes"))).toDF("query_id", "terms")
    val hits = search(queries, k = 3)
    val ranked = hits.orderBy("rank").select("doc_id").as[Long].collect()
    // docs 1 and 3 contain both terms; doc 4/2/5 contain neither
    ranked.toSet shouldBe Set(1L, 3L)
    hits.filter(col("score") <= 0).count() shouldBe 0
  }

  it should "cap stopwords by document frequency" in {
    // "the" appears in 4 of 5 docs (df > 0.5 * n) — it must not retrieve
    val queries = Seq((100L, Seq("the"))).toDF("query_id", "terms")
    search(queries, k = 5).count() shouldBe 0
  }

  it should "respect k and produce dense ranks per query" in {
    val queries = Seq((1L, Seq("tomato", "black")), (2L, Seq("soil", "radiation")))
      .toDF("query_id", "terms")
    val hits = search(queries, k = 2).cache()
    hits.groupBy("query_id").count().as[(Long, Long)].collect()
      .foreach(_._2 should be <= 2L)
    hits.select("rank").as[Int].collect().foreach(_ should be >= 1)
  }

  private def search(queries: org.apache.spark.sql.DataFrame, k: Int) =
    TextSearch.bm25TopK(docs, queries, k = k)

  "tfidfTopTerms" should "surface rare terms over stopwords, k per doc, exact scores" in {
    val top = TextSearch.tfidfTopTerms(docs, k = 2).cache()
    // at most k terms per doc, ranks dense from 1
    top.groupBy("doc_id").count().as[(Long, Long)].collect()
      .foreach(_._2 should be <= 2L)
    top.filter(col("rank") === 1).count() shouldBe 5L
    // "the" (df 3, tf<=8) never beats a unique term (df 1): unique-term
    // score = tf*(5+1)/2 = 3·tf >= 3; "the" in doc 4: 8*6/4 = 12 — the
    // one doc where a stopword legitimately wins by sheer tf
    val doc4Top = top.filter(col("doc_id") === 4L && col("rank") === 1)
      .select("term").as[String].head()
    doc4Top shouldBe "the"
    // exact rational score: doc 5 has "tomato" tf=2, df("tomato")=2 →
    // 2.0 * 6 / 3 = 4.0 exactly (no rounding anywhere in the operator)
    top.filter(col("doc_id") === 5L && col("term") === "tomato")
      .select("score").as[Double].head() shouldBe 4.0
  }

  it should "drop only never-winning corpus-hot terms under maxDfRatio" in {
    // a corpus where 'filler' is in EVERY doc (df = N) plus one selective
    // term per doc: the capped variant must produce the IDENTICAL top-k —
    // a df ≈ N term scores ~tf and cannot beat a selective term — while
    // removing the hot join/window key (the measured 10M-doc straggler)
    val corpus = (1L to 20L).map(i =>
      (i, s"filler filler filler w$i w$i extra$i")).toDF("doc_id", "text")
    val uncapped = TextSearch.tfidfTopTerms(corpus, k = 2)
    val capped = TextSearch.tfidfTopTerms(corpus, k = 2, maxDfRatio = Some(0.5))
    capped.exceptAll(uncapped).count() shouldBe 0
    uncapped.exceptAll(capped).count() shouldBe 0
    // and the hot term is genuinely gone from the capped scoring stream
    capped.filter(col("term") === "filler").count() shouldBe 0
  }

  "rrfFuse" should "score both-list docs by the exact two-term RRF sum" in {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 10L, 2), (1L, 12L, 1)).toDF("query_id", "doc_id", "rank")
    val fused = TextSearch.rrfFuse(lex, vec, k = 10).cache()
    val byDoc = fused.select("doc_id", "rrf").as[(Long, Double)].collect().toMap
    byDoc(10L) shouldBe (1.0 / 61 + 1.0 / 62)
    byDoc(11L) shouldBe (1.0 / 62)
    byDoc(12L) shouldBe (1.0 / 61)
    // doc 10 appears in both lists — it must out-rank every single-list doc
    fused.filter(col("rank") === 1).select("doc_id").as[Long].head() shouldBe 10L
  }

  it should "keep single-list docs with the absent rank encoded as 0" in {
    val lex = Seq((1L, 10L, 1)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 12L, 1), (2L, 10L, 1)).toDF("query_id", "doc_id", "rank")
    val fused = TextSearch.rrfFuse(lex, vec, k = 10).cache()
    fused.count() shouldBe 3
    fused.filter(col("query_id") === 1L && col("doc_id") === 10L)
      .select("vec_rank").as[Int].head() shouldBe 0
    fused.filter(col("query_id") === 2L && col("doc_id") === 10L)
      .select("lex_rank").as[Int].head() shouldBe 0
    // per-query top-k: ranks dense from 1 within each query
    fused.filter(col("rank") === 1).count() shouldBe 2
  }

  it should "truncate to the fused top k per query" in {
    val lex = (1 to 8).map(i => (1L, i.toLong, i)).toDF("query_id", "doc_id", "rank")
    val vec = (1 to 8).map(i => (1L, (i + 100).toLong, i)).toDF("query_id", "doc_id", "rank")
    val fused = TextSearch.rrfFuse(lex, vec, k = 3)
    fused.count() shouldBe 3
    // equal-rank lex/vec docs tie on rrf — doc_id breaks the tie
    fused.orderBy("rank").select("doc_id").as[Long].collect() shouldBe Array(1L, 101L, 2L)
  }

  "phraseSearch" should "count overlapping occurrences of repeated-word phrases" in {
    val corpus = Seq(
      (1L, "w w w end"),                // "w w" at anchors 1 and 2 — overlap
      (2L, "a w b w w"),                // one occurrence
      (3L, "w b w b w"),                // words present, never adjacent
      (4L, "start w w middle w w end")) // two disjoint occurrences
      .toDF("doc_id", "text")
    val got = TextSearch.phraseSearch(corpus, Seq("w", "w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 2L, 2L -> 1L, 4L -> 2L) // doc 3 absent, not zero
  }

  it should "require the full sequence in order" in {
    val corpus = Seq(
      (1L, "train model on data"),
      (2L, "model train departs now"),
      (3L, "we train model and train model again")).toDF("doc_id", "text")
    val got = TextSearch.phraseSearch(corpus, Seq("train", "model"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 3L -> 2L) // doc 2 has the reversed bigram only
  }

  it should "handle phrases longer than two tokens" in {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "quick brown dog quick brown fox")).toDF("doc_id", "text")
    val got = TextSearch.phraseSearch(corpus, Seq("quick", "brown", "fox"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L)
  }

  "cosinePairs" should "pair topically similar docs and ignore shared stopwords" in {
    // docs 1/3 share the selective terms quantum+black+holes → cosine
    // ≈ 0.22; docs 2/5 share only "tomato" (≈ 0.13, below the bar);
    // "the" (df 3) caps out, so stopword-only doc 4 shares nothing
    val pairs = TextSearch.cosinePairs(docs, minCos = 0.2, maxDf = 2)
      .select("doc1", "doc2", "cosine").as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    pairs.keySet should contain((1L, 3L))
    pairs((1L, 3L)) should be > 0.2
    // every pair involving the stopword-only doc 4 is absent
    pairs.keySet.exists(k => k._1 == 4L || k._2 == 4L) shouldBe false
    // cosine is bounded and symmetric-by-construction (doc1 < doc2)
    pairs.values.foreach { c => c should be <= 1.0 + 1e-12 }
    pairs.keySet.foreach { case (d1, d2) => d1 should be < d2 }
  }

  it should "score an exact duplicate at cosine 1" in {
    val corpus = docs.unionByName(
      docs.filter(col("doc_id") === 1L)
        .select(lit(99L).as("doc_id"), col("text")))
    val pairs = TextSearch.cosinePairs(corpus, minCos = 0.9, maxDf = 10)
      .select("doc1", "doc2", "cosine").as[(Long, Long, Double)].collect()
    pairs.map(p => (p._1, p._2)) should contain((1L, 99L))
    pairs.find(p => p._1 == 1L && p._2 == 99L).get._3 shouldBe 1.0 +- 1e-9
  }
}
