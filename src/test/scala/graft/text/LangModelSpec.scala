package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs over a 3-word vocabulary: "a b" dominates the bigram table,
  // so docs made of "a b" repetitions score LOW cross-entropy (corpus-
  // typical) and the one doc full of unseen-order words scores HIGH
  private val docs = Seq(
    (0L, "a b a b a b"),
    (1L, "a b a b"),
    (2L, "a b c"),
    (3L, "c c c c"))
    .toDF("doc_id", "text")

  "crossEntropy" should "match a hand-computed interpolated bigram model" in {
    // tokens: doc0 6, doc1 4, doc2 3, doc3 4 → T = 17
    // unigrams: a=6, b=6, c=5
    // bigrams: (a,b)=6, (b,a)=3 (2 in doc0 + 1 in doc1), (b,c)=1, (c,c)=3
    val out = LangModel.crossEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val t = 17.0
    def lp1(c1: Double) = math.log(c1 / t) / math.log(2)
    def lp2(c2: Double, cPrev: Double, cCur: Double) =
      math.log(0.7 * c2 / cPrev + 0.3 * cCur / t) / math.log(2)
    // doc3 "c c c c": first c + 3 × (c,c)
    val h3 = -(lp1(5) + 3 * lp2(3, 5, 5)) / 4
    out(3L)._1 shouldBe 4L
    out(3L)._2 shouldBe (math.rint(h3 * 1e6) / 1e6 +- 1e-9)
    // doc1 "a b a b": first a + (a,b) + (b,a) + (a,b)
    val h1 = -(lp1(6) + 2 * lp2(6, 6, 6) + lp2(3, 6, 6)) / 4
    out(1L)._1 shouldBe 4L
    out(1L)._2 shouldBe (math.rint(h1 * 1e6) / 1e6 +- 1e-9)
  }

  it should "rank corpus-typical documents below outliers" in {
    val h = LangModel.crossEntropy(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc0/doc1 are pure "a b" chains (the corpus mode); doc2 ends in
    // the rare (b,c) transition
    h(0L) should be < h(2L)
    h(1L) should be < h(2L)
  }

  it should "keep count tables at one row per term (no join fan-out)" in {
    // every token of every scorable doc is scored exactly once
    val n = LangModel.crossEntropy(docs).agg(sum("n_tokens")).as[Long].head()
    n shouldBe 17L
  }

  it should "reuse the shared bigram exchange at runtime (x31's stage-reuse bet)" in {
    // r10 repartitioned the bigram stream onto one doc_id exchange so
    // its three consumers (unigram counts, bigram counts, scored join)
    // share ONE execution of the corpus explode lineage via AQE stage
    // reuse. That is a RUNTIME property a static plan dump cannot show
    // (the static Exchange count actually rose) — so this test runs the
    // query and asserts the FINAL adaptive plan contains ReusedExchange
    // nodes; if a Spark upgrade or conf change ever breaks exchange
    // reuse, the query silently pays the triple lineage again and this
    // goes red.
    val df = LangModel.crossEntropy(docs)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString()
    withClue("final adaptive plan:\n" + finalPlan) {
      finalPlan should include("ReusedExchange")
    }
  }

  "dsirLogWeights" should "weight target-like documents above raw-typical ones" in {
    // target = docs 0..9 are "x y" repetitions; raw bulk = 40 docs of
    // hash-distinct filler; probe docs: one "x y" doc and one filler-like
    val target = (0L to 9L).map(i => (i, "x y x y x y"))
    val bulk = (10L to 49L).map(i => (i, s"w${i * 3} w${i * 5} w${i * 7} w${i * 11}"))
    val probe = Seq((100L, "x y x y"), (101L, "w30 w50 w70 w110"))
    val all = (target ++ bulk ++ probe).toDF("doc_id", "text")
    val w = LangModel.dsirLogWeights(all, col("doc_id") < 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    w(100L) should be > w(101L)
    // target exemplars themselves score positive (their features are
    // overrepresented in the target distribution)
    w(0L) should be > 0.0
  }

  it should "sum one log-ratio per bigram occurrence" in {
    val out = LangModel.dsirLogWeights(docs, col("doc_id") === 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(0L) shouldBe 5L // "a b a b a b" has 5 adjacent pairs
    out(3L) shouldBe 3L
  }

  it should "plan the model as broadcast-size state (no pair join, no window)" in {
    val plan = LangModel.dsirLogWeights(docs, col("doc_id") === 0)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "Window"
  }
}
