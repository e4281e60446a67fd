package graft

import org.apache.spark.sql.functions._

/** Locks ScaleSoak's generator contract at a small N, so the soak's
  * "dup counts are predictable, every run is a sanity check" claim is
  * itself verified: the 50-block structure (ids ≡ 1,2 mod 50 copy the
  * leader, id ≡ 3 appends one word), hashed (non-affine) word choice,
  * English stopword density, and the near-dup embedding perturbation.
  */
class SoakSpec extends SparkSpec {
  import spark.implicits._

  private val n = 5000L
  private lazy val docs = ScaleSoak.documents(spark, n).cache()

  "ScaleSoak.documents" should "plant exactly the designed duplicate structure" in {
    docs.count() shouldBe n
    // ids ≡ 1,2 (mod 50) are byte-identical to their block leader
    val canon = graft.dedup.Dedup.exact(docs)
    canon.select("canonical_id").distinct().count() shouldBe (n - 2 * n / 50)
    // id ≡ 3 (mod 50) shares its leader's 36-word body but not its tail
    val (leader, near) = (docs.filter(col("doc_id") === 100L).head().getString(1),
      docs.filter(col("doc_id") === 103L).head().getString(1))
    near should not be leader
    near.split(' ').take(36).toSeq shouldBe leader.split(' ').take(36).toSeq
    near should endWith("of extra103")
    leader should endWith("of note")
  }

  it should "generate unique non-collapsing texts outside the dup blocks" in {
    // the affine-seed failure mode collapsed the corpus to |vocab|
    // distinct texts; hashed mixing keeps every non-dup text distinct
    val uniques = docs.filter(col("doc_id") % 50 =!= 1 && col("doc_id") % 50 =!= 2)
    uniques.select(md5(col("text"))).distinct().count() shouldBe uniques.count()
  }

  it should "read as English with clean quality for the corpus filters" in {
    val scored = docs.select(
      graft.text.TextAnalysis.langId(col("text")).as("lang"),
      graft.text.TextAnalysis.wordCount(col("text")).as("nw"))
    scored.filter(col("lang") =!= "en").count() shouldBe 0
    scored.agg(min("nw")).as[Int].head() should be >= 36
  }

  "ScaleSoak.embeddings" should "perturb only the last component of near-dup vectors" in {
    val emb = ScaleSoak.embeddings(spark, 500L, dim = 8).cache()
    emb.count() shouldBe 500L
    emb.select(org.apache.spark.sql.functions.size(col("embedding")))
      .distinct().as[Int].collect().toSeq shouldBe Seq(8)
    val v = emb.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toMap
    // copies are identical to the leader; near differs in exactly dim-1
    v(101L) shouldBe v(100L)
    v(103L).init shouldBe v(100L).init
    v(103L).last shouldBe 0.49f
    // non-dup vectors are distinct
    v(104L) should not be v(100L)
  }
}
