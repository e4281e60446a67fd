package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  behavior of "QualityClassifier.score"

  it should "fold bucket weights left-to-right from the intercept" in {
    // one doc, two bigrams — replicate the fold by hand via bucketIds
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val bids = docs
      .select(QualityClassifier.bucketIds(col("text")).as("b"))
      .as[Seq[Int]].head()
    bids should have size 2
    val weights = Seq.tabulate(256)(b => (b % 7 - 3) / 10.0)
    val z = weights(bids(0)) + weights(bids(1)) + 0.5
    val expected = BigDecimal(1.0 / (1.0 + math.exp(-z)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = QualityClassifier.score(docs, weights, intercept = 0.5)
      .select(col("prob")).as[Double].head()
    got shouldBe expected
  }

  it should "score short documents at sigmoid(intercept) with zero features" in {
    val docs = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    val out = QualityClassifier.score(docs, Seq.fill(256)(1.0), intercept = 0.0)
      .select(col("n_feats"), col("prob")).as[(Int, Double)].collect()
    out.foreach { case (n, p) => n shouldBe 0; p shouldBe 0.5 }
  }

  behavior of "QualityClassifier.fit"

  it should "separate a planted quality signal and hand score the scorer weights" in {
    // high-quality docs share the 'insight rigor' phrasing, low-quality
    // share 'spam noise' — linearly separable in bigram-bucket space
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0)
        (i.toLong, s"deep insight rigor clarity v$i insight rigor", 1.0)
      else
        (i.toLong, s"spam noise click bait v$i spam noise", 0.0)
    }.toDF("doc_id", "text", "label")
    val (w, b) = QualityClassifier.fit(docs, spark, maxIter = 30)
    w should have size 256
    val scored = QualityClassifier.score(docs, w, b)
      .join(docs.select(col("doc_id"), col("label")), Seq("doc_id"))
      .select(col("label"), col("prob")).as[(Double, Double)].collect()
    scored.foreach { case (label, prob) =>
      (if (prob > 0.5) 1.0 else 0.0) shouldBe label
    }
  }
}
