package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
    .toDF("doc_id", "lang")

  "hashSplit" should "assign every row exactly once, near the target ratios, deterministically" in {
    val split = Sampling.hashSplit(docs, "doc_id").cache()
    split.count() shouldBe 2000L
    val byLabel = split.groupBy("split").count().as[(String, Long)].collect().toMap
    byLabel.keySet shouldBe Set("train", "val", "test")
    byLabel("train").toDouble shouldBe 1600.0 +- 160.0
    byLabel("val").toDouble shouldBe 200.0 +- 80.0
    // determinism: a second evaluation assigns identical labels
    val again = Sampling.hashSplit(docs, "doc_id")
    split.join(again.withColumnRenamed("split", "split2"), Seq("doc_id", "lang"))
      .filter(col("split") =!= col("split2")).count() shouldBe 0
  }

  "stratifiedSample" should "keep strata at their rates and drop unlisted strata" in {
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.25)).cache()
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    byLang("en") shouldBe 1000L                       // rate 1.0 keeps all
    byLang("de").toDouble shouldBe 250.0 +- 80.0      // rate 0.25
    Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.5))
      .filter(col("lang") === "de").count() shouldBe 0
  }
}
