package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def keys(texts: String*): Seq[(String, String, String)] =
    texts.toDF("text")
      .select(col("text"), TextNormalize.ltKey(col("text")).as("lt"),
        TextNormalize.ttKey(col("text")).as("tt"))
      .as[(String, String, String)]
      .collect()
      .toSeq

  "ltKey" should "be order-insensitive and stemmed" in {
    val Seq((_, lt1, _), (_, lt2, _)) =
      keys("breast cancers", "cancer of the breast")
    lt1 shouldBe "breastcancer"
    lt2 shouldBe "breastcancer" // "of"/"the" are stop words; order sorted away
  }

  "ttKey" should "keep token order and glue dashes" in {
    val Seq((_, _, tt)) = keys("TNF-alpha")
    tt shouldBe "tnfalpha" // dash survives tokenization, stripped by normalize
    val Seq((_, _, tt2)) = keys("alpha TNF")
    tt2 shouldBe "alphatnf" // different order → different TT key
  }

  "transliteration" should "map Greek letters before keying" in {
    val Seq((_, lt, tt)) = keys("α-synuclein")
    tt shouldBe "asynuclein" // α→a, dash kept in TT tokenization then stripped
    lt should include("synuclein") // dash splits in LT path: [a, synuclein]
  }

  "stop-word removal" should "be case-sensitive" in {
    // "AS" (a gene symbol) survives; "as" (conjunction) is removed
    val Seq((_, lt1, _)) = keys("AS protein")
    val Seq((_, lt2, _)) = keys("as protein")
    lt1 shouldBe "asprotein"
    lt2 shouldBe "protein"
  }

  "keys" should "drop to empty for pure-punctuation input" in {
    val r = spark.range(1).select(
      TextNormalize.ltKey(org.apache.spark.sql.functions.lit("--- ;;; ///")).as("lt"))
      .as[String].collect()
    r.head shouldBe ""
  }
}
