package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // escape sequences, not glyphs (source-file normalization safety)
  private val combining = "cafe\u0301"
  private val precomposed = "caf\u00e9"
  private val ligature = "\ufb01le"
  private val fullwidth = "\uff21\uff22\uff23"
  private val superscript = "x\u00b2"

  private def norm(s: String, form: String): String =
    Seq(s).toDF("t").select(UnicodeNormalizeExpression($"t", form)).as[String].head()

  behavior of "UnicodeNormalizeExpression"

  it should "compose combining marks under NFC and leave compatibility chars alone" in {
    norm(combining, "NFC") shouldBe precomposed
    norm(precomposed, "NFC") shouldBe precomposed
    norm(ligature, "NFC") shouldBe ligature
    norm(fullwidth, "NFC") shouldBe fullwidth
  }

  it should "fold compatibility characters under NFKC" in {
    norm(ligature, "NFKC") shouldBe "file"
    norm(fullwidth, "NFKC") shouldBe "ABC"
    norm(superscript, "NFKC") shouldBe "x2"
    norm(combining, "NFKC") shouldBe precomposed
  }

  it should "decompose under NFD and round-trip NFC∘NFD" in {
    norm(precomposed, "NFD") shouldBe combining
    norm(norm(precomposed, "NFD"), "NFC") shouldBe precomposed
  }

  it should "pass nulls through and reject bad forms at analysis time" in {
    Seq[Option[String]](None).toDF("t")
      .select(UnicodeNormalizeExpression($"t", "NFC"))
      .as[Option[String]].head() shouldBe None
    an[Exception] should be thrownBy {
      Seq("x").toDF("t").select(UnicodeNormalizeExpression($"t", "NFX")).collect()
    }
  }

  it should "agree between the generated code and the JDK reference" in {
    val df = Seq(s"$precomposed $ligature $superscript", "plain ascii").toDF("t")
    val viaCodegen = df.select(UnicodeNormalizeExpression($"t", "NFKC")).as[String].collect()
    val viaJdk = df.collect().map(r =>
      java.text.Normalizer.normalize(r.getString(0), java.text.Normalizer.Form.NFKC))
    viaCodegen shouldBe viaJdk
  }

  it should "stay map-side inside WholeStageCodegen" in {
    // spark.range, not a local Seq: LocalTableScan folds the projection
    // away and proves nothing about the generated path
    val plan = spark.range(4).select(col("id").cast("string").as("t"))
      .select(UnicodeNormalizeExpression($"t", "NFC"))
      .queryExecution.executedPlan.toString
    // "*(1)" is the WholeStageCodegen marker in the plan string — the
    // expression must sit inside the generated stage, not fall back to
    // an interpreted Project
    plan should include("*(1) Project [unicode_normalize")
    plan should not include "Exchange"
  }
}
