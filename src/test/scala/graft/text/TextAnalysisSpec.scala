package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  "sentences" should "split on sentence punctuation, trim, and drop empties" in {
    val out = Seq("Hello world. Hello world. Bye!", "", "   ", "No terminator")
      .toDF("text")
      .select(TextAnalysis.sentences(col("text")).as("s"))
      .as[Seq[String]].collect()
    out(0) shouldBe Seq("Hello world", "Hello world", "Bye")
    out(1) shouldBe Seq.empty
    out(2) shouldBe Seq.empty
    out(3) shouldBe Seq("No terminator")
  }

  "firstOccurrences" should "keep first occurrences in original order" in {
    val out = Seq(Seq("a", "b", "a", "c", "b", "a"), Seq.empty[String], Seq("x"))
      .toDF("arr")
      .select(TextAnalysis.firstOccurrences(col("arr")).as("u"))
      .as[Seq[String]].collect()
    out(0) shouldBe Seq("a", "b", "c")
    out(1) shouldBe Seq.empty
    out(2) shouldBe Seq("x")
  }

  it should "remove repeated sentences within a document end-to-end" in {
    val cleaned = Seq("Buy now. Great offer. Buy now. Limited time. Buy now.")
      .toDF("text")
      .select(concat_ws(" ",
        TextAnalysis.firstOccurrences(TextAnalysis.sentences(col("text")))).as("t"))
      .as[String].head()
    cleaned shouldBe "Buy now Great offer Limited time"
  }

  it should "stay a single narrow map-side stage (no exchange, no generate)" in {
    val plan = Seq("a. b. a.").toDF("text")
      .select(TextAnalysis.firstOccurrences(TextAnalysis.sentences(col("text"))))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "Generate"
  }
}
