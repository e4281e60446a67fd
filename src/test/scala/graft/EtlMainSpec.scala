package graft

import java.nio.file.Files

import graft.SparkSpec
import graft.etl.Fixtures
import org.apache.spark.sql.functions._

/** End-to-end CLI-step dispatch over the fixture corpus: the run() body
  * EtlMain.main drives, against temp dirs.
  */
class EtlMainSpec extends SparkSpec {
  import spark.implicits._

  "EtlMain.run" should "execute all steps and write every dataset" in {
    val in = Files.createTempDirectory("graft-etl-in").toFile.getAbsolutePath
    val out = Files.createTempDirectory("graft-etl-out").toFile.getAbsolutePath + "/run"

    Fixtures.epmc(spark).write.mode("overwrite").json(s"$in/epmc")
    Fixtures.epmcIds(spark).write.mode("overwrite").option("header", "true").csv(s"$in/ids")
    Fixtures.targets(spark).write.mode("overwrite").parquet(s"$in/targets")
    Fixtures.diseases(spark).write.mode("overwrite").parquet(s"$in/diseases")
    Fixtures.drugs(spark).write.mode("overwrite").parquet(s"$in/drugs")

    EtlMain.run("all",
      Map("epmc" -> s"$in/epmc", "epmcids" -> s"$in/ids", "targets" -> s"$in/targets",
        "diseases" -> s"$in/diseases", "drugs" -> s"$in/drugs", "threshold" -> "-2.0"),
      out, "parquet", spark)

    val matches = spark.read.parquet(s"$out/matches")
    matches.count() shouldBe 9
    spark.read.parquet(s"$out/cooccurrences").count() shouldBe 2
    val idx = spark.read.parquet(s"$out/literatureIndex")
    idx.filter(col("pmid") === 1L && col("keywordId") === "ENSG0001")
      .select("relevance").as[Double].head() shouldBe (1.0 + 0.6 / 4 + 0.6 / 9) +- 1e-9
    spark.read.parquet(s"$out/vectors").count() should be > 0L
    val ev = spark.read.parquet(s"$out/evidence")
    ev.columns should contain allOf ("resourceScore", "harmonicCooccurrenceSentiment")
    ev.count() should be > 0L
  }

  it should "reject unknown steps" in {
    val e = intercept[RuntimeException] {
      EtlMain.run("nope", Map.empty, "/tmp/x", "parquet", spark)
    }
    e.getMessage should include("unknown step")
  }
}
