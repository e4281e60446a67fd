package graft.functions

import graft.SparkSpec
import graft.queries.RelationalQueries
import org.apache.spark.sql.functions._

/** a16_stats_aggs computes stddev/corr/covar from exact decimal moments
  * (the only cross-engine hash-stable formulation); this spec proves the
  * moment formula agrees with Spark's builtin stddev_samp/corr/covar_samp
  * to float tolerance, so the builtins remain exercised and the rewrite
  * is semantics-preserving.
  */
class StatsMomentsSpec extends SparkSpec {

  private lazy val sfDir = "/root/testdata/sf0.001"

  "a16 moment formula" should "match builtin stddev_samp/corr/covar_samp" in {
    val s = spark
    val fromMoments = RelationalQueries.statsAggs.run(s, sfDir)
      .orderBy("l_returnflag").collect()
    val builtin = s.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(
        stddev_samp(col("l_quantity")).as("sd_qty"),
        corr(col("l_quantity"), col("l_discount")).as("corr_qd"),
        covar_samp(col("l_discount"), col("l_tax")).as("cov_dt"))
      .orderBy("l_returnflag").collect()
    fromMoments.length shouldBe builtin.length
    fromMoments.zip(builtin).foreach { case (m, b) =>
      m.getString(0) shouldBe b.getString(0)
      m.getDouble(1) shouldBe b.getDouble(1) +- 1e-3
      m.getDouble(2) shouldBe b.getDouble(2) +- 1e-3
      m.getDouble(3) shouldBe b.getDouble(3) +- 1e-5
    }
  }
}
