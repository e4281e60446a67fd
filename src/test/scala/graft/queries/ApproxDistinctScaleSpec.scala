package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** a13's correctness story at real data scale: approx_count_distinct has
  * no cross-engine oracle (HLL sketch layouts differ), so its gate is an
  * error bound against the exact count — asserted here per group over
  * the sf0.01 and sf0.1 lineitem tables, not just the fixture corpus
  * (GroundingSpec). The rsd=0.01 sketch must land within 3·rsd of exact
  * for every group at both scale factors.
  */
class ApproxDistinctScaleSpec extends SparkSpec {
  import spark.implicits._

  private val rsd = 0.01

  private def assertWithinBound(sfDir: String): Unit = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .select(col("l_returnflag"), col("approx").cast("double"),
        col("exact").cast("double"))
      .as[(String, Double, Double)]
      .collect()
    rows.length should be > 0
    rows.foreach { case (flag, approx, exact) =>
      withClue(s"group $flag: approx=$approx exact=$exact: ") {
        math.abs(approx - exact) should be <= 3 * rsd * exact
      }
    }
  }

  "approx_count_distinct(rsd=0.01)" should
    "stay within 3*rsd of exact per group at sf0.01" in {
    assertWithinBound("/root/testdata/sf0.01")
  }

  it should "stay within 3*rsd of exact per group at sf0.1" in {
    assertWithinBound("/root/testdata/sf0.1")
  }
}
