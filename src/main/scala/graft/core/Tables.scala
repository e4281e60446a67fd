package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader for the driver-generated testdata tables (repo TESTDATA.md).
  * One parquet per table under `dir`; schemas are self-describing and the
  * scans stay columnar so Catalyst pushes filters/projections into them.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
