package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r10 measurement tool: decompose v14_covariance — product kernel vs
  * explode vs decimal aggregation.
  */
object CovProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"[probe] rows = ${emb.count()}")
    val withX = emb.select(transform(col("embedding"), _.cast("double")).as("x"))
    val prods = graft.functions.VectorExpressions.triangleProducts(col("x"), 64)
    // warm
    withX.select(prods.as("p")).write.format("noop").mode("overwrite").save()
    time("products only (noop)") {
      withX.select(prods.as("p")).write.format("noop").mode("overwrite").save()
    }
    time("products + posexplode (noop)") {
      withX.select(posexplode(prods).as(Seq("pos", "xy")))
        .write.format("noop").mode("overwrite").save()
    }
    time("products + posexplode + groupBy decSum") {
      withX.select(posexplode(prods).as(Seq("pos", "xy")))
        .groupBy(col("pos"))
        .agg(graft.functions.Exact.decSum(col("xy")).as("sxy"), count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    time("products + posexplode + groupBy DOUBLE sum (lower bound)") {
      withX.select(posexplode(prods).as(Seq("pos", "xy")))
        .groupBy(col("pos"))
        .agg(sum(col("xy")).as("sxy"), count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
