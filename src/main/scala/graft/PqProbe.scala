package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r11 measurement tool (guide §1): decompose v13_ivfpq / v11_adc_topk
  * into their pipeline stages (kmeans cells, routing centroids,
  * codebooks, encode, probe+rank) and time each in isolation with the
  * noop sink, so the exchange budget of the composition is attributable
  * to a stage rather than a guess. Each stage re-executes its upstream
  * lineage (no caching — this is a cost decomposition, cumulative times
  * overlap by design).
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pqprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val (dim, m, k, kCells, nprobe) = (64, 4, 16, 8, 2)
    val e = graft.core.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 5)
    // warm the JVM/scan once
    time("warmup corpus count") { e.count() }
    (1 to 2).foreach { rep =>
      time(s"rep$rep kmeansCells (explode fold)") {
        noop(graft.ann.Ann.kmeansCells(e, kCells, 1)) }
      time(s"rep$rep kmeansCells (wide fold)") {
        noop(graft.ann.Ann.kmeansCells(e, kCells, 1, dim)) }
      time(s"rep$rep centroids(post-assign)") {
        val cells = graft.ann.Ann.kmeansCells(e, kCells, 1, dim)
        noop(graft.ann.Ann.centroids(e.join(cells, Seq("vec_id")), "cell")) }
      time(s"rep$rep codebooks") {
        noop(graft.ann.Pq.codebooks(e, dim, m, k, 1)) }
      time(s"rep$rep encode") {
        noop(graft.ann.Pq.encode(e, graft.ann.Pq.codebooks(e, dim, m, k, 1), dim, m)) }
      time(s"rep$rep ivfAdcTopK full") {
        noop(graft.ann.Pq.ivfAdcTopK(e, q, dim, m, k, kCells, nprobe, 3, 1)) }
      time(s"rep$rep adcTopK full (v11 shape)") {
        noop(graft.ann.Pq.adcTopK(e, q, dim, m, k, 10, 1)) }
    }
  }
}
