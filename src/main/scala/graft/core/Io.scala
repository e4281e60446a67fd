package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.input_file_name
import org.apache.spark.sql.types.StructType

/** Declarative IO layer (reference spark/Helpers.scala:108–126, 208–235:
  * IOResourceConfig-driven readFrom/writeTo).
  *
  * Departure from the reference, by design: readers take an EXPLICIT
  * schema wherever the format cannot self-describe. Schema inference on
  * JSON forces a full pre-pass over the data (at 100 TB that is a second
  * scan of the corpus) and `inferSchema` on CSV likewise; a supplied
  * schema also lets the JSON reader skip unused fields entirely
  * (SURVEY.md §4, column pruning).
  */
object Io {

  final case class ReadSpec(
      format: String,
      path: String,
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty,
      /** tag rows with their source file (reference Grounding.scala:322) */
      withProvenance: Boolean = false)

  final case class WriteSpec(
      format: String,
      path: String,
      options: Map[String, String] = Map.empty,
      partitionBy: Seq[String] = Nil,
      mode: String = "error",
      /** Cap rows per output file (Spark's maxRecordsPerFile): bounds the
        * large end of file sizes without an extra shuffle.
        */
      maxRecordsPerFile: Long = 0L,
      /** Target output file count via a pre-write repartition — the
        * small-file control: a 1000-task stage otherwise writes ≥1000
        * files per dataset (× partition values when partitionBy is set),
        * and at 100 TB the downstream listing/open cost of millions of
        * tiny files is the first operational complaint. Repartitions on
        * the partitionBy columns when present so each partition directory
        * gets coherent files, else round-robin.
        */
      targetFiles: Int = 0)

  /** Formats that cannot self-describe: reads fall back to the schema
    * sidecar, writes emit one.
    */
  private def schemaless(format: String): Boolean =
    format == "json" || format == "csv" || format == "text"

  private def sidecarPath(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_graft_schema.json")

  /** Persist the DataFrame's schema next to a json/csv dataset so a
    * later read needs NO inference pass (underscore-prefixed files are
    * invisible to Spark's file listing, like _SUCCESS). At 100 TB an
    * inferred read of an intermediate is a full extra scan; the sidecar
    * makes `write json → read json` as cheap as parquet schema-wise.
    */
  private def writeSchemaSidecar(df: DataFrame, dir: String): Unit = {
    val p = sidecarPath(dir)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(df.schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readSchemaSidecar(spark: SparkSession, dir: String): Option[StructType] = {
    val p = sidecarPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        Some(org.apache.spark.sql.types.DataType
          .fromJson(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
          .asInstanceOf[StructType])
      } finally in.close()
    }
  }

  def read(spark: SparkSession, spec: ReadSpec): DataFrame = {
    val reader = spark.read.format(spec.format).options(spec.options)
    val schema = spec.schema.orElse(
      if (schemaless(spec.format)) readSchemaSidecar(spark, spec.path) else None)
    val withSchema = schema.fold(reader)(reader.schema)
    val df = withSchema.load(spec.path)
    if (spec.withProvenance) df.withColumn("trace_source", input_file_name()) else df
  }

  def readAll(spark: SparkSession, specs: Map[String, ReadSpec]): Map[String, DataFrame] =
    specs.map { case (k, s) => k -> read(spark, s) }

  def write(df: DataFrame, spec: WriteSpec): Unit = {
    val sized =
      if (spec.targetFiles <= 0) df
      else if (spec.partitionBy.nonEmpty)
        df.repartition(spec.targetFiles,
          spec.partitionBy.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(spec.targetFiles)
    val opts = spec.options ++
      (if (spec.maxRecordsPerFile > 0)
        Map("maxRecordsPerFile" -> spec.maxRecordsPerFile.toString)
      else Map.empty)
    // detect BEFORE save whether mode="ignore" will no-op, so a skipped
    // write cannot replace the sidecar with a schema the on-disk data
    // doesn't have (append intentionally refreshes it: json reads fill
    // fields missing from older files with null, so the newest schema is
    // the right one to advertise)
    val ignored = spec.mode.equalsIgnoreCase("ignore") && {
      val p = new org.apache.hadoop.fs.Path(spec.path)
      p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration).exists(p)
    }
    val w = sized.write.mode(spec.mode).options(opts)
    val p = if (spec.partitionBy.nonEmpty) w.partitionBy(spec.partitionBy: _*) else w
    p.format(spec.format).save(spec.path)
    if (schemaless(spec.format) && !ignored) writeSchemaSidecar(df, spec.path)
  }

  /** Bucketed table spec: pre-shuffling a fact table into `numBuckets` by
    * its join/aggregation key makes every later equi-join or groupBy on
    * that key shuffle-free — the decisive layout choice for repeatedly
    * joined 100 TB tables. Requires saveAsTable (bucket metadata lives in
    * the catalog).
    */
  final case class TableSpec(
      table: String,
      format: String = "parquet",
      numBuckets: Int = 0,
      bucketBy: Seq[String] = Nil,
      sortBy: Seq[String] = Nil,
      mode: String = "error")

  def writeTable(df: DataFrame, spec: TableSpec): Unit = {
    var w = df.write.mode(spec.mode).format(spec.format)
    if (spec.bucketBy.nonEmpty) {
      w = w.bucketBy(spec.numBuckets, spec.bucketBy.head, spec.bucketBy.tail: _*)
      if (spec.sortBy.nonEmpty) w = w.sortBy(spec.sortBy.head, spec.sortBy.tail: _*)
    }
    w.saveAsTable(spec.table)
  }

  def writeAll(outputs: Map[String, (DataFrame, WriteSpec)]): Unit =
    outputs.foreach { case (_, (df, spec)) => write(df, spec) }
}
