package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.functions.Exact.decSum

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>` → double math): brute-force as the exact baseline,
  * sign-projection LSH buckets and IVF (centroid cells) as the scale
  * paths. Everything is codegen'd column folds — no UDFs — and every
  * plan shape is chosen for the 100 TB case: query sets broadcast,
  * candidate generation shuffles on bucket/cell keys, never N² pairs.
  *
  * The oracle-checked queries (graft.queries.VectorQueries v1–v5)
  * delegate here.
  */
object Ann {

  private def toD(c: Column): Column = VectorOps.toDoubleArray(c)

  /** Exact top-k neighbors for a (broadcastable) query set: one
    * no-shuffle map stage over the candidates + a per-query top-k window.
    */
  def bruteForceKnn(candidates: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val sim = VectorOps.cosine(col("qe"), col("ne"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    candidates.select(col("vec_id").as("neighbor_id"), toD(col("embedding")).as("ne"))
      .crossJoin(broadcast(
        queries.select(col("vec_id").as("query_id"), toD(col("embedding")).as("qe"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), sim.as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Sign-projection code over the first `bits` dimensions — axis
    * hyperplanes; deterministic, so cross-engine reproducible. Same
    * recall/cost shape as random-hyperplane SimHash ANN.
    */
  def signBucket(embedding: Column, bits: Int = 8): Column =
    (1 to bits)
      .map(d => when(element_at(embedding, d) > 0f, lit(1 << (d - 1))).otherwise(lit(0)))
      .reduce(_ + _)
      .cast("int")

  /** Candidate pairs within sign-projection buckets, similarity filtered.
    * The join shuffles on the bucket code (2^bits cells).
    */
  def lshPairs(embeddings: DataFrame, bits: Int = 8, minSim: Double = 0.2): DataFrame = {
    val coded = embeddings.select(
      col("vec_id"), toD(col("embedding")).as("e"),
      signBucket(col("embedding"), bits).as("bucket"))
    val sim = VectorOps.cosine(col("a.e"), col("b.e"))
    coded.alias("a")
      .join(coded.alias("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .filter(sim >= minSim)
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        col("a.bucket").as("bucket"), sim.as("sim"))
  }

  /** Per-cell centroids as (cell, dim, centroid) — exact decimal means so
    * any engine reproduces them bit-for-bit. One map-side-combinable
    * shuffle on (cell, dim).
    */
  def centroidComponents(embeddings: DataFrame, cellCol: String): DataFrame =
    embeddings
      .select(col(cellCol).as("cell"), posexplode(col("embedding")).as(Seq("dim0", "v")))
      .groupBy(col("cell"), (col("dim0") + 1).as("dim"))
      .agg((decSum(col("v").cast("double")) / count(lit(1))).as("centroid"))

  /** Centroids assembled into vectors: (cell, ce: array<double>). */
  def centroids(embeddings: DataFrame, cellCol: String): DataFrame =
    centroidComponents(embeddings, cellCol)
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("centroid")))),
        s => s.getField("centroid")).as("ce"))

  /** IVF search: route each query to its nearest centroid cell (nprobe=1),
    * then exact top-k within that cell only. The fine search shuffles on
    * the cell key; with C cells it scans ~1/C of the corpus per query.
    */
  def ivfSearch(embeddings: DataFrame, cellCol: String, queries: DataFrame, k: Int): DataFrame = {
    val cents = centroids(embeddings, cellCol)
    val toCent = VectorOps.cosine(col("qe"), col("ce"))
    val wAssign = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cell"))
    val assigned = queries
      .select(col("vec_id").as("query_id"), toD(col("embedding")).as("qe"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("qe"), col("cell"), toCent.as("csim"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("qe"), col("cell"))

    val sim = VectorOps.cosine(col("qe"), col("ne"))
    val wTop = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    embeddings
      .select(col(cellCol).as("cell"), col("vec_id").as("neighbor_id"),
        toD(col("embedding")).as("ne"))
      .join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("cell"), col("neighbor_id"), sim.as("sim"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
  }
}
