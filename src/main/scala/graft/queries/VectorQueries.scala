package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.queries.Q.{decSum, t}

/** Similarity search over the `embeddings` table (vec_id, embedding
  * float[64], label) — the ANN surface of a training-data pipeline, plus
  * the reference's vector-table export ops (norms/categories, reference
  * Vectors.scala:28–34).
  *
  * All cosine/dot kernels are Spark higher-order functions
  * (graft.functions.VectorOps) — codegen'd, UDF-free — and every fold runs
  * left-to-right in double precision, matching DuckDB's list_* kernels
  * bit-for-bit so results can be hash-compared unrounded (rounding here is
  * only a guard against future engine changes).
  */
object VectorQueries {

  private def emb(c: Column = col("embedding")): Column = VectorOps.toDoubleArray(c)

  /** Brute-force cosine top-k: the exact baseline every ANN variant is
    * measured against. The query side (5 vectors) is broadcast, so the
    * candidate scan is a single no-shuffle map stage followed by a
    * small top-k-per-query window — at 100 TB the same plan holds as long
    * as the query set stays broadcastable.
    */
  val knnBrute: Q = Q(
    "v1_knn_brute",
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings)
      |SELECT query_id, neighbor_id, round(sim, 6) AS sim, CAST(rn AS INT) AS rank FROM (
      |  SELECT query_id, neighbor_id, list_cosine_similarity(qe, ne) AS sim,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY list_cosine_similarity(qe, ne) DESC, neighbor_id) AS rn
      |  FROM q CROSS JOIN c WHERE query_id <> neighbor_id)
      |WHERE rn <= 3""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"), emb().as("qe"))
    val c = e.select(col("vec_id").as("neighbor_id"), emb().as("ne"))
    val sim = VectorOps.cosine(col("qe"), col("ne"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), sim.as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** LSH-bucketed ANN — the scale path. Each vector gets an 8-bit
    * sign-projection code (axis hyperplanes on dims 1..8); candidate pairs
    * are generated only inside a bucket, so the join shuffles on the code
    * (256 buckets) and never materializes N² pairs. Same recall/cost shape
    * as random-hyperplane SimHash ANN, with deterministic hyperplanes so
    * the DuckDB oracle reproduces it exactly.
    */
  val lshAnnPairs: Q = Q(
    "v2_lsh_ann_pairs",
    """WITH coded AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
      |    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) +
      |    (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) +
      |    (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) +
      |    (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) +
      |    (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END) +
      |    (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) +
      |    (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END) +
      |    (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS bucket
      |  FROM embeddings)
      |SELECT a.vec_id AS id1, b.vec_id AS id2, a.bucket AS bucket,
      |  round(list_cosine_similarity(a.e, b.e), 6) AS sim
      |FROM coded a JOIN coded b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.e, b.e) >= 0.2""".stripMargin) { (s, dir) =>
    val bucket = (1 to 8)
      .map(k => when(element_at(col("embedding"), k) > 0f, lit(1 << (k - 1))).otherwise(lit(0)))
      .reduce(_ + _)
    val coded = t(s, dir, "embeddings")
      .select(col("vec_id"), emb().as("e"), bucket.cast("int").as("bucket"))
    val a = coded.alias("a")
    val b = coded.alias("b")
    val sim = VectorOps.cosine(col("a.e"), col("b.e"))
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .filter(sim >= 0.2)
      .select(
        col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        col("a.bucket").as("bucket"), round(sim, 6).as("sim"))
  }

  /** Per-label centroid (IVF coarse-quantizer training shape): posexplode
    * to (label, dim, value), aggregate exactly via decimal, divide by the
    * label count. One shuffle on (label, dim) — fully map-side combinable.
    */
  val labelCentroids: Q = Q(
    "v3_label_centroids",
    """SELECT label, dim,
      |  round(CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,10))) AS DOUBLE) / count(*), 6) AS centroid
      |FROM (SELECT label, generate_subscripts(embedding, 1) AS dim, unnest(embedding) AS v
      |      FROM embeddings)
      |GROUP BY label, dim""".stripMargin) { (s, dir) =>
    t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim0", "v")))
      .groupBy(col("label"), (col("dim0") + 1).as("dim"))
      .agg((decSum(col("v").cast("double")) / count(lit(1))).as("c"))
      .select(col("label"), col("dim"), round(col("c"), 6).as("centroid"))
  }

  /** Vector norms + prefix categories — the reference's vectors-table
    * export (Vectors.scala:28–34: L2 norm + id-prefix category), norms via
    * codegen'd fold instead of the reference's UDF.
    */
  val vectorNorms: Q = Q(
    "v4_vector_norms",
    """SELECT vec_id, round(sqrt(list_dot_product(e, e)), 6) AS norm,
      |  CASE WHEN label < 3 THEN 'low' ELSE 'high' END AS category
      |FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)""".stripMargin) { (s, dir) =>
    t(s, dir, "embeddings").select(
      col("vec_id"),
      round(VectorOps.l2Norm(emb()), 6).as("norm"),
      when(col("label") < 3, "low").otherwise("high").as("category"))
  }

  val all: Seq[Q] = Seq(knnBrute, lshAnnPairs, labelCentroids, vectorNorms)
}
