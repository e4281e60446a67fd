package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection — the data-independent
  * complement to [[Pca]]: no fit pass, no model to ship, distances
  * preserved within (1 ± ε) with k = O(log n / ε²) output dims
  * (Achlioptas 2001, "Database-friendly random projections": ±1 entries
  * suffice — no Gaussians needed). The right front end when the corpus
  * is too young or too churned to earn a PCA fit: LSH bucketing,
  * coarse routing, and sketch-distance screens all run fine on a JL
  * sketch of the embedding.
  *
  * The projection matrix is never materialized as data: entries are
  * ±1/√k decided by the md5 of "seed:row:col", generated driver-side
  * into a literal array — so the projection is a pure codegen'd
  * expression fold (transform + zip_with + aggregate), map-side,
  * shuffle-free, and any engine with md5 can reproduce the exact
  * matrix (the v15 oracle rebuilds it in SQL from the same strings).
  */
object RandomProjection {

  /** The deterministic ±1 sign matrix: +1 when the first hex digit of
    * md5("seed:j:i") is 0–7, else −1 — an unbiased bit, reproducible
    * anywhere md5 exists.
    */
  def signs(dimIn: Int, dimOut: Int, seed: String = "rp"): Array[Array[Double]] =
    Array.tabulate(dimOut, dimIn) { (j, i) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$j:$i".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) 1.0 else -1.0
    }

  /** Append `outCol`: the dimOut-dimensional JL sketch of `embCol`,
    * scaled by 1/√dimOut so inner products and distances land on the
    * original scale in expectation.
    */
  def project(df: DataFrame, dimIn: Int, dimOut: Int,
      embCol: String = "embedding", outCol: String = "projected",
      seed: String = "rp"): DataFrame = {
    val scale = 1.0 / math.sqrt(dimOut.toDouble)
    val m = typedLit(signs(dimIn, dimOut, seed).map(_.map(_ * scale).toSeq).toSeq)
    val x = transform(col(embCol), _.cast("double"))
    df.withColumn(outCol,
      transform(m, row => aggregate(zip_with(x, row, (a, b) => a * b), lit(0.0), _ + _)))
  }
}
