package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines. Every
  * assignment is a pure function of the row's id hash — stable under
  * reruns, replans, AQE, and cluster size (a random()-based split is
  * none of those), and fully map-side: no shuffle at any corpus size.
  */
object Sampling {

  /** 0..99 bucket from the first four md5 nibbles of the id — the same
    * strpos-free arithmetic both engines evaluate identically (cf. the
    * SimHash vote nibbles).
    */
  def hashBucket(id: Column): Column = {
    def nibble(k: Int): Column =
      conv(substring(md5(id.cast("string")), k + 1, 1), 16, 10).cast("int")
    (nibble(0) * 4096 + nibble(1) * 256 + nibble(2) * 16 + nibble(3)) % 100
  }

  /** Stable train/val/test split labels by id hash. */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    require(trainPct + valPct <= 100, "trainPct + valPct must be <= 100")
    val b = hashBucket(col(idCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic per-stratum downsampling: keep a row iff its hash
    * bucket falls under the stratum's rate. Rates are fractions in
    * [0, 1] at percent granularity; unlisted strata are dropped —
    * the "rebalance a skewed source mix" primitive.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double]): DataFrame = {
    val pct = rates.foldLeft(lit(0)) { case (acc, (stratum, rate)) =>
      when(col(strataCol) === stratum, lit(math.round(rate * 100).toInt)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < pct)
  }
}
