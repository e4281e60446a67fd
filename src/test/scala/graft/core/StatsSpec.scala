package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: lower discrete quantile by direct sort — smallest value
    * at 1-based rank ceil(q·n) of the sorted sample.
    */
  private def ref(values: Seq[Long], q: Double): Long =
    values.sorted.apply(math.ceil(q * values.size).toInt - 1)

  "Stats.exactQuantiles" should "match sorted-rank selection, duplicates included" in {
    val values = Seq[Long](5, 1, 9, 1, 7, 7, 7, 3, 2, 8, 10, 4)
    val got = Stats.exactQuantiles(values.toDF("v"), col("v"), Seq(0.25, 0.5, 0.9, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    got shouldBe Map(
      0.25 -> ref(values, 0.25), 0.5 -> ref(values, 0.5),
      0.9 -> ref(values, 0.9), 1.0 -> values.max)
  }

  it should "be exact on a skewed distribution where approx_percentile may drift" in {
    // 10k rows, 99% at value 1, tail spread over 100 values
    val df = spark.range(10000)
      .select((when(col("id") < 9900, lit(1L)).otherwise(col("id") % 100 + 100)).as("v"))
    val got = Stats.exactQuantiles(df, col("v"), Seq(0.5, 0.99, 0.995))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val values = df.collect().map(_.getLong(0)).toSeq
    got(0.5) shouldBe ref(values, 0.5)
    got(0.99) shouldBe ref(values, 0.99)
    got(0.995) shouldBe ref(values, 0.995)
  }

  it should "reject out-of-range quantiles" in {
    an[IllegalArgumentException] should be thrownBy
      Stats.exactQuantiles(Seq(1L).toDF("v"), col("v"), Seq(0.0))
  }

  "Stats.groupedExactQuantiles" should "match per-group sorted-rank selection" in {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 10L), ("b", 20L), ("b", 20L))
      .toDF("g", "v")
    val got = Stats.groupedExactQuantiles(df, "g", col("v"), Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    got shouldBe Map(
      ("a", 0.5) -> ref(Seq(1L, 2L, 3L, 4L), 0.5),
      ("a", 1.0) -> 4L,
      ("b", 0.5) -> ref(Seq(10L, 20L, 20L), 0.5),
      ("b", 1.0) -> 20L)
  }

  "Stats.approxQuantilesChecked" should "report the GK sketch inside its rank bound" in {
    val df = spark.range(10000)
      .select((when(col("id") < 9900, lit(1L)).otherwise(col("id") % 100 + 100)).as("v"))
    val got = Stats.approxQuantilesChecked(df, col("v"), Seq(0.5, 0.99, 0.995))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getBoolean(2)))
    got should have size 3
    // every q: bound holds AND the exact side agrees with exactQuantiles
    val exact = Stats.exactQuantiles(df, col("v"), Seq(0.5, 0.99, 0.995))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    got.foreach { case (q, ev, within) =>
      within shouldBe true
      ev shouldBe exact(q)
    }
  }

  it should "flag a mis-ranked sketch value as out of bound (the predicate is falsifiable)" in {
    val df = spark.range(1000).select((col("id") + 1).as("v"))
    // a correct p50 claim (true rank 500) passes at tight accuracy...
    Stats.boundFor(df, col("v"), q = 0.5, approxV = 500L, accuracy = 10000) shouldBe true
    // ...a grossly mis-ranked claim (rank 900 for q=0.5, slack ±1.1)
    // must come back FALSE — if the slack arithmetic ever degenerates to
    // constant-true, this is the test that fails
    Stats.boundFor(df, col("v"), q = 0.5, approxV = 900L, accuracy = 10000) shouldBe false
    // and the slack genuinely widens with lower accuracy: at accuracy 2
    // (±501 ranks) the same wrong value is within its guarantee
    Stats.boundFor(df, col("v"), q = 0.5, approxV = 900L, accuracy = 2) shouldBe true
    // end-to-end sanity unchanged: the real sketch stays in bound and the
    // exact median of 1..1000 is 500 under the lower-discrete convention
    val rows = Stats.approxQuantilesChecked(df, col("v"), Seq(0.5), accuracy = 10000)
      .collect()
    rows.head.getBoolean(2) shouldBe true
    rows.head.getLong(1) shouldBe 500L
  }
}
