package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  "interleaveBits" should "compute the Morton code exactly" in {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("a", "b")
      .select(Layout.interleaveBits(col("a"), col("b"), bits = 8).as("z"))
      .as[Long].collect()
    // bit k of a -> 2k, bit k of b -> 2k+1
    out(0) shouldBe 0L
    out(1) shouldBe 1L
    out(2) shouldBe 2L
    // a=3 (11), b=5 (101): a bits at 0,2 -> 1+4; b bits at 1,5 -> 2+32
    out(3) shouldBe (1L + 4L + 2L + 32L)
    out(4) shouldBe 0xffffL
    an[IllegalArgumentException] should be thrownBy
      Layout.interleaveBits(col("a"), col("b"), bits = 40)
  }

  "zorderKey" should "normalize in-plan without touching the driver" in {
    val df = (0L until 1000L).map(i => (i, (i * 7919) % 1000)).toDF("a", "b")
    val keyed = Layout.zorderKey(df, "a", "b", bits = 8)
    keyed.count() shouldBe 1000L
    // keys reach both extremes of the 16-bit interleaved space: (0,0)
    // normalizes to z=0, and rows with both dims in the top half set the
    // two highest interleaved bits (the exact max would need both dims'
    // maxima in one row, which this data doesn't contain)
    val r = keyed.agg(min("zkey"), max("zkey")).as[(Long, Long)].head()
    r._1 shouldBe 0L
    r._2 should (be > 0xC000L and be <= 0xffffL)
    keyed.select("zkey").exceptAll(Layout.zorderKey(df, "a", "b", bits = 8)
      .select("zkey")).count() shouldBe 0L
    // no collect in the plan: bounds arrive via a (broadcast) join
    val plan = keyed.queryExecution.executedPlan.toString()
    plan.toLowerCase should include("join")
  }

  "writeZordered" should "shrink per-file min-max ranges on BOTH dimensions" in {
    // two independent uniform dimensions — the case a single-column sort
    // cannot cluster
    val n = 20000L
    val df = (0L until n).map(i => (i, (i * 7919) % n, s"pay$i"))
      .toDF("a", "b", "payload")
    val dir = java.nio.file.Files.createTempDirectory("layout").toString

    Layout.writeZordered(df, s"$dir/zordered", "a", "b", numFiles = 16, bits = 8)
    df.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(s"$dir/bya")

    def avgFrac(path: String, c: String): Double =
      Layout.fileRangeFractions(spark.read.parquet(path), c)
        .agg(avg("range_fraction")).as[Double].head()

    // control: sorting by a leaves b unclustered (~full range per file)
    avgFrac(s"$dir/bya", "a") should be < 0.15
    avgFrac(s"$dir/bya", "b") should be > 0.8
    // z-order: BOTH dimensions' per-file ranges shrink well under global
    avgFrac(s"$dir/zordered", "a") should be < 0.45
    avgFrac(s"$dir/zordered", "b") should be < 0.45
  }
}
