package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch properties that make the pruning lossless: the count-min
  * estimate upper-bounds the true count, the Bloom probe never rejects a
  * member, and the end-to-end operators (heavyHitters, bloomSemiJoin)
  * equal their exact counterparts. Plus the plan property the operators
  * exist for: the probe-side pre-filter is a broadcast, not a shuffle.
  */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  // skewed fixture: key k<i> appears i times for i in 1..40 (820 rows);
  // k40 holds 40/820 ≈ 1/20 of the stream
  private lazy val skewed = spark.range(1, 41)
    .selectExpr("explode(sequence(1, id)) as dup", "concat('k', id) as key")
    .select($"key")

  behavior of "cmsRow / cmsEstimate"

  it should "upper-bound every key's true count" in {
    val sketch = Sketches.cmsRow(skewed, $"key", depth = 3, width = 64)
    val est = skewed.groupBy($"key").agg(count(lit(1)).as("true_cnt"))
      .crossJoin(broadcast(sketch))
      .select($"key", $"true_cnt",
        Sketches.cmsEstimate($"cms", $"key", depth = 3, width = 64).as("est"))
      .collect()
    est.length shouldBe 40
    est.foreach(r => r.getLong(2) should be >= r.getLong(1))
  }

  it should "record the exact stream total" in {
    Sketches.cmsRow(skewed, $"key").select($"total").as[Long].head() shouldBe 820L
  }

  behavior of "heavyHitters"

  it should "equal the exact GROUP BY / HAVING result on a skewed stream" in {
    // threshold 1/32 of 820 → cnt ≥ 25.625 → keys k26..k40
    val got = Sketches.heavyHitters(skewed, $"key", denom = 32L)
      .as[(String, Long)].collect().toMap
    val want = skewed.groupBy($"key").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * 32 >= 820).as[(String, Long)].collect().toMap
    want.keySet shouldBe (26 to 40).map(i => s"k$i").toSet
    got shouldBe want
  }

  it should "survive a tight sketch (heavy collisions) because of the exact verify pass" in {
    // width 4 forces massive collisions: estimates inflate, candidates
    // balloon, but the exact pass must still emit exactly the true set
    val got = Sketches.heavyHitters(skewed, $"key", denom = 32L, depth = 2, width = 4)
      .as[(String, Long)].collect().toMap
    got.keySet shouldBe (26 to 40).map(i => s"k$i").toSet
  }

  behavior of "bloomRow / mightContain"

  it should "never reject a member (no false negatives)" in {
    val members = spark.range(0, 2000).selectExpr("concat('m', id) as key")
    val bloom = Sketches.bloomRow(members, $"key")
    members.crossJoin(broadcast(bloom))
      .filter(!Sketches.mightContain($"bloom", $"key"))
      .count() shouldBe 0L
  }

  it should "reject most non-members at the designed FP rate" in {
    val members = spark.range(0, 2000).selectExpr("concat('m', id) as key")
    val others = spark.range(0, 2000).selectExpr("concat('x', id) as key")
    val bloom = Sketches.bloomRow(members, $"key")
    val fp = others.crossJoin(broadcast(bloom))
      .filter(Sketches.mightContain($"bloom", $"key"))
      .count()
    // 2000 keys in 65536 bits, 3 hashes → FP ≈ (1-e^(-3*2000/65536))^3 ≈ 6e-4
    fp.toDouble / 2000 should be < 0.01
  }

  behavior of "bloomSemiJoin"

  it should "equal the exact left-semi join" in {
    val probe = spark.range(0, 5000).selectExpr("id", "concat('p', id % 700) as pk")
    val build = spark.range(0, 100).selectExpr("concat('p', id * 3) as bk")
    val got = Sketches.bloomSemiJoin(probe, $"pk", build, $"bk")
      .select($"id").as[Long].collect().sorted
    val want = probe.join(build, $"pk" === $"bk", "left_semi")
      .select($"id").as[Long].collect().sorted
    got shouldBe want
    want.length should be > 0
  }

  it should "attach the filter via broadcast — no shuffle added to the probe side" in {
    val probe = spark.range(0, 5000).selectExpr("id", "concat('p', id % 700) as pk")
    val build = spark.range(0, 100).selectExpr("concat('p', id * 3) as bk")
    val plan = Sketches.bloomSemiJoin(probe, $"pk", build, $"bk")
      .queryExecution.executedPlan.toString
    plan should include("BroadcastNestedLoopJoin")
    // the probe stream reaches its first exchange only at the final semi
    // join; the bloom filter itself must not repartition it
    plan should include("BroadcastHashJoin")
  }

  behavior of "hll sketch mergeability (a22's kernel)"

  it should "estimate identically whether built whole or unioned from sub-sketches" in {
    // HLL union at equal lgConfigK is lossless: the merged register set
    // is a pure function of the value SET, so sharding the build must
    // not change the estimate by even one count
    val df = spark.range(0, 20000)
      .selectExpr("id % 7 as shard", "concat('v', id % 4831) as v")
    val whole = df.agg(hll_sketch_estimate(hll_sketch_agg($"v", lit(12)))).as[Long].head()
    val merged = df.groupBy($"shard").agg(hll_sketch_agg($"v", lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk", lit(false)))).as[Long].head()
    merged shouldBe whole
    // and the estimate is in the 3-sigma band of the true 4831
    math.abs(merged - 4831L).toDouble should be < 3 * 0.0163 * 4831
  }
}
