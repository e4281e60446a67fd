package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  behavior of "RandomProjection"

  it should "produce a deterministic ±1 sign matrix from the seed" in {
    val a = RandomProjection.signs(16, 4)
    val b = RandomProjection.signs(16, 4)
    a.map(_.toSeq).toSeq shouldBe b.map(_.toSeq).toSeq
    a.flatten.foreach(v => math.abs(v) shouldBe 1.0)
    // a different seed gives a different matrix (not a fixed pattern)
    val c = RandomProjection.signs(16, 4, seed = "other")
    a.map(_.toSeq).toSeq should not be c.map(_.toSeq).toSeq
    // roughly balanced signs — md5 nibbles are unbiased
    val pos = a.flatten.count(_ > 0)
    pos should (be >= 20 and be <= 44)
  }

  it should "match a driver-side reference projection exactly" in {
    val vec = Array.tabulate(8)(i => (i + 1) * 0.5f)
    val m = RandomProjection.signs(8, 3)
    val scale = 1.0 / math.sqrt(3.0)
    val expected = m.map(row =>
      row.zip(vec).foldLeft(0.0) { case (acc, (w, x)) => acc + w * scale * x })
    val got = RandomProjection.project(
      Seq((1L, vec.toSeq)).toDF("vec_id", "embedding"), dimIn = 8, dimOut = 3)
      .select($"projected").as[Seq[Double]].head()
    got.zip(expected).foreach { case (g, e) => g shouldBe e +- 1e-12 }
  }

  it should "be linear: proj(a + b) = proj(a) + proj(b)" in {
    val a = Array.tabulate(8)(i => i * 1.0f)
    val b = Array.tabulate(8)(i => (8 - i) * 0.25f)
    val sum = a.zip(b).map { case (x, y) => x + y }
    val df = Seq((1L, a.toSeq), (2L, b.toSeq), (3L, sum.toSeq)).toDF("vec_id", "embedding")
    val rows = RandomProjection.project(df, 8, 4)
      .select($"vec_id", $"projected").as[(Long, Seq[Double])].collect().toMap
    rows(3L).indices.foreach { k =>
      rows(3L)(k) shouldBe (rows(1L)(k) + rows(2L)(k)) +- 1e-9
    }
  }

  it should "stay map-side: no Exchange in the projection plan" in {
    val plan = RandomProjection.project(
      Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding"), 2, 2)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
