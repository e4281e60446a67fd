package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScoringSpec extends SparkSpec {
  import spark.implicits._

  private def harmonicOf(values: Seq[Double], sorted: Boolean): Double =
    Seq(values).toDF("v")
      .select((if (sorted) Scoring.harmonicSorted(col("v")) else Scoring.harmonic(col("v"))).as("h"))
      .as[Double].head()

  private def closedForm(values: Seq[Double]): Double =
    values.sortBy(-_).zipWithIndex.map { case (v, i) => v / math.pow(i + 1, 2) }.sum

  "harmonicSorted" should "match the closed form on a known vector" in {
    // 1/1 + 0.8/4 + 0.5/9
    harmonicOf(Seq(0.5, 1.0, 0.8), sorted = true) shouldBe
      (1.0 + 0.8 / 4 + 0.5 / 9) +- 1e-12
  }

  it should "be permutation-invariant" in {
    val v = Seq(0.3, 0.9, 0.1, 0.7)
    harmonicOf(v, sorted = true) shouldBe harmonicOf(v.reverse, sorted = true) +- 1e-12
  }

  "harmonic (unsorted)" should "respect given order" in {
    harmonicOf(Seq(0.5, 1.0), sorted = false) shouldBe (0.5 + 1.0 / 4) +- 1e-12
  }

  it should "return 0 for the empty vector" in {
    harmonicOf(Seq.empty, sorted = true) shouldBe 0.0
    harmonicOf(Seq.empty, sorted = false) shouldBe 0.0
  }

  "harmonicSorted" should "satisfy closed-form, monotonicity and bound properties" in {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val values = List.fill(rnd.nextInt(9))(rnd.nextDouble())
      val h = harmonicOf(values, sorted = true)
      h shouldBe closedForm(values) +- 1e-9
      // bounded by max * pi^2/6
      if (values.nonEmpty)
        assert(h <= values.max * math.Pi * math.Pi / 6 + 1e-9)
      // adding an element never decreases the score
      val h2 = harmonicOf(values :+ 0.5, sorted = true)
      assert(h2 >= h - 1e-9)
    }
  }

  "cosine" should "handle zero vectors and stay in [-1, 1]" in {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 2.0)),
      (Seq(1.0, 1.0), Seq(1.0, 1.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0)),
      (Seq(1.0, 2.0), Seq(-1.0, -2.0))).toDF("a", "b")
    val sims = df.select(VectorOps.cosine(col("a"), col("b")).as("s")).as[Double].collect()
    sims(0) shouldBe 0.0 +- 1e-12
    sims(1) shouldBe 1.0 +- 1e-12
    sims(2) shouldBe 0.0 // zero-denominator guard
    sims(3) shouldBe -1.0 +- 1e-12
    all(sims.toSeq) should (be >= -1.0 - 1e-9 and be <= 1.0 + 1e-9)
  }

  "l2Norm" should "match the definition" in {
    Seq(Seq(3.0, 4.0)).toDF("v")
      .select(VectorOps.l2Norm(col("v")).as("n")).as[Double].head() shouldBe 5.0 +- 1e-12
  }
}
