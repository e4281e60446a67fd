package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic 2-factor data in 6 dims: x = f1·a + f2·b + mean,
  // with f1, f2 hash-derived pseudo-randoms in [-1, 1] and axisA ⊥ axisB.
  // True covariance is rank 2: var(f1)·AAᵀ + var(f2)·BBᵀ.
  private val dim = 6
  private val axisA = Array(1.0, 1.0, 0.0, 0.0, 1.0, -1.0).map(_ / 2.0)   // unit
  private val axisB = Array(1.0, -1.0, 1.0, -1.0, 0.0, 0.0).map(_ / 2.0)  // unit, ⊥ a
  private val mu = Array(0.5, -0.25, 0.125, 0.0, 1.0, -1.0)

  private def f(id: Long, salt: Long): Double =
    (((id * 2654435761L + salt) % 2001 + 2001) % 2001 - 1000) / 1000.0

  private def fixture(n: Int) = {
    val rows = (0 until n).map { id =>
      val f1 = 3.0 * f(id, 17)
      val f2 = 1.0 * f(id, 91)
      (id.toLong, (0 until dim).map(i => (mu(i) + f1 * axisA(i) + f2 * axisB(i)).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  behavior of "Pca.jacobiEigen"

  it should "reproduce a known symmetric eigensystem" in {
    // [[2,1],[1,2]] has eigenvalues 3 and 1 with vectors (1,1)/√2, (1,-1)/√2
    val (values, vectors) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    values.sorted.toSeq.zip(Seq(1.0, 3.0)).foreach { case (got, want) =>
      got shouldBe (want +- 1e-12)
    }
    val hi = values.indexOf(values.max)
    math.abs(vectors(0)(hi)) shouldBe (math.sqrt(0.5) +- 1e-12)
    math.abs(vectors(1)(hi)) shouldBe (math.sqrt(0.5) +- 1e-12)
  }

  behavior of "Pca.covariance"

  it should "match a driver-side exact computation" in {
    val n = 400
    val df = fixture(n)
    val got = Pca.covariance(df, dim).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2)).toMap
    got.size shouldBe dim * (dim + 1) / 2
    // reference: plain double accumulation on the driver
    val data = fixture(n).collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val m = (0 until dim).map(i => data.map(_(i)).sum / n)
    for (i <- 0 until dim; j <- i until dim) {
      val c = data.map(v => (v(i) - m(i)) * (v(j) - m(j))).sum / n
      got((i, j)) shouldBe (c +- 1e-6)
    }
  }

  behavior of "Pca.fit / Pca.project"

  it should "recover the 2-factor structure with descending eigenvalues" in {
    val model = Pca.fit(fixture(500), dim)
    model.eigenvalues.length shouldBe dim
    // descending order
    model.eigenvalues.toSeq.sliding(2).foreach {
      case Seq(x, y) => assert(x >= y - 1e-12)
      case _ =>
    }
    // rank-2 data: first two eigenvalues dominate, rest ≈ 0
    assert(model.eigenvalues(1) > 1e-3)
    assert(math.abs(model.eigenvalues(2)) < 1e-9)
    // components orthonormal
    for (k1 <- 0 until 2; k2 <- 0 until 2) {
      val dot = model.components(k1).zip(model.components(k2)).map { case (x, y) => x * y }.sum
      dot shouldBe ((if (k1 == k2) 1.0 else 0.0) +- 1e-9)
    }
    // mean recovered
    model.mean.zip(mu).foreach { case (got, want) => got shouldBe (want +- 0.2) }
  }

  it should "produce projections whose empirical covariance is diag(eigenvalues)" in {
    val df = fixture(500)
    val model = Pca.fit(df, dim, k = 2)
    val proj = Pca.project(df, model)
      .select(col("projected")).as[Seq[Double]].collect()
    val n = proj.length
    def mean(k: Int) = proj.map(_(k)).sum / n
    for (k1 <- 0 until 2; k2 <- k1 until 2) {
      val c = proj.map(p => (p(k1) - mean(k1)) * (p(k2) - mean(k2))).sum / n
      val want = if (k1 == k2) model.eigenvalues(k1) else 0.0
      c shouldBe (want +- 1e-6 * math.max(1.0, model.eigenvalues(k1)))
    }
  }

  it should "whiten to unit variance" in {
    val df = fixture(500)
    val model = Pca.fit(df, dim, k = 2)
    val proj = Pca.project(df, model, whiten = true)
      .select(col("projected")).as[Seq[Double]].collect()
    val n = proj.length
    for (k <- 0 until 2) {
      val m = proj.map(_(k)).sum / n
      val v = proj.map(p => (p(k) - m) * (p(k) - m)).sum / n
      v shouldBe (1.0 +- 1e-6)
    }
  }

  it should "stay map-side in project (no Exchange)" in {
    val df = fixture(50)
    val model = Pca.fit(df, dim, k = 2)
    val plan = Pca.project(df, model).queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
