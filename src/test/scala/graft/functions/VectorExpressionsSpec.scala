package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import graft.SparkSpec

/** The codegen vector kernels must be BIT-identical to the zip_with /
  * aggregate column folds they replaced (same accumulation order, same
  * null semantics) — the r10 optimization's correctness contract.
  */
class VectorExpressionsSpec extends AnyFlatSpec with Matchers with SparkSpec {

  private def session = spark

  // the pre-r10 fold forms, verbatim
  private def oldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)
  private def oldSumSq(a: org.apache.spark.sql.Column) =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)
  private def oldL2Dist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))
  private def oldCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val den = sqrt(oldSumSq(a)) * sqrt(oldSumSq(b))
    when(den === 0.0, lit(0.0)).otherwise(oldDot(a, b) / den)
  }

  behavior of "VectorExpressions"

  it should "match the old HOF folds bit-for-bit on random vectors" in {
    val spark = session
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { i =>
      val d = 1 + rnd.nextInt(96)
      (i.toLong,
        Array.fill(d)(rnd.nextDouble() * 20 - 10),
        Array.fill(d)(rnd.nextDouble() * 20 - 10))
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"), col("a").cast("array<double>").as("a"),
        col("b").cast("array<double>").as("b"))
    val cmp = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("nd"),
      oldDot(col("a"), col("b")).as("od"),
      VectorExpressions.sumSq(col("a")).as("ns"),
      oldSumSq(col("a")).as("os"),
      VectorExpressions.l2Dist(col("a"), col("b")).as("nl"),
      oldL2Dist(col("a"), col("b")).as("ol"),
      VectorExpressions.cosine(col("a"), col("b")).as("nc"),
      oldCosine(col("a"), col("b")).as("oc")).collect()
    cmp.foreach { r =>
      // exact bit equality, not tolerance — the accumulation order is the contract
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))
      java.lang.Double.doubleToRawLongBits(r.getDouble(2)) shouldBe
        java.lang.Double.doubleToRawLongBits(r.getDouble(3))
      java.lang.Double.doubleToRawLongBits(r.getDouble(4)) shouldBe
        java.lang.Double.doubleToRawLongBits(r.getDouble(5))
      java.lang.Double.doubleToRawLongBits(r.getDouble(6)) shouldBe
        java.lang.Double.doubleToRawLongBits(r.getDouble(7))
    }
  }

  it should "replicate null-element, length-mismatch and zero-norm semantics" in {
    val spark = session
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0D, 2.0D),        array(3.0D, 4.0D)),
        |  (array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)),
        |  (array(1.0D, 2.0D),        array(3.0D)),
        |  (array(0.0D, 0.0D),        array(3.0D)),
        |  (array(0.0D, 0.0D),        array(0.0D, 0.0D)),
        |  (CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)),
        |  (array(), CAST(array() AS ARRAY<DOUBLE>))
        |AS t(a, b)""".stripMargin)
    val cmp = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("nd"),
      oldDot(col("a"), col("b")).as("od"),
      VectorExpressions.cosine(col("a"), col("b")).as("nc"),
      oldCosine(col("a"), col("b")).as("oc"),
      VectorExpressions.sumSq(col("a")).as("ns"),
      oldSumSq(col("a")).as("os"),
      VectorExpressions.l2Dist(col("a"), col("b")).as("nl"),
      oldL2Dist(col("a"), col("b")).as("ol")).collect()
    cmp.foreach { r =>
      Seq((0, 1), (2, 3), (4, 5), (6, 7)).foreach { case (n, o) =>
        withClue(s"cols $n vs $o in $r: ") {
          if (r.isNullAt(o)) r.isNullAt(n) shouldBe true
          else {
            r.isNullAt(n) shouldBe false
            java.lang.Double.doubleToRawLongBits(r.getDouble(n)) shouldBe
              java.lang.Double.doubleToRawLongBits(r.getDouble(o))
          }
        }
      }
    }
    // the mismatched-length + zero-norm corner must be 0.0, not null
    // (when(den === 0, 0) fires before the null dot is consulted)
    val corner = df.where("size(a) = 2 AND size(b) = 1 AND a[0] = 0.0D")
      .select(VectorExpressions.cosine(col("a"), col("b"))).collect()
    corner.length shouldBe 1
    corner(0).getDouble(0) shouldBe 0.0
  }

  it should "stay inside WholeStageCodegen (no CodegenFallback in the scoring stage)" in {
    val spark = session
    // range-derived input so the projection cannot constant-fold away
    val df = spark.range(10)
      .select(col("id"), transform(sequence(lit(1), lit(8)),
        i => i.cast("double") * col("id")).as("e"))
    val plan = df.select(VectorExpressions.cosine(col("e"), col("e")).as("c"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen span
    assert(plan.linesIterator.exists(l =>
      l.contains("vec_cosine") && l.trim.startsWith("*")),
      s"vec_cosine not inside a WholeStageCodegen span:\n$plan")
  }
}
