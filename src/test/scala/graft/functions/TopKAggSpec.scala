package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // group 1: a clear top-3 with a score tie between ids 11 and 12
    (1L, 11L, 9.0), (1L, 12L, 9.0), (1L, 13L, 8.0), (1L, 14L, 7.0), (1L, 15L, 1.0),
    // group 2: fewer rows than k
    (2L, 21L, 5.0), (2L, 22L, 4.0),
    // group 3: all scores equal — pure tiebreak ordering
    (3L, 33L, 2.0), (3L, 31L, 2.0), (3L, 32L, 2.0), (3L, 34L, 2.0))

  private def df = rows.toDF("g", "id", "score")

  private def viaAgg(parts: Int) =
    df.repartition(parts)
      .groupBy($"g")
      .agg(TopKAgg.topK(3)($"score", $"id").as("top"))
      .select($"g", posexplode($"top").as(Seq("i", "e")))
      .select($"g", ($"i" + 1).as("rnk"), $"e.id".as("id"), $"e.score".as("score"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

  "TopKAgg" should "match the window top-k with deterministic tiebreaks" in {
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val expected = df.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
      .select($"g", $"rnk", $"id", $"score")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    viaAgg(4) shouldBe expected
    // ties resolved by id asc: group 1 keeps (11, 12, 13), group 3 (31, 32, 33)
    expected.collect { case (1L, rnk, id, _) => rnk -> id }.toMap shouldBe
      Map(1 -> 11L, 2 -> 12L, 3 -> 13L)
  }

  it should "be invariant under partitioning (combinable merge)" in {
    viaAgg(1) shouldBe viaAgg(7)
  }

  it should "cap every group at k and keep short groups whole" in {
    val byGroup = viaAgg(3).groupBy(_._1).view.mapValues(_.size).toMap
    byGroup shouldBe Map(1L -> 3, 2L -> 2, 3L -> 3)
  }

  it should "rank NaN first, matching the row_number window form" in {
    // Spark's sort treats NaN as greater than any double, so ORDER BY
    // score DESC ranks NaN rows first; the aggregator's total order must
    // agree — a partial (>, ==) order silently drops NaN once full
    val nanRows = Seq(
      (1L, 11L, 9.0), (1L, 12L, Double.NaN), (1L, 13L, 8.0), (1L, 14L, Double.NaN),
      (1L, 15L, 7.0),
      (2L, 21L, Double.NaN), (2L, 22L, 1.0))
    val ndf = nanRows.toDF("g", "id", "score")
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val expected = ndf.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
      .select($"g", $"rnk", $"id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = ndf.repartition(5)
      .groupBy($"g").agg(TopKAgg.topK(3)($"score", $"id").as("top"))
      .select($"g", posexplode($"top").as(Seq("i", "e")))
      .select($"g", ($"i" + 1).as("rnk"), $"e.id".as("id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    got shouldBe expected
    // NaN ids 12 and 14 outrank every finite score in group 1
    expected.collect { case (1L, rnk, id) => rnk -> id }.toMap shouldBe
      Map(1 -> 12L, 2 -> 14L, 3 -> 11L)
  }

  it should "treat -0.0 and 0.0 as equal (id tiebreak, Spark comparison semantics)" in {
    val agg = new TopKAgg(2)
    agg.merge(Seq(Scored(0.0, 5L)), Seq(Scored(-0.0, 3L))) shouldBe
      Seq(Scored(-0.0, 3L), Scored(0.0, 5L))
  }

  it should "bound the buffer during reduce and merge" in {
    val agg = new TopKAgg(2)
    val full = Seq(Scored(9.0, 1L), Scored(8.0, 2L))
    agg.reduce(full, Scored(1.0, 9L)) shouldBe full // no-place fast path
    agg.reduce(full, Scored(10.0, 9L)) shouldBe Seq(Scored(10.0, 9L), Scored(9.0, 1L))
    agg.merge(full, Seq(Scored(8.5, 3L), Scored(0.5, 4L))) shouldBe
      Seq(Scored(9.0, 1L), Scored(8.5, 3L))
  }
}
