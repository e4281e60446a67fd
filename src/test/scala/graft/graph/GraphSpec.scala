package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def edgesDf(es: (Long, Long)*) =
    es.toDF("src", "dst")

  behavior of "Graph.triangles"

  it should "enumerate each triangle of a clique exactly once" in {
    // K4 on {1,2,3,4} → C(4,3) = 4 triangles
    val k4 = edgesDf((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = Graph.triangles(k4).as[(Long, Long, Long)].collect().toSet
    got shouldBe Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L))
  }

  it should "find no triangles in a star, even at a high-degree hub" in {
    // hub 0 with 50 leaves: d(hub)=50 but orientation points leaves→hub,
    // so no wedge forms at the hub — the skew-survival property
    val star = edgesDf((1L to 50L).map(i => (0L, i)): _*)
    Graph.triangles(star).count() shouldBe 0L
  }

  it should "match the naive three-way join on a pseudo-random graph" in {
    // deterministic irregular graph on 60 nodes: ring + distance-2
    // chords (guaranteed triangles) + scattered long-range edges
    val edges = spark.range(0, 60)
      .selectExpr("id as src",
        "explode(array((id + 1) % 60, (id + 2) % 60, (id * id + 7 * id + 3) % 60)) as dst")
      .selectExpr("least(src, dst) as src", "greatest(src, dst) as dst")
      .filter($"src" < $"dst").distinct()
    val naive = {
      val e = edges
      e.as("e1")
        .join(e.as("e2"), col("e1.dst") === col("e2.src"))
        .join(e.as("e3"),
          col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"), "left_semi")
        .select(col("e1.src").as("x"), col("e1.dst").as("y"), col("e2.dst").as("z"))
        .as[(Long, Long, Long)].collect().toSet
    }
    val got = Graph.triangles(edges).as[(Long, Long, Long)].collect().toSet
    got shouldBe naive
    got.size should be > 0
  }

  behavior of "Graph.pageRank"

  it should "match a driver-side fixed-point reference on a small graph" in {
    val es = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 4L))
    val scale = 1000000L
    // independent reference: same integer fixed-point recurrence
    val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    var r = adj.keys.map(_ -> scale).toMap
    for (_ <- 1 to 3) {
      val contrib = adj.toSeq.flatMap { case (u, ns) => ns.map(v => v -> r(u) / deg(u)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = r.keys.map(n => n -> (15L * scale + 85L * contrib.getOrElse(n, 0L)) / 100L).toMap
    }
    val got = Graph.pageRank(edgesDf(es: _*), iterations = 3, scale = scale)
      .as[(Long, Long)].collect().toMap
    got shouldBe r
  }

  it should "be invariant to partitioning (exact integer arithmetic)" in {
    val edges = spark.range(0, 300)
      .selectExpr("id % 40 as src", "(id * 13 + 5) % 40 as dst")
      .filter($"src" < $"dst").distinct()
    val a = Graph.pageRank(edges.repartition(1), 3).as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(edges.repartition(7), 3).as[(Long, Long)].collect().toMap
    a shouldBe b
  }
}
