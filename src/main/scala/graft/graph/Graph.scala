package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over plain edge-list DataFrames
  * (`src`, `dst` long columns, undirected, src < dst, no duplicates —
  * the shape every pair generator in graft.dedup emits).
  *
  * Cluster/connected-component resolution lives in
  * [[graft.dedup.Dedup.clusters]] (pointer-doubling min-label
  * propagation); this module adds the counting-style primitives a
  * similarity-graph analysis needs on top of the pair streams.
  */
object Graph {

  /** Per-node degree of the undirected edge list: one combinable shuffle
    * over the exploded endpoints.
    */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(explode(array(col("src"), col("dst"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("degree"))

  /** Triangle enumeration by degree orientation — the shape that survives
    * skewed similarity graphs (Suri & Vassilvitskii, WWW 2011 "Counting
    * triangles and the curse of the last reducer").
    *
    * A naive wedge join enumerates d(v)² wedges at every node, and a hub
    * node (a boilerplate cluster, a stop-phrase bucket) with d = 10⁶
    * owns 10¹² wedges in one task — the exact hot-key failure the 10M
    * soaks kept finding. Orienting every edge from its (degree, id)-lower
    * endpoint to its higher one makes each triangle countable exactly
    * once AND bounds out-degree by O(√m), so total wedge volume is
    * O(m^{3/2}) no matter how skewed the degree distribution is: the hub
    * keeps its million edges but almost all point INTO it and contribute
    * no wedges.
    *
    * Three shuffles (degree agg, wedge self-join on the low endpoint,
    * closing-edge equi-join); output is each triangle once as
    * (x, y, z), x < y < z by node id.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val deg = degrees(edges)
    // orient each edge from (degree, id)-low to high; carry the head's
    // rank so the wedge join can order its two heads without re-joining
    val oriented = edges
      .join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "sdeg"), "src")
      .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "ddeg"), "dst")
      .select(
        when(col("sdeg") < col("ddeg") ||
          (col("sdeg") === col("ddeg") && col("src") < col("dst")), col("src"))
          .otherwise(col("dst")).as("lo"),
        when(col("sdeg") < col("ddeg") ||
          (col("sdeg") === col("ddeg") && col("src") < col("dst")), col("dst"))
          .otherwise(col("src")).as("hi"),
        greatest(col("sdeg"), col("ddeg")).as("hideg"))
    val o1 = oriented.select(col("lo"), col("hi").as("b"), col("hideg").as("bdeg"))
    val o2 = oriented.select(col("lo"), col("hi").as("c"), col("hideg").as("cdeg"))
    val closing = oriented.select(col("lo").as("b"), col("hi").as("c"))
    o1.join(o2, Seq("lo"))
      // each unordered head pair once, in orientation order (deg, id)
      .filter(col("bdeg") < col("cdeg") ||
        (col("bdeg") === col("cdeg") && col("b") < col("c")))
      .join(closing, Seq("b", "c"), "left_semi")
      .select(
        least(col("lo"), col("b"), col("c")).as("x"),
        (col("lo") + col("b") + col("c") - least(col("lo"), col("b"), col("c"))
          - greatest(col("lo"), col("b"), col("c"))).as("y"),
        greatest(col("lo"), col("b"), col("c")).as("z"))
  }

  /** Fixed-iteration PageRank over the undirected edge list, in exact
    * fixed-point arithmetic: ranks are longs scaled by `scale`, each
    * node splits its rank over its neighbors by integer division, and
    * the damping step is `(15·scale + 85·Σcontrib) div 100` — every
    * operation is integral, so the result is bit-identical under any
    * partitioning, AQE re-plan, or engine (float PageRank is
    * summation-order-dependent and cannot be hash-compared across
    * engines; the div-truncation "leak" is the price of determinism and
    * is bounded by deg/scale per node per iteration).
    *
    * Each iteration is one equi-join of the (cached-lineage-friendly)
    * adjacency against the current rank vector plus one combinable sum —
    * the rank vector is node-sized, never edge-sized, and hot hubs
    * concentrate into a map-side-combinable aggregation exactly like any
    * skewed groupBy. For iteration counts beyond the default few, cut
    * lineage with localCheckpoint every ~10 rounds (the
    * [[graft.dedup.Dedup.clusters]] discipline).
    */
  def pageRank(edges: DataFrame, iterations: Int = 3, scale: Long = 1000000L): DataFrame = {
    val directed = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
    val deg = directed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val adjacency = directed.join(deg, "src")
    var ranks = deg.select(col("src").as("node"), lit(scale).as("rank"))
    for (_ <- 1 to iterations) {
      ranks = adjacency
        .join(ranks, adjacency("src") === ranks("node"))
        .select(col("dst"), expr("rank div deg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("node"),
          expr(s"(15 * $scale + 85 * s) div 100").as("rank"))
    }
    ranks
  }
}
