package graft.queries

import org.apache.spark.sql.functions._
import graft.graph.Graph
import graft.queries.Q.t

/** Graph primitives over edge lists derived from the testdata tables —
  * triangle enumeration on the exact-duplicate graph and fixed-point
  * PageRank on the customer–nation affiliation graph. Cluster resolution
  * (connected components) is oracle-checked separately as d7/d12.
  */
object GraphQueries {

  /** documents ∪ two exact copies of every 20th doc (ids +1e6, +2e6):
    * each planted group is a 3-clique in the exact-duplicate graph, so
    * triangle output is non-trivial and predictable at every scale
    * factor.
    */
  private val tripledSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 20 = 0
      |UNION ALL SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 20 = 0""".stripMargin

  /** Triangle enumeration (Graph.triangles — degree-oriented wedge join,
    * the Suri–Vassilvitskii shape whose wedge volume is O(m^{3/2})
    * regardless of degree skew) over the exact-duplicate graph of the
    * tripled corpus. The oracle builds the same edge list relationally
    * and closes wedges with the naive 3-way join that is safe at oracle
    * scale; the Spark side must produce the identical triangle set via
    * the orientation — which is the claim: orientation changes the
    * worst-case bound, never the answer.
    */
  val triangleCount: Q = Q(
    "g1_triangles",
    s"""WITH c AS ($tripledSql),
       |e AS (
       |  SELECT a.doc_id AS src, b.doc_id AS dst
       |  FROM c a JOIN c b ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id)
       |SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
       |FROM e e1 JOIN e e2 ON e1.dst = e2.src
       |JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val tripled = d
      .unionByName(d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionByName(d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    // exact-dup edges: join ids on content hash, never text payloads
    val hashed = tripled.select(col("doc_id"), md5(col("text")).as("h"))
    val edges = hashed.as("a")
      .join(hashed.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
    Graph.triangles(edges)
  }

  /** Fixed-point PageRank (Graph.pageRank, 3 iterations, scale 10⁶) on
    * the undirected customer–nation graph: nation hubs (customers-per-
    * nation in-degree, growing with sf) accumulate rank from their
    * members, customers keep near-minimum rank. The oracle unrolls the
    * same three integer-arithmetic iterations as CTE layers — bit-exact
    * agreement is only possible because every step is integral (see
    * Graph.pageRank's scaladoc); node ids place nations at
    * 10⁹ + nationkey to keep the id spaces disjoint.
    */
  val pageRankQ: Q = {
    val scale = 1000000L
    val iterSql = (r: String, out: String) =>
      s"""$out AS (
         |  SELECT d.dst AS node,
         |    (15 * $scale + 85 * sum(r.rank // a.deg)) // 100 AS rank
         |  FROM d JOIN deg a ON d.src = a.node JOIN $r r ON d.src = r.node
         |  GROUP BY d.dst)""".stripMargin
    Q(
      "g2_pagerank",
      s"""WITH e AS (
         |  SELECT c_custkey AS src, 1000000000 + c_nationkey AS dst FROM customer),
         |d AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
         |deg AS (SELECT src AS node, count(*) AS deg FROM d GROUP BY src),
         |r0 AS (SELECT node, $scale AS rank FROM deg),
         |${iterSql("r0", "r1")},
         |${iterSql("r1", "r2")},
         |${iterSql("r2", "r3")}
         |SELECT node, CAST(rank AS BIGINT) AS rank FROM r3""".stripMargin) { (s, dir) =>
      val edges = t(s, dir, "customer")
        .select(col("c_custkey").as("src"),
          (lit(1000000000L) + col("c_nationkey")).as("dst"))
      Graph.pageRank(edges, iterations = 3, scale = scale)
    }
  }

  /** Clique-plus-chain fixture shared by g3/g4: the exact-dup 3-cliques
    * of the tripled corpus (dense, survive any k=2 peel, coefficient 1)
    * plus an 8-edge path over ids 1..9 of every 20-block (trees peel
    * two ends per round, coefficient 0) — so peeling depth and
    * transitivity both have non-trivial, predictable structure.
    */
  private val edgesSql =
    s"""cx AS ($tripledSql),
       |cl AS (SELECT a.doc_id AS src, b.doc_id AS dst
       |       FROM cx a JOIN cx b ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
       |ch AS (SELECT doc_id AS src, doc_id + 1 AS dst FROM documents
       |       WHERE doc_id % 20 BETWEEN 1 AND 8),
       |e0 AS (SELECT src, dst FROM cl UNION ALL SELECT src, dst FROM ch)""".stripMargin

  private def dupChainEdges(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val tripled = d
      .unionByName(d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionByName(d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    val hashed = tripled.select(col("doc_id"), md5(col("text")).as("h"))
    val cliques = hashed.as("a")
      .join(hashed.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
    val chains = t(s, dir, "documents")
      .filter(col("doc_id") % 20 >= 1 && col("doc_id") % 20 <= 8)
      .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
    cliques.unionByName(chains)
  }

  /** Synchronous k-core peeling, exactly 3 rounds at k = 2
    * (Graph.kCorePeel): the 3-cliques are their own 2-core and never
    * peel; each 9-node path loses its two endpoints per round, so after
    * 3 rounds exactly the middle 3 nodes / 2 edges remain — the oracle
    * unrolls the same three degree-filter-project rounds as CTE layers,
    * pinning the ROUND semantics (a fixpoint implementation would
    * return a different, fully-peeled state).
    */
  val kCorePeelQ: Q = {
    val roundSql = (i: Int) =>
      s"""d$i AS (SELECT node, count(*) AS deg FROM (
         |  SELECT src AS node FROM e$i UNION ALL SELECT dst AS node FROM e$i) GROUP BY node),
         |k$i AS (SELECT node FROM d$i WHERE deg >= 2),
         |e${i + 1} AS (SELECT src, dst FROM e$i
         |  WHERE src IN (SELECT node FROM k$i) AND dst IN (SELECT node FROM k$i))""".stripMargin
    Q(
      "g3_kcore_peel",
      s"""WITH $edgesSql,
         |${roundSql(0)},
         |${roundSql(1)},
         |${roundSql(2)}
         |SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
         |  SELECT src AS node FROM e3 UNION ALL SELECT dst AS node FROM e3)
         |GROUP BY node""".stripMargin) { (s, dir) =>
      Graph.degrees(Graph.kCorePeel(dupChainEdges(s, dir), k = 2, rounds = 3))
    }
  }

  /** Per-node local clustering coefficient
    * (Graph.clusteringCoefficient): clique nodes are perfectly
    * transitive (coeff 1), path nodes are 0 at any degree — the oracle
    * recomputes triangles with the naive 3-way join and the same exact
    * rational. Distinguishing template communities (high coeff) from
    * hub artifacts (high degree, low coeff) is the similarity-graph
    * triage this feeds.
    */
  val clusteringCoeffQ: Q = Q(
    "g4_clustering_coeff",
    s"""WITH $edgesSql,
       |tri AS (SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
       |        FROM e0 e1 JOIN e0 e2 ON e1.dst = e2.src
       |        JOIN e0 e3 ON e3.src = e1.src AND e3.dst = e2.dst),
       |tv AS (SELECT node, count(*) AS triangles FROM (
       |        SELECT x AS node FROM tri
       |        UNION ALL SELECT y AS node FROM tri
       |        UNION ALL SELECT z AS node FROM tri) GROUP BY node),
       |dg AS (SELECT node, count(*) AS deg FROM (
       |        SELECT src AS node FROM e0 UNION ALL SELECT dst AS node FROM e0)
       |       GROUP BY node)
       |SELECT dg.node, CAST(dg.deg AS BIGINT) AS degree,
       |  CAST(coalesce(tv.triangles, 0) AS BIGINT) AS triangles,
       |  round(CASE WHEN dg.deg < 2 THEN 0.0
       |        ELSE 2.0 * coalesce(tv.triangles, 0) / (dg.deg * (dg.deg - 1))
       |        END, 6) AS coeff
       |FROM dg LEFT JOIN tv USING (node)""".stripMargin) { (s, dir) =>
    Graph.clusteringCoefficient(dupChainEdges(s, dir))
      .select(col("node"), col("degree"), col("triangles"),
        round(col("coeff"), 6).as("coeff"))
  }

  /** Fixed-round BFS (Graph.bfsDistances, 3 rounds) over the g3
    * clique-plus-chain fixture, seeded with every 20-block's clique
    * original AND its chain head: clique copies resolve to distance 1,
    * chain nodes to their path distance capped by the round budget
    * (node 4 of each chain reaches exactly 3; 5..9 stay unreached and
    * absent), and the min-over-paths semantics is pinned by nodes
    * adjacent to two seeds. The oracle unrolls the same three
    * frontier-join-min rounds as CTE layers.
    */
  val bfsQ: Q = {
    val roundSql = (i: Int) =>
      s"""r${i + 1} AS (SELECT node, min(dist) AS dist FROM (
         |  SELECT node, dist FROM r$i
         |  UNION ALL
         |  SELECT u.dst AS node, d.dist + 1 AS dist
         |  FROM und u JOIN r$i d ON u.src = d.node) GROUP BY node)""".stripMargin
    Q(
      "g5_bfs_distances",
      s"""WITH $edgesSql,
         |und AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |r0 AS (SELECT DISTINCT doc_id AS node, CAST(0 AS BIGINT) AS dist
         |       FROM documents WHERE doc_id % 20 IN (0, 1)),
         |${roundSql(0)},
         |${roundSql(1)},
         |${roundSql(2)}
         |SELECT node, dist FROM r3""".stripMargin) { (s, dir) =>
      val seeds = t(s, dir, "documents")
        .filter(col("doc_id") % 20 <= 1)
        .select(col("doc_id").as("node"))
      Graph.bfsDistances(dupChainEdges(s, dir), seeds, rounds = 3)
    }
  }

  /** Synchronous label propagation (Graph.labelPropagation, 3 rounds)
    * over the g3 clique-plus-chain fixture: each 3-clique collapses to
    * its minimum member id in one round and stays there (a clique's own
    * majority outvotes anything), while the 9-node paths — bipartite, so
    * the round budget matters — walk labels leftward one hop per round.
    * The oracle unrolls the same three vote-count/argmax rounds as CTE
    * layers with the identical (count DESC, label ASC) tiebreak.
    */
  val labelPropQ: Q = {
    val roundSql = (i: Int) =>
      s"""l${i + 1} AS (
         |  SELECT node, label FROM (
         |    SELECT node, label,
         |      row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label) AS rn
         |    FROM (SELECT u.dst AS node, p.label, count(*) AS cnt
         |          FROM und u JOIN l$i p ON u.src = p.node
         |          GROUP BY u.dst, p.label))
         |  WHERE rn = 1)""".stripMargin
    Q(
      "g6_label_propagation",
      s"""WITH $edgesSql,
         |und AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |l0 AS (SELECT DISTINCT src AS node, src AS label FROM und),
         |${roundSql(0)},
         |${roundSql(1)},
         |${roundSql(2)}
         |SELECT node, label FROM l3""".stripMargin) { (s, dir) =>
      Graph.labelPropagation(dupChainEdges(s, dir), rounds = 3)
    }
  }

  /** PageRank over the EXTRACTED document link graph — the full
    * crawl-analysis composition: fixture HTML (TextQueries'
    * x50 link fixture) → HtmlExtract.links (codegen'd href harvest) →
    * target-id parse → distinct doc-level edges → 3 integer PageRank
    * iterations. The oracle never sees HTML: it predicts the same edge
    * set from the fixture arithmetic and unrolls the same three
    * integer iterations (the g2 construction) — so the whole chain,
    * extraction included, must agree bit-for-bit.
    */
  val linkRankQ: Q = {
    val scale = 1000000L
    val iter = (r: String, out: String) =>
      s"""$out AS (
         |  SELECT d.dst AS node,
         |    (15 * $scale + 85 * sum(rr.rank // a.deg)) // 100 AS rank
         |  FROM d JOIN deg a ON d.src = a.node JOIN $r rr ON d.src = rr.node
         |  GROUP BY d.dst)""".stripMargin
    Q(
      "g7_pagerank_links",
      s"""WITH n AS (SELECT count(*) AS nn FROM documents),
         |l AS (
         |  SELECT doc_id AS src,
         |    (doc_id*13 + link_no*7 + 1) % (SELECT nn FROM n) AS dst
         |  FROM (SELECT doc_id, unnest(range(0, CAST(doc_id % 4 AS INT))) AS link_no
         |        FROM documents)),
         |e AS (SELECT DISTINCT src, dst FROM l),
         |d AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
         |deg AS (SELECT src AS node, count(*) AS deg FROM d GROUP BY src),
         |r0 AS (SELECT node, $scale AS rank FROM deg),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")},
         |${iter("r2", "r3")}
         |SELECT node, CAST(rank AS BIGINT) AS rank FROM r3""".stripMargin) { (s, dir) =>
      import graft.text.HtmlExtract
      val edges = TextQueries.linkFixtureHtml(t(s, dir, "documents"))
        .select(col("doc_id").as("src"),
          explode(HtmlExtract.links(col("html"))).as("href"))
        .select(col("src"),
          regexp_extract(col("href"), "^https://d(\\d+)\\.example", 1)
            .cast("long").as("dst"))
        .distinct()
      Graph.pageRank(edges, iterations = 3, scale = scale)
    }
  }

  val all: Seq[Q] = Seq(
    triangleCount, pageRankQ, kCorePeelQ, clusteringCoeffQ, bfsQ, labelPropQ,
    linkRankQ)
}
