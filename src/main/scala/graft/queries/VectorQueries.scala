package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ann.{Ann, Pq}
import graft.functions.VectorOps
import graft.queries.Q.{decSum, t}

/** Similarity search over the `embeddings` table (vec_id, embedding
  * float[64], label) — the ANN surface of a training-data pipeline, plus
  * the reference's vector-table export ops (norms/categories, reference
  * Vectors.scala:28–34). The Spark side delegates to graft.ann.Ann; all
  * kernels are codegen'd folds whose left-to-right double arithmetic
  * matches DuckDB's list_* functions bit-for-bit (rounding is a guard,
  * not load-bearing).
  */
object VectorQueries {

  private def emb(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")

  /** Brute-force cosine top-k — the exact baseline every ANN variant is
    * measured against (Ann.bruteForceKnn: broadcast query side, no-shuffle
    * candidate scan, per-query top-k window).
    */
  val knnBrute: Q = Q(
    "v1_knn_brute",
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings)
      |SELECT query_id, neighbor_id, round(sim, 6) AS sim, CAST(rn AS INT) AS rank FROM (
      |  SELECT query_id, neighbor_id, list_cosine_similarity(qe, ne) AS sim,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY list_cosine_similarity(qe, ne) DESC, neighbor_id) AS rn
      |  FROM q CROSS JOIN c WHERE query_id <> neighbor_id)
      |WHERE rn <= 3""".stripMargin) { (s, dir) =>
    val e = emb(s, dir)
    Ann.bruteForceKnn(e, e.filter(col("vec_id") < 5), k = 3)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Multi-table random-hyperplane LSH ANN pairs (Ann.lshPairs) — the
    * candidate-generation scale path: two independent tables of 16-bit
    * sparse-hyperplane sign codes (bucket space 2 × 2^16, growing with the
    * bits parameter), pairs only inside a (table, bucket) cell. The oracle
    * spells out the identical hyperplane fold chains, generated from the
    * same Ann.hyperplaneTerms.
    */
  val lshAnnPairs: Q = {
    val dim = 64; val bits = 16; val tables = 2
    def codeSql(tbl: Int): String = Ann.hyperplaneCodeSql(tbl, bits, dim)
    Q(
      "v2_lsh_ann_pairs",
      s"""WITH raw AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |coded AS (
         |  SELECT vec_id, e,
         |    unnest([${(0 until tables).mkString(", ")}]) AS table_no,
         |    unnest([${(0 until tables).map(tbl => s"(${codeSql(tbl)})").mkString(", ")}]) AS bucket
         |  FROM raw)
         |SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2,
         |  round(list_cosine_similarity(a.e, b.e), 6) AS sim
         |FROM coded a JOIN coded b
         |  ON a.table_no = b.table_no AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE list_cosine_similarity(a.e, b.e) >= 0.2""".stripMargin) { (s, dir) =>
      Ann.lshPairs(emb(s, dir), dim = dim, bits = bits, tables = tables, minSim = 0.2)
        .select(col("id1"), col("id2"), round(col("sim"), 6).as("sim"))
        .distinct()
    }
  }

  /** Deterministic k-means cells (Ann.kmeansCells, k=8, one Lloyd
    * iteration): the self-contained IVF coarse quantizer. The oracle
    * replays seeds → cosine-argmax assignment → exact-decimal centroid
    * update → final assignment with identical arithmetic.
    */
  val kmeansCells: Q = {
    val k = 8
    def argmaxSql(centsRel: String): String =
      s"""SELECT vec_id, e, cell FROM (
         |    SELECT r.vec_id, r.e, c.cell,
         |      row_number() OVER (PARTITION BY r.vec_id
         |        ORDER BY list_cosine_similarity(r.e, c.ce) DESC, c.cell) AS rn
         |    FROM raw r CROSS JOIN $centsRel c) WHERE rn = 1""".stripMargin
    Q(
      "v6_kmeans_cells",
      s"""WITH raw AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |seeds AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, e AS ce
         |  FROM (SELECT vec_id, e FROM raw ORDER BY vec_id LIMIT $k)),
         |assign1 AS (${argmaxSql("seeds")}),
         |comps AS (
         |  SELECT cell, dim, CAST(sum(CAST(v AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS centroid
         |  FROM (SELECT cell, generate_subscripts(e, 1) AS dim, unnest(e) AS v FROM assign1)
         |  GROUP BY cell, dim),
         |cents AS (SELECT cell, list(centroid ORDER BY dim) AS ce FROM comps GROUP BY cell)
         |SELECT vec_id, cell FROM (${argmaxSql("cents")})""".stripMargin) { (s, dir) =>
      // dim = 64 (embeddings fixture width): single-exchange wide
      // centroid fold per Lloyd round (r11)
      Ann.kmeansCells(emb(s, dir), k = k, iters = 1, dim = 64)
    }
  }

  /** Per-label centroids (Ann.centroidComponents — the IVF
    * coarse-quantizer training shape): exact decimal means over
    * posexploded components.
    */
  val labelCentroids: Q = Q(
    "v3_label_centroids",
    """SELECT label, dim,
      |  round(CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,10))) AS DOUBLE) / count(*), 6) AS centroid
      |FROM (SELECT label, generate_subscripts(embedding, 1) AS dim, unnest(embedding) AS v
      |      FROM embeddings)
      |GROUP BY label, dim""".stripMargin) { (s, dir) =>
    Ann.centroidComponents(emb(s, dir), "label")
      .select(col("cell").as("label"), col("dim"), round(col("centroid"), 6).as("centroid"))
  }

  /** Vector norms + prefix categories — the reference's vectors-table
    * export (Vectors.scala:28–34), norms via codegen'd fold instead of the
    * reference's UDF.
    */
  val vectorNorms: Q = Q(
    "v4_vector_norms",
    """SELECT vec_id, round(sqrt(list_dot_product(e, e)), 6) AS norm,
      |  CASE WHEN label < 3 THEN 'low' ELSE 'high' END AS category
      |FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)""".stripMargin) { (s, dir) =>
    emb(s, dir).select(
      col("vec_id"),
      round(VectorOps.l2Norm(VectorOps.toDoubleArray(col("embedding"))), 6).as("norm"),
      when(col("label") < 3, "low").otherwise("high").as("category"))
  }

  /** IVF search (Ann.ivfSearch): route each query to its nearest label
    * centroid, exact top-k inside that cell only — with C cells the fine
    * search scans ~1/C of the corpus per query, and the routing table is
    * broadcast-sized by construction.
    */
  val ivfSearch: Q = Q(
    "v5_ivf_search",
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
      |comp AS (
      |  SELECT label AS cell, dim,
      |    CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS c
      |  FROM (SELECT label, generate_subscripts(embedding, 1) AS dim, unnest(embedding) AS v
      |        FROM embeddings)
      |  GROUP BY cell, dim),
      |cents AS (SELECT cell, list(c ORDER BY dim) AS ce FROM comp GROUP BY cell),
      |q AS (SELECT vec_id AS query_id, ev AS qe FROM e WHERE vec_id < 5),
      |assigned AS (
      |  SELECT query_id, qe, cell FROM (
      |    SELECT q.query_id, q.qe, cents.cell,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY list_cosine_similarity(q.qe, cents.ce) DESC, cents.cell) AS rn
      |    FROM q CROSS JOIN cents) WHERE rn = 1)
      |SELECT query_id, cell, neighbor_id, round(sim, 6) AS sim, CAST(rn AS INT) AS rank FROM (
      |  SELECT a.query_id, a.cell, e.vec_id AS neighbor_id,
      |    list_cosine_similarity(a.qe, e.ev) AS sim,
      |    row_number() OVER (PARTITION BY a.query_id
      |      ORDER BY list_cosine_similarity(a.qe, e.ev) DESC, e.vec_id) AS rn
      |  FROM assigned a JOIN e ON e.label = a.cell AND e.vec_id <> a.query_id)
      |WHERE rn <= 3""".stripMargin) { (s, dir) =>
    val e = emb(s, dir)
    Ann.ivfSearch(e, "label", e.filter(col("vec_id") < 5), k = 3)
      .select(col("query_id"), col("cell"), col("neighbor_id"),
        round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** IVF at nprobe=2 (Ann.ivfSearch): each query probes its two nearest
    * cells, recovering neighbors that sit just across its home cell's
    * boundary — the standard recall/candidate-budget dial. Each vector
    * lives in exactly one cell, so the probed unions are disjoint and the
    * top-k window needs no dedup.
    */
  val ivfNprobe: Q = Q(
    "v7_ivf_nprobe2",
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
      |comp AS (
      |  SELECT label AS cell, dim,
      |    CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS c
      |  FROM (SELECT label, generate_subscripts(embedding, 1) AS dim, unnest(embedding) AS v
      |        FROM embeddings)
      |  GROUP BY cell, dim),
      |cents AS (SELECT cell, list(c ORDER BY dim) AS ce FROM comp GROUP BY cell),
      |q AS (SELECT vec_id AS query_id, ev AS qe FROM e WHERE vec_id < 5),
      |assigned AS (
      |  SELECT query_id, qe, cell FROM (
      |    SELECT q.query_id, q.qe, cents.cell,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY list_cosine_similarity(q.qe, cents.ce) DESC, cents.cell) AS rn
      |    FROM q CROSS JOIN cents) WHERE rn <= 2)
      |SELECT query_id, cell, neighbor_id, round(sim, 6) AS sim, CAST(rn AS INT) AS rank FROM (
      |  SELECT a.query_id, a.cell, e.vec_id AS neighbor_id,
      |    list_cosine_similarity(a.qe, e.ev) AS sim,
      |    row_number() OVER (PARTITION BY a.query_id
      |      ORDER BY list_cosine_similarity(a.qe, e.ev) DESC, e.vec_id) AS rn
      |  FROM assigned a JOIN e ON e.label = a.cell AND e.vec_id <> a.query_id)
      |WHERE rn <= 3""".stripMargin) { (s, dir) =>
    val e = emb(s, dir)
    Ann.ivfSearch(e, "label", e.filter(col("vec_id") < 5), k = 3, nprobe = 2)
      .select(col("query_id"), col("cell"), col("neighbor_id"),
        round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** int8 scalar quantization (Ann.quantizeInt8), exploded to
    * (vec_id, dim, code) + per-vector scale so the compare is
    * scalar-typed. Both engines round half away from zero on doubles, so
    * codes are hash-exact; scale is rounded as a guard only.
    */
  val int8Quantize: Q = Q(
    "v8_int8_quantize",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
      |m AS (SELECT vec_id, ev,
      |        list_max(list_transform(ev, x -> abs(x))) AS maxabs FROM e)
      |SELECT vec_id, CAST(dim - 1 AS INT) AS dim,
      |  CAST(CASE WHEN maxabs > 0 THEN round(ev[dim] * 127.0 / maxabs) ELSE 0 END AS INT) AS code,
      |  round(CASE WHEN maxabs > 0 THEN maxabs / 127.0 ELSE 0.0 END, 6) AS scale
      |FROM (SELECT vec_id, ev, maxabs, generate_subscripts(ev, 1) AS dim
      |      FROM m)""".stripMargin) { (s, dir) =>
    Ann.quantizeInt8(emb(s, dir))
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        posexplode(col("codes")).as(Seq("dim", "code")))
      .select(col("vec_id"), col("dim"), col("code"), col("scale"))
  }

  /** Two-stage compressed retrieval (Ann.int8RerankKnn): coarse top-32
    * over int8-RECONSTRUCTED vectors, exact rerank of the survivors.
    * The oracle replays the identical quantize → reconstruct → coarse
    * rank → exact rerank chain: reconstruction is
    * `round(x·127/maxabs) · (maxabs/127)` — the same single
    * product/division arithmetic v8 hash-verifies — so the candidate
    * sets agree bit-for-bit before the (v1-precedent) cosine compare.
    */
  val int8Rerank: Q = Q(
    "v9_int8_rerank",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
      |m AS (SELECT vec_id, ev,
      |        list_max(list_transform(ev, x -> abs(x))) AS maxabs FROM e),
      |recon AS (
      |  SELECT vec_id,
      |    CASE WHEN maxabs > 0
      |      THEN list_transform(ev, x -> round(x * 127.0 / maxabs) * (maxabs / 127.0))
      |      ELSE list_transform(ev, x -> 0.0) END AS re
      |  FROM m),
      |q AS (SELECT vec_id AS query_id, ev AS qe FROM e WHERE vec_id < 5),
      |coarse AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT q.query_id, r.vec_id AS neighbor_id,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY list_cosine_similarity(q.qe, r.re) DESC, r.vec_id) AS rn
      |    FROM q CROSS JOIN recon r WHERE q.query_id <> r.vec_id)
      |  WHERE rn <= 32)
      |SELECT query_id, neighbor_id, round(sim, 6) AS sim, CAST(rn AS INT) AS rank FROM (
      |  SELECT c.query_id, c.neighbor_id, list_cosine_similarity(q.qe, e.ev) AS sim,
      |    row_number() OVER (PARTITION BY c.query_id
      |      ORDER BY list_cosine_similarity(q.qe, e.ev) DESC, c.neighbor_id) AS rn
      |  FROM coarse c JOIN e ON c.neighbor_id = e.vec_id JOIN q USING (query_id))
      |WHERE rn <= 3""".stripMargin) { (s, dir) =>
    val e = emb(s, dir)
    Ann.int8RerankKnn(e, e.filter(col("vec_id") < 5), k = 3, coarseK = 32)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 6).as("sim"),
        col("rank"))
  }

  /** SemDeDup (Dedup.semanticDedup over a corpus with planted exact
    * duplicate embeddings — every 10th vector re-inserted under
    * id+1000000, so the semantic-dup set is PREDICTABLE at every scale
    * factor): deterministic k-means cells, in-cell cosine, drop every
    * vector with a smaller-id neighbor at cos ≥ 0.95. The oracle replays
    * the full v6 k-means chain over the augmented corpus, then the same
    * in-cell pair filter and anti-join.
    *
    * k = 64, not v6's demo 8: SemDeDup's cost model is Σ n_c² in-cell
    * pairs, so k must grow with the corpus — at sf0.1's ~55k augmented
    * vectors, k=8 meant ~380M cosine pairs where k=64 pays ~48M for the
    * same planted-duplicate recall (the assignment crossJoin grows only
    * linearly in k and stays broadcast).
    */
  val semanticDedup: Q = {
    val k = 64
    def argmaxSql(centsRel: String): String =
      s"""SELECT vec_id, e, cell FROM (
         |    SELECT r.vec_id, r.e, c.cell,
         |      row_number() OVER (PARTITION BY r.vec_id
         |        ORDER BY list_cosine_similarity(r.e, c.ce) DESC, c.cell) AS rn
         |    FROM raw r CROSS JOIN $centsRel c) WHERE rn = 1""".stripMargin
    Q(
      "d11_semantic_dedup",
      s"""WITH raw AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM (
         |    SELECT vec_id, embedding FROM embeddings
         |    UNION ALL
         |    SELECT vec_id + 1000000 AS vec_id, embedding
         |    FROM embeddings WHERE vec_id % 10 = 0)),
         |seeds AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, e AS ce
         |  FROM (SELECT vec_id, e FROM raw ORDER BY vec_id LIMIT $k)),
         |assign1 AS (${argmaxSql("seeds")}),
         |comps AS (
         |  SELECT cell, dim, CAST(sum(CAST(v AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS centroid
         |  FROM (SELECT cell, generate_subscripts(e, 1) AS dim, unnest(e) AS v FROM assign1)
         |  GROUP BY cell, dim),
         |cents AS (SELECT cell, list(centroid ORDER BY dim) AS ce FROM comps GROUP BY cell),
         |cells AS (${argmaxSql("cents")}),
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE list_cosine_similarity(a.e, b.e) >= 0.95)
         |SELECT vec_id, cell FROM cells
         |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin) { (s, dir) =>
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      val augmented = e.unionByName(
        e.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      // dim = 64 (embeddings fixture width): enables the single-exchange
      // wide centroid fold inside kmeansCells (r11)
      graft.dedup.Dedup.semanticDedup(augmented, k = k, iters = 1, tau = 0.95,
        dim = 64)
    }
  }

  /** Shared oracle CTE chain for product quantization (Pq.codebooks →
    * Pq.encode): subvector projection, per-subspace seeds from the k
    * smallest vec_ids, one Lloyd round with L2-argmin assignment
    * ((dist asc, cell asc) tie-break) and exact-decimal centroid means,
    * then the final code assignment — the same arithmetic the Spark
    * side executes, spelled out relationally.
    */
  private def pqSql(m: Int, sd: Int, k: Int): String = {
    def assignSql(booksRel: String): String =
      s"""SELECT vec_id, sub, se, cell FROM (
         |    SELECT s.vec_id, s.sub, s.se, c.cell,
         |      row_number() OVER (PARTITION BY s.vec_id, s.sub
         |        ORDER BY list_distance(s.se, c.ce) ASC, c.cell) AS rn
         |    FROM subs s JOIN $booksRel c USING (sub)) WHERE rn = 1""".stripMargin
    s"""raw AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |subs AS (
       |  SELECT vec_id, CAST(sub AS INT) AS sub,
       |    list_slice(e, sub * $sd + 1, sub * $sd + $sd) AS se
       |  FROM (SELECT vec_id, e, unnest(range(0, $m)) AS sub FROM raw)),
       |seeds AS (
       |  SELECT sub,
       |    CAST(row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1 AS INT) AS cell,
       |    se AS ce
       |  FROM subs WHERE vec_id IN (SELECT vec_id FROM raw ORDER BY vec_id LIMIT $k)),
       |assign1 AS (${assignSql("seeds")}),
       |comps AS (
       |  SELECT sub, cell, dim,
       |    CAST(sum(CAST(v AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS centroid
       |  FROM (SELECT sub, cell, generate_subscripts(se, 1) AS dim, unnest(se) AS v
       |        FROM assign1)
       |  GROUP BY sub, cell, dim),
       |books AS (SELECT sub, cell, list(centroid ORDER BY dim) AS ce
       |          FROM comps GROUP BY sub, cell),
       |codes AS (SELECT vec_id, sub, cell AS code FROM (${assignSql("books")}))""".stripMargin
  }

  /** PQ codes (Pq.codebooks + Pq.encode, m=4 subspaces × k=16 cells over
    * dim 64, one Lloyd round): 64 floats → 4 small ints per vector. The
    * oracle replays the whole chain; determinism rides the kmeansCells
    * discipline (smallest-vec_id seeds, L2 argmin with total tie-break,
    * exact-decimal means).
    */
  val pqCodes: Q = {
    val (dim, m, k) = (64, 4, 16)
    Q(
      "v10_pq_codes",
      s"""WITH ${pqSql(m, dim / m, k)}
         |SELECT vec_id, sub, code FROM codes""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      Pq.encode(e, Pq.codebooks(e, dim, m, k, iters = 1), dim, m)
    }
  }

  /** ADC top-k (Pq.adcTopK): cosine approximated entirely from PQ codes
    * and a per-query LUT of query×centroid partial products — <q, v̂> =
    * Σ_j ip[sub, code_j], ‖v̂‖² = Σ_j csq[sub, code_j]. The corpus scan
    * touches only the code stream (the PQ bandwidth win); the oracle
    * replays codebooks, codes, LUT, and the summed scores.
    */
  val pqAdcTopK: Q = {
    val (dim, m, k) = (64, 4, 16)
    Q(
      "v11_pq_adc_topk",
      s"""WITH ${pqSql(m, dim / m, k)},
         |q AS (SELECT vec_id AS query_id, e AS qe FROM raw WHERE vec_id < 5),
         |qsubs AS (
         |  SELECT query_id, CAST(sub AS INT) AS sub,
         |    list_slice(qe, sub * ${dim / m} + 1, sub * ${dim / m} + ${dim / m}) AS qs
         |  FROM (SELECT query_id, qe, unnest(range(0, $m)) AS sub FROM q)),
         |lut AS (
         |  SELECT query_id, sub, cell AS code,
         |    list_dot_product(qs, ce) AS ip, list_dot_product(ce, ce) AS csq
         |  FROM qsubs JOIN books USING (sub)),
         |scored AS (
         |  SELECT query_id, vec_id AS neighbor_id,
         |    sum(ip) AS aip, sqrt(sum(csq)) AS vn
         |  FROM codes JOIN lut USING (sub, code)
         |  GROUP BY query_id, vec_id),
         |qn AS (SELECT query_id, sqrt(list_dot_product(qe, qe)) AS qn FROM q)
         |SELECT query_id, neighbor_id, round(sim, 6) AS sim, CAST(rn AS INT) AS rank FROM (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id) AS rn
         |  FROM (
         |    SELECT s.query_id, s.neighbor_id,
         |      CASE WHEN q.qn * s.vn = 0 THEN 0.0 ELSE s.aip / (q.qn * s.vn) END AS sim
         |    FROM scored s JOIN qn q USING (query_id)
         |    WHERE s.query_id <> s.neighbor_id))
         |WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      Pq.adcTopK(e, e.filter(col("vec_id") < 5), dim, m, k, topK = 3, iters = 1)
        .select(col("query_id"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"), col("rank"))
    }
  }

  /** Two-stage PQ retrieval (Pq.adcRerankTopK): ADC top-`coarseK` from
    * codes alone, then exact cosine rerank of ONLY those candidates —
    * the compressed-index search shape a 100 TB corpus actually runs
    * (coarse pass reads m codes/vector, exact join touches
    * |queries|·coarseK rows). The oracle replays the full chain:
    * codebooks → codes → LUT → ADC coarse set → exact rerank.
    */
  val pqRerank: Q = {
    val (dim, m, k, coarseK) = (64, 4, 16, 32)
    Q(
      "v12_pq_rerank",
      s"""WITH ${pqSql(m, dim / m, k)},
         |q AS (SELECT vec_id AS query_id, e AS qe FROM raw WHERE vec_id < 5),
         |qsubs AS (
         |  SELECT query_id, CAST(sub AS INT) AS sub,
         |    list_slice(qe, sub * ${dim / m} + 1, sub * ${dim / m} + ${dim / m}) AS qs
         |  FROM (SELECT query_id, qe, unnest(range(0, $m)) AS sub FROM q)),
         |lut AS (
         |  SELECT query_id, sub, cell AS code,
         |    list_dot_product(qs, ce) AS ip, list_dot_product(ce, ce) AS csq
         |  FROM qsubs JOIN books USING (sub)),
         |scored AS (
         |  SELECT query_id, vec_id AS neighbor_id,
         |    sum(ip) AS aip, sqrt(sum(csq)) AS vn
         |  FROM codes JOIN lut USING (sub, code)
         |  GROUP BY query_id, vec_id),
         |qn AS (SELECT query_id, sqrt(list_dot_product(qe, qe)) AS qn FROM q),
         |coarse AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, neighbor_id) AS rn
         |    FROM (
         |      SELECT s.query_id, s.neighbor_id,
         |        CASE WHEN q.qn * s.vn = 0 THEN 0.0 ELSE s.aip / (q.qn * s.vn) END AS sim
         |      FROM scored s JOIN qn q USING (query_id)
         |      WHERE s.query_id <> s.neighbor_id))
         |  WHERE rn <= $coarseK)
         |SELECT query_id, neighbor_id, round(sim, 6) AS sim, CAST(rn AS INT) AS rank FROM (
         |  SELECT c.query_id, c.neighbor_id,
         |    list_cosine_similarity(qv.e, nv.e) AS sim,
         |    row_number() OVER (PARTITION BY c.query_id
         |      ORDER BY list_cosine_similarity(qv.e, nv.e) DESC, c.neighbor_id) AS rn
         |  FROM coarse c
         |  JOIN raw nv ON nv.vec_id = c.neighbor_id
         |  JOIN raw qv ON qv.vec_id = c.query_id)
         |WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      Pq.adcRerankTopK(e, e.filter(col("vec_id") < 5), dim, m, k, topK = 3,
          coarseK = coarseK, iters = 1)
        .select(col("query_id"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"), col("rank"))
    }
  }

  /** IVF-PQ search (Pq.ivfAdcTopK): the IVFADC composition — a k-means
    * coarse quantizer routes each query to its nprobe nearest cells and
    * ADC scores ONLY those cells' code stream, so the scan cost is
    * (nprobe/kCells) of the corpus × (m codes instead of dim floats).
    * The oracle replays every stage: PQ codebooks/codes (the v10 chain),
    * k-means cells (the v6 chain), post-assignment routing centroids,
    * nprobe routing, and the cell-scoped ADC scoring.
    */
  val ivfPq: Q = {
    val (dim, m, k, kCells, nprobe) = (64, 4, 16, 8, 2)
    Q(
      "v13_ivfpq",
      s"""WITH ${pqSql(m, dim / m, k)},
         |q AS (SELECT vec_id AS query_id, e AS qe FROM raw WHERE vec_id < 5),
         |cseeds AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, e AS ce
         |  FROM (SELECT vec_id, e FROM raw ORDER BY vec_id LIMIT $kCells)),
         |cassign1 AS (SELECT vec_id, e, cell FROM (
         |    SELECT r.vec_id, r.e, c.cell,
         |      row_number() OVER (PARTITION BY r.vec_id
         |        ORDER BY list_cosine_similarity(r.e, c.ce) DESC, c.cell) AS rn
         |    FROM raw r CROSS JOIN cseeds c) WHERE rn = 1),
         |ccomps AS (
         |  SELECT cell, dim, CAST(sum(CAST(v AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS centroid
         |  FROM (SELECT cell, generate_subscripts(e, 1) AS dim, unnest(e) AS v FROM cassign1)
         |  GROUP BY cell, dim),
         |ccents AS (SELECT cell, list(centroid ORDER BY dim) AS ce FROM ccomps GROUP BY cell),
         |cassign AS (SELECT vec_id, cell FROM (
         |    SELECT r.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY r.vec_id
         |        ORDER BY list_cosine_similarity(r.e, c.ce) DESC, c.cell) AS rn
         |    FROM raw r CROSS JOIN ccents c) WHERE rn = 1),
         |rcomps AS (
         |  SELECT cell, dim, CAST(sum(CAST(v AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS centroid
         |  FROM (SELECT a.cell, generate_subscripts(r.e, 1) AS dim, unnest(r.e) AS v
         |        FROM raw r JOIN cassign a USING (vec_id))
         |  GROUP BY cell, dim),
         |rcents AS (SELECT cell, list(centroid ORDER BY dim) AS ce FROM rcomps GROUP BY cell),
         |routed AS (SELECT query_id, cell FROM (
         |    SELECT q.query_id, c.cell,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY list_cosine_similarity(q.qe, c.ce) DESC, c.cell) AS rn
         |    FROM q CROSS JOIN rcents c) WHERE rn <= $nprobe),
         |qsubs AS (
         |  SELECT query_id, CAST(sub AS INT) AS sub,
         |    list_slice(qe, sub * ${dim / m} + 1, sub * ${dim / m} + ${dim / m}) AS qs
         |  FROM (SELECT query_id, qe, unnest(range(0, $m)) AS sub FROM q)),
         |lut AS (
         |  SELECT query_id, sub, cell AS code,
         |    list_dot_product(qs, ce) AS ip, list_dot_product(ce, ce) AS csq
         |  FROM qsubs JOIN books USING (sub)),
         |scored AS (
         |  SELECT l.query_id, cd.vec_id AS neighbor_id,
         |    sum(l.ip) AS aip, sqrt(sum(l.csq)) AS vn
         |  FROM codes cd
         |  JOIN cassign ca USING (vec_id)
         |  JOIN routed r ON r.cell = ca.cell
         |  JOIN lut l ON l.query_id = r.query_id AND l.sub = cd.sub AND l.code = cd.code
         |  GROUP BY l.query_id, cd.vec_id),
         |qn AS (SELECT query_id, sqrt(list_dot_product(qe, qe)) AS qn FROM q)
         |SELECT query_id, neighbor_id, round(sim, 6) AS sim, CAST(rn AS INT) AS rank FROM (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id) AS rn
         |  FROM (
         |    SELECT s.query_id, s.neighbor_id,
         |      CASE WHEN q.qn * s.vn = 0 THEN 0.0 ELSE s.aip / (q.qn * s.vn) END AS sim
         |    FROM scored s JOIN qn q USING (query_id)
         |    WHERE s.query_id <> s.neighbor_id))
         |WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      Pq.ivfAdcTopK(e, e.filter(col("vec_id") < 5), dim, m, k,
          kCells = kCells, nprobe = nprobe, topK = 3, iters = 1)
        .select(col("query_id"), col("neighbor_id"),
          round(col("sim"), 6).as("sim"), col("rank"))
    }
  }

  /** Exact population covariance matrix of the embedding corpus, upper
    * triangle (Pca.covariance) — the distributed kernel under the PCA /
    * whitening front end (Pca.fit's eigensolve and Pca.project are
    * driver-/map-side over this output and are spec-locked in PcaSpec).
    * The d²-per-row outer products never reach the shuffle: the
    * Generate feeds a partial aggregate in the same stage, and decimal
    * accumulation makes the matrix bit-identical under any partitioning
    * — which is exactly what lets DuckDB replay it hash-exact here.
    */
  val covarianceMatrix: Q = Q(
    "v14_covariance",
    """WITH u AS (
      |  SELECT vec_id,
      |    unnest(range(64)) AS i,
      |    unnest(list_transform(range(64), k -> CAST(embedding[k + 1] AS DOUBLE))) AS x
      |  FROM embeddings)
      |SELECT a.i AS i, b.i AS j,
      |  round(CAST(sum(CAST(a.x * b.x AS DECIMAL(30,10))) AS DOUBLE) / count(*) -
      |    (CAST(sum(CAST(a.x AS DECIMAL(30,10))) AS DOUBLE) / count(*)) *
      |    (CAST(sum(CAST(b.x AS DECIMAL(30,10))) AS DOUBLE) / count(*)), 9) AS cov
      |FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    graft.ann.Pca.covariance(emb(s, dir), dim = 64)
  }

  /** Johnson–Lindenstrauss random projection
    * (RandomProjection.project): 64 → 8 dims through the deterministic
    * md5-sign ±1/√8 matrix — the data-independent reduction (no fit
    * pass, unlike v14's PCA). The oracle REBUILDS the matrix in SQL
    * from the same "rp:j:i" md5 strings and replays the projection
    * relationally, so matrix generation and fold agree cross-engine;
    * rounding to 6 dp absorbs the two engines' summation-order
    * difference (64 O(1) terms — error ~1e-14).
    */
  val randomProjection: Q = Q(
    "v15_random_projection",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
      |x AS (SELECT vec_id, i, ev[i] AS v
      |      FROM (SELECT vec_id, ev, unnest(range(1, len(ev) + 1)) AS i FROM e)),
      |s AS (SELECT j, i,
      |    (CASE WHEN substr(md5('rp:' || CAST(j - 1 AS VARCHAR) || ':' ||
      |          CAST(i - 1 AS VARCHAR)), 1, 1)
      |      IN ('0','1','2','3','4','5','6','7') THEN 1.0 ELSE -1.0 END) / sqrt(8) AS w
      |  FROM (SELECT unnest(range(1, 9)) AS j)
      |  CROSS JOIN (SELECT unnest(range(1, 65)) AS i))
      |SELECT vec_id, CAST(j AS INT) AS j, round(sum(w * v), 6) AS comp
      |FROM x JOIN s USING (i) GROUP BY vec_id, j""".stripMargin) { (s, dir) =>
    graft.ann.RandomProjection.project(emb(s, dir), dimIn = 64, dimOut = 8)
      .select(col("vec_id"), posexplode(col("projected")).as(Seq("p", "comp")))
      .select(col("vec_id"), (col("p") + 1).cast("int").as("j"),
        round(col("comp"), 6).as("comp"))
  }

  /** 1-bit (sign) quantization + Hamming coarse pass + exact rerank
    * (Ann.binaryRerankKnn) — the compression rung below int8: 64 bits
    * per vector, candidates scanned with xor + popcount. The oracle
    * replays the sign semantics WITHOUT packing — hamming =
    * |{i : (qe[i] > 0) ≠ (ne[i] > 0)}| — which equals
    * bit_count(qsig ^ nsig) by construction, so the two engines agree
    * bit-for-bit while testing the packed path end-to-end.
    */
  val binaryRerank: Q = Q(
    "v16_binary_rerank",
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings),
      |scored AS (
      |  SELECT query_id, neighbor_id, qe, ne,
      |    len(list_filter(range(64), i -> (qe[i+1] > 0) <> (ne[i+1] > 0))) AS hamming
      |  FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
      |coarse AS (
      |  SELECT query_id, neighbor_id, qe, ne FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |                                 ORDER BY hamming, neighbor_id) AS crn
      |    FROM scored) WHERE crn <= 32)
      |SELECT query_id, neighbor_id, round(sim, 6) AS sim, CAST(rn AS INT) AS rank FROM (
      |  SELECT query_id, neighbor_id, list_cosine_similarity(qe, ne) AS sim,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY list_cosine_similarity(qe, ne) DESC, neighbor_id) AS rn
      |  FROM coarse) WHERE rn <= 3""".stripMargin) { (s, dir) =>
    val e = emb(s, dir)
    Ann.binaryRerankKnn(e, e.filter(col("vec_id") < 5), k = 3, coarseK = 32)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  val all: Seq[Q] = Seq(knnBrute, lshAnnPairs, labelCentroids, vectorNorms, ivfSearch,
    kmeansCells, ivfNprobe, int8Quantize, int8Rerank, semanticDedup,
    pqCodes, pqAdcTopK, pqRerank, ivfPq, covarianceMatrix, randomProjection,
    binaryRerank)
}
