package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product-quantization invariants over the real embeddings table:
  * structural code properties, the exact-recovery limit (k ≥ corpus →
  * every vector is its own centroid → ADC IS brute force), retrieval
  * quality at real compression, and the plan shapes the 100 TB case
  * depends on.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  "codebooks" should "train k cells per subspace with subDim-length centroids" in {
    val books = Pq.codebooks(emb, dim, m = 4, k = 16).cache()
    books.groupBy("sub").count().as[(Int, Long)].collect().foreach { case (_, c) =>
      c shouldBe 16L
    }
    books.select(org.apache.spark.sql.functions.size(col("ce")))
      .distinct().as[Int].collect() shouldBe Array(16)
  }

  "encode" should "emit one in-range code per (vector, subspace)" in {
    val books = Pq.codebooks(emb, dim, m = 4, k = 16)
    val codes = Pq.encode(emb, books, dim, m = 4).cache()
    codes.count() shouldBe emb.count() * 4
    codes.agg(min("code"), max("code")).as[(Int, Int)].head() match {
      case (lo, hi) => lo should be >= 0; hi should be <= 15
    }
    // identical vectors quantize to identical code words
    val packed = Pq.packedCodes(codes)
    val a = packed.filter(col("vec_id") === 0).select("codes").as[Seq[Int]].head()
    a.length shouldBe 4
  }

  "assignCodes" should "agree with the broadcast-join/min_by assignment it replaced" in {
    // semantic lock for the r10 map-side reshape (ADVICE r10: AnnSpec got
    // one for assignCells, PqSpec did not): same argmin, same
    // (dist asc, cell asc) tie-break, for every (vector, subspace)
    val vecs = emb.select(col("vec_id"),
      graft.functions.VectorOps.toDoubleArray(col("embedding")).as("e"))
    val subs = Pq.subvectors(vecs, m = 4, subDim = dim / 4)
    val books = Pq.codebooks(emb, dim, m = 4, k = 16)
    val dist = graft.functions.VectorOps.l2Dist(col("se"), col("ce"))
    val legacy = subs.join(broadcast(books), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("cell"), dist.as("dist"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("cell"), struct(col("dist"), col("cell"))).as("cell"))
    val got = Pq.assignCodes(subs, books)
      .select(col("vec_id"), col("sub"), col("cell"))
    got.exceptAll(legacy).count() shouldBe 0
    legacy.exceptAll(got).count() shouldBe 0
    got.count() shouldBe subs.count()
  }

  "adcTopK" should "equal brute force when k covers the corpus (exact-recovery limit)" in {
    // with one codebook entry per vector, each vector is its own centroid
    // after the Lloyd mean, so ADC reconstructs vectors exactly
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 3)
    val exact = Ann.bruteForceKnn(emb, queries, k = 3)
      .select("query_id", "neighbor_id", "rank")
    val adc = Pq.adcTopK(emb, queries, dim, m = 1, k = n, topK = 3)
      .select("query_id", "neighbor_id", "rank")
    adc.exceptAll(exact).count() shouldBe 0
    adc.count() shouldBe exact.count()
  }

  it should "generate candidates worth reranking at 128x compression (m=4, k=16)" in {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Ann.bruteForceKnn(emb, queries, k = 10)
      .select(col("query_id"), col("neighbor_id")).cache()
    val n = exact.count().toDouble
    // 64 floats -> 4 nibbles is a brutal 128x byte compression; pure
    // ADC at that setting is a candidate GENERATOR, not a ranker
    // (measured grid: adc-only recall@10 = 0.30; adc top-128 + exact
    // rerank = 0.91 at m=4, 0.94 at m=8). Lock both stages.
    val adc = Pq.adcTopK(emb, queries, dim, m = 4, k = 16, topK = 10)
      .select(col("query_id"), col("neighbor_id"))
    exact.intersect(adc).count().toDouble / n should be >= 0.25
    val rer = Pq.adcRerankTopK(emb, queries, dim, m = 4, k = 16, topK = 10,
      coarseK = 128).select(col("query_id"), col("neighbor_id"))
    exact.intersect(rer).count().toDouble / n should be >= 0.9
  }

  "adcRerankTopK" should "return the exact top-k OF the coarse candidate set" in {
    // with coarseK >= corpus the rerank IS brute force, regardless of
    // how lossy the codes are
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 3)
    val exact = Ann.bruteForceKnn(emb, queries, k = 3)
      .select("query_id", "neighbor_id", "rank")
    val rer = Pq.adcRerankTopK(emb, queries, dim, m = 4, k = 16, topK = 3,
      coarseK = n).select("query_id", "neighbor_id", "rank")
    rer.exceptAll(exact).count() shouldBe 0
    rer.count() shouldBe exact.count()
  }

  it should "never scan corpus vectors in the scoring join (codes + broadcast LUT only)" in {
    val plan = Pq.adcTopK(emb, emb.filter(col("vec_id") < 3), dim, m = 4, k = 16, topK = 3)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    // every join the score path performs must be broadcast (LUT,
    // codebooks, query norms) — the only exchanges are the combinable
    // aggregates' hash repartitions
    plan should not include "SortMergeJoin"
  }

  "ivfAdcTopK" should "return only neighbors from the query's routed cells" in {
    val queries = emb.filter(col("vec_id") < 5)
    val (kCells, nprobe) = (8, 2)
    val res = Pq.ivfAdcTopK(emb, queries, dim, m = 4, k = 16,
      kCells = kCells, nprobe = nprobe, topK = 10).cache()
    val cells = Ann.kmeansCells(emb, kCells, iters = 1)
    val ok = res.join(cells.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
    ok.count() shouldBe res.count() // every neighbor has a cell
    res.count() should be > 0L
    // ADC scores of routed members match the unrouted ADC scores for
    // the same (query, neighbor) pairs — routing prunes, never rescores
    val full = Pq.adcTopK(emb, queries, dim, m = 4, k = 16, topK = emb.count().toInt)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("fsim"))
    val joined = res.join(full, Seq("query_id", "neighbor_id"))
    joined.count() shouldBe res.count()
    joined.filter(abs(col("sim") - col("fsim")) > 1e-12).count() shouldBe 0
  }

  it should "equal cell-restricted exact search in the exact-recovery limit" in {
    // m=1, k=corpus: codes reconstruct vectors exactly, so IVF-PQ top-k
    // must equal exact cosine search restricted to the routed cells
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 3)
    val (kCells, nprobe) = (4, 4)
    // nprobe = kCells routes every cell -> IVF-PQ degenerates to full ADC
    val ivf = Pq.ivfAdcTopK(emb, queries, dim, m = 1, k = n,
      kCells = kCells, nprobe = nprobe, topK = 3)
      .select("query_id", "neighbor_id", "rank")
    val exact = Ann.bruteForceKnn(emb, queries, k = 3)
      .select("query_id", "neighbor_id", "rank")
    ivf.exceptAll(exact).count() shouldBe 0
    ivf.count() shouldBe exact.count()
  }
}
