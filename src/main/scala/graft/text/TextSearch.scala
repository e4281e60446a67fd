package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact.decSum

/** Lexical retrieval over the document corpus: BM25 top-k ranking — the
  * keyword twin of the embedding ANN surface (graft.ann.Ann), used in
  * training-data pipelines for keyword decontamination, targeted data
  * selection and retrieval baselines.
  *
  * Scale shape: the inverted index (term → postings) shuffles on the
  * term key once; the query term set is broadcast, so scoring touches
  * only postings of queried terms (never the corpus × queries); the
  * per-(query, doc) score is a deterministic sorted fold so any engine
  * reproduces it bit-for-bit. `maxDfFraction` drops corpus-saturating
  * terms (stopwords): a term in k documents contributes k postings per
  * querying query — the same guard as Dedup.jaccardPairs' shingle DF
  * cap, and their BM25 idf is near zero anyway.
  */
object TextSearch {

  private def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** (doc_id, term, tf) built from ONE corpus scan and locally
    * checkpointed: the tf table feeds document length, document frequency
    * AND the postings join, and without the cut Catalyst recomputes the
    * whole corpus explode once per consumer (measured: three parquet
    * scans in the x18 physical plan, zero AQE stage reuse). Same pattern
    * as Grounding's persisted label table and clusters()' per-round cut;
    * tf is far smaller than the text it summarizes, so materializing it
    * beats re-scanning the corpus at any scale.
    *
    * Empty documents keep one NULL-term row (explode_outer) so
    * downstream can rebuild exact document counts and lengths; filter
    * `term IS NOT NULL` before term-keyed work.
    */
  private def termFreqs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode_outer(words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      // SERIALIZED blocks: tf is corpus × vocabulary sized and only ever
      // scanned (df agg, dl agg, postings join) — deserialized row
      // objects amplified it ~5× in the block manager and saturated the
      // 40M-doc soak's MemoryStore, while the overflow path serializes
      // to disk anyway. Same rule as clusters()' edge blocks.
      .localCheckpoint(false, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

  /** Lucene-variant BM25: idf = ln((N − df + 0.5)/(df + 0.5) + 1),
    * score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    *
    * `docs` is (doc_id, text); `queries` is (query_id, terms:
    * array<string>) — pre-tokenized so callers control query parsing.
    * Returns top `k` docs per query as (query_id, doc_id, score, rank).
    *
    * The final ranking is two-phase: a partial top-k per (query,
    * doc-hash shard) runs first, so the single per-query task of the
    * global window sees at most `shards`·k rows — a query whose terms
    * match a huge share of the corpus can no longer funnel its whole
    * scored stream through one task. The shard phase keeps a superset
    * of the global top-k (every global winner wins its shard), so
    * results are identical.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      maxDfFraction: Double = 0.5, shards: Int = 32): DataFrame = {
    val tf0 = termFreqs(docs)
    // dl rebuilt FROM tf (one corpus scan total): Σ tf per doc is the
    // word count; the NULL-term marker keeps empty docs at dl = 0 so
    // n_docs/avgdl match a direct per-document count exactly
    val dl = tf0.groupBy(col("doc_id"))
      .agg(sum(when(col("term").isNull, lit(0L)).otherwise(col("tf"))).as("dl"))
    // exact-decimal mean so every engine computes the identical avgdl
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (decSum(col("dl").cast("double")) / count(lit(1))).as("avgdl"))
    val tf = tf0.filter(col("term").isNotNull)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val qTerms = queries
      .select(col("query_id"), explode(array_distinct(col("terms"))).as("term"))

    // idf once per term, stopword cap applied BEFORE the postings join so
    // saturating terms never fan out into the score stream
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val terms = dfreq.crossJoin(broadcast(stats))
      .filter(col("df").cast("double") <= lit(maxDfFraction) * col("n_docs"))
      .select(col("term"), idf.as("idf"), col("avgdl"))

    // (k1 + 1) is summed at RUNTIME on both engines — a Scala-constant
    // 2.2 and a SQL-parsed `1.2 + 1` can differ in the last ulp
    val denom = col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))
    val termScore = (col("idf") * (col("tf") * (lit(k1) + lit(1.0))) / denom).as("s")

    val scored = tf
      .join(broadcast(qTerms), Seq("term"))
      .join(terms, Seq("term"))
      .join(dl, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("term"), termScore)

    // deterministic summation: fold term scores in term order (terms are
    // unique per (query, doc)), the same left-to-right double chain the
    // SQL oracle spells with list_reduce over an ordered list
    val wShard = Window.partitionBy(col("query_id"), col("_shard"))
      .orderBy(col("score").desc, col("doc_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    scored
      .groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("score"))
      // phase 1: shard-local top-k structurally bounds the global stage
      .withColumn("_shard", pmod(hash(col("doc_id")), lit(shards)))
      .withColumn("_r", row_number().over(wShard))
      .filter(col("_r") <= k)
      .drop("_shard", "_r")
      // phase 2: the per-query task ranks at most shards·k survivors
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** TF-IDF top-k terms per document — the keyword-extraction primitive a
    * training pipeline uses for topic tagging and targeted selection.
    * idf is the ln-free `(N + 1) / (df + 1)` variant: score arithmetic
    * stays exact rational-in-double, so every engine ranks identically
    * (a `ln` differs in the last ulp across libm implementations, which
    * flips adjacent ranks at near-ties and breaks cross-engine parity).
    *
    * Scale shape: tf is a (doc, term) combinable aggregation; df reuses
    * the tf table with a term-key aggregation; the corpus size joins in
    * as a broadcast 1-row frame; the top-k window partitions by doc_id,
    * whose per-key row count is bounded by document length — never a
    * corpus-wide funnel.
    */
  /** Reciprocal-rank fusion of a lexical and a vector ranking — the
    * standard hybrid-retrieval combiner (Cormack et al., SIGIR 2009):
    * rrf(d) = Σ_lists 1 / (kRrf + rank_list(d)), summing only over lists
    * that ranked d. Both inputs are (query_id, doc_id, rank) as produced
    * by bm25TopK / Ann.bruteForceKnn; returns the fused top `k` per query
    * as (query_id, doc_id, lex_rank, vec_rank, rrf, rank) with absent
    * ranks encoded as 0 (a real rank is always >= 1).
    *
    * Scale shape: both inputs are already top-k-bounded per query by
    * their own two-phase windows, so the full-outer join here keys on
    * (query_id, doc_id) over at most k_lex + k_vec rows per query — the
    * fusion cost tracks the query count, never the corpus. The RRF sum
    * is a fixed left-to-right two-term chain (lex first), so every
    * engine computes bit-identical scores; the final window partitions
    * by query over <= k_lex + k_vec candidates.
    */
  def rrfFuse(lex: DataFrame, vec: DataFrame, k: Int = 10, kRrf: Int = 60): DataFrame = {
    val l = lex.select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val v = vec.select(col("query_id"), col("doc_id"), col("rank").as("vec_rank"))
    val contrib = (r: Column) =>
      coalesce(lit(1.0) / (lit(kRrf) + r), lit(0.0))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id"))
    l.join(v, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0)).as("vec_rank"),
        (contrib(col("lex_rank")) + contrib(col("vec_rank"))).as("rrf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Top-k tf-idf terms per document. `maxDfRatio` (opt-in) drops terms
    * whose document frequency exceeds that fraction of the corpus BEFORE
    * the scoring join — the jaccardPairs maxShingleDf discipline applied
    * to retrieval: a term in more than half the corpus scores
    * ~tf·(N+1)/(df+1) ≈ tf and cannot beat any selective term for a
    * top-k slot, yet its postings are exactly the hot keys that turn one
    * reducer into a straggler (measured at 10M docs: the corpus
    * stopwords made one task run 16× the median with 2.5 GB of sort
    * spill — SCALE.md). None preserves exact unfiltered semantics (the
    * x18 oracle shape).
    *
    * Output-identity caveat: capped output equals uncapped output only
    * for documents with at least `k` sub-threshold terms. A document
    * whose vocabulary is mostly corpus-hot terms keeps fewer than `k`
    * rows — or none, when every one of its terms is over the threshold
    * (the hot term would have filled the slot in the uncapped ranking).
    * That row loss is deliberate cap semantics, driver-checked
    * cross-engine by x30_tfidf_capped (whose fixture hits exactly this
    * edge); pick `maxDfRatio` above the df of any term you need ranked.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3,
      maxDfRatio: Option[Double] = None): DataFrame = {
    val tf = termFreqs(docs).filter(col("term").isNotNull)
    val dfreqAll = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // metadata-cheap: count(*) over parquet prunes every column
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val dfreq = maxDfRatio.fold(dfreqAll)(r =>
      dfreqAll.crossJoin(broadcast(n))
        .filter(col("df") <= col("n_docs") * r)
        .drop("n_docs"))
    val score = col("tf").cast("double") * (col("n_docs") + 1) / (col("df") + 1)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), score.as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Exact phrase occurrence counts via positional postings — the
    * decontamination primitive BM25 can't express (bag-of-words scoring
    * cannot distinguish "model train" from "train model", but a leaked
    * benchmark prompt is a SEQUENCE).
    *
    * A token at position p matching phrase word i votes for anchor
    * p − i; an anchor collecting all |phrase| distinct vote indices is a
    * complete occurrence (correct even when the phrase repeats a word:
    * index i's vote at anchor a exists iff the token at a + i matches
    * phrase(i)). Occurrences may overlap — "w w w" contains "w w"
    * twice — which substring-count oracles get wrong and the anchor
    * count gets right; x38's oracle replays the same anchor arithmetic
    * relationally.
    *
    * Scale shape: the phrase table is a broadcast of |phrase| rows, so
    * the corpus token stream is filtered MAP-SIDE to postings of the
    * phrase's terms before anything shuffles — the exchange carries only
    * matched postings, never the tokenized corpus. Positions are 1-based
    * over the raw single-space split (both engines index the same way).
    * Returns (doc_id, n_matches) for documents with ≥ 1 occurrence.
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val phraseDf = docs.sparkSession
      .createDataFrame(phrase.zipWithIndex).toDF("term", "idx")
    docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos0", "term")))
      .join(broadcast(phraseDf), Seq("term"))
      // one row per (doc, anchor, idx) by construction — the token at
      // position anchor + idx either matches phrase(idx) or produced no
      // row — so count(*) equals count(DISTINCT idx) without the
      // distinct aggregate's extra expand/exchange phase (the oracle
      // keeps the DISTINCT form as an independent derivation)
      .groupBy(col("doc_id"), (col("pos0") + 1 - col("idx")).as("anchor"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") === phrase.length)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** All-pairs tf-idf cosine document similarity above `minCos` — the
    * weighted-lexical near-dup / redundancy measure between the set
    * measures (Dedup.jaccardPairs, containmentPairs) and the embedding
    * side (Ann): two documents about the same topic score high even when
    * their shared vocabulary is a small fraction of either text, because
    * selective (low-df) terms dominate the weight mass (Bayardo et al.
    * 2007, "Scaling Up All Pairs Similarity Search" — the inverted-index
    * formulation).
    *
    * Determinism: weights use the ln-free idf `tf·(N+1)/(df+1)` (exact
    * rational-in-double, see tfidfTopTerms), dots and squared norms are
    * term-ordered left-to-right folds, and sqrt is correctly rounded by
    * IEEE — so every engine computes bit-identical cosines.
    *
    * Scale shape: one (doc, term) tf aggregation; the df cap (`maxDf`,
    * absolute — the jaccardPairs discipline) bounds the postings
    * self-join at k² rows per term and removes exactly the terms whose
    * idf weight is negligible anyway; norms are computed over the SAME
    * capped universe so cosines stay self-consistent. Nothing
    * materializes N² pairs.
    */
  def cosinePairs(docs: DataFrame, minCos: Double = 0.5,
      maxDf: Int = 1000): DataFrame = {
    val tf = termFreqs(docs).filter(col("term").isNotNull)
    // metadata-cheap singleton, broadcast by the house rule
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // the under-cap df table does double duty: scale guard AND the idf
    // denominator — one term-keyed join applies both (no separate
    // anti-join needed, unlike jaccardPairs where df is not otherwise
    // used)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val weights = tf.join(dfreq, Seq("term")).crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") * (col("n_docs") + 1) / (col("df") + 1)).as("w"))
    val norms = weights.groupBy(col("doc_id"))
      .agg(sqrt(aggregate(
        array_sort(collect_list(struct(col("term"), col("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w") * x.getField("w"))).as("nrm"))
    val a = weights.alias("a")
    val b = weights.alias("b")
    val dots = a
      .join(b, col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
        col("a.term").as("term"), (col("a.w") * col("b.w")).as("p"))
      .groupBy(col("doc1"), col("doc2"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("p")))),
        lit(0.0), (acc, x) => acc + x.getField("p")).as("dot"))
    val cos = col("dot") / (col("nrm1") * col("nrm2"))
    // norms join: one row per doc — AQE broadcasts when it fits, exactly
    // the jaccardPairs sizes-join rationale
    dots
      .join(norms.select(col("doc_id").as("doc1"), col("nrm").as("nrm1")), Seq("doc1"))
      .join(norms.select(col("doc_id").as("doc2"), col("nrm").as("nrm2")), Seq("doc2"))
      .filter(cos >= minCos)
      .select(col("doc1"), col("doc2"), cos.as("cosine"))
  }
}
