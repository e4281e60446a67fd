package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.Sampling

/** Corpus-trained n-gram language-model signals for training-data
  * curation — the two standard model-based filters a 100 TB pipeline
  * runs after the rule-based gates (language-ID, Gopher stats):
  *
  *   - [[crossEntropy]]: CCNet-style perplexity filtering (Wenzek et
  *     al. 2020 train a KenLM and keep the low-perplexity head; here
  *     the LM is an interpolated bigram model trained ON the corpus
  *     itself, so the signal is self-contained and exactly
  *     reproducible relationally).
  *   - [[dsirLogWeights]]: DSIR importance weights (Xie et al. 2023,
  *     "Data Selection for Language Models via Importance Resampling"):
  *     hashed n-gram bag-of-features log-likelihood ratio between a
  *     target domain and the raw corpus.
  *
  * Both are pure DataFrame compositions — no UDFs, no collect — whose
  * expensive parts are term-keyed hash aggregations with map-side
  * partial combine; see the scale notes on each method.
  */
object LangModel {

  /** (doc_id, w1, w2) adjacent word-pair stream — the LM's training
    * and scoring events. Map-side only (zip_with over shifted slices,
    * the Dedup.shingles discipline: lambdas never capture an inline
    * expression). Documents with fewer than two words drop out.
    */
  private def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = split(col(textCol), " ")
    val m = size(w) - 1
    docs.filter(size(w) >= 2)
      .select(col(idCol).as("doc_id"),
        explode(zip_with(slice(w, lit(1), m), slice(w, lit(2), m),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Per-document cross-entropy (bits/token) under an interpolated
    * bigram LM trained on the corpus itself:
    *
    *   p(w_i | w_{i-1}) = lambda * c(w_{i-1} w_i)/c(w_{i-1})
    *                    + (1-lambda) * c(w_i)/T
    *
    * with the document's first token scored by the unigram term alone.
    * Output: (doc_id, n_tokens, h_bits) where h_bits = -mean log2 p
    * rounded to 6 dp (perplexity = 2^h_bits). Low h_bits = the
    * corpus-typical head CCNet keeps; high = the outlier tail.
    *
    * Scale shape: unigram/bigram counts are map-side-combinable hash
    * aggregations on term keys (shuffle volume = distinct vocabulary,
    * a small fraction of the token stream); scoring re-attaches counts
    * via three equi-joins on those same keys — count tables carry one
    * row per term, so join fan-out is exactly 1 and hot stopword keys
    * skew only probe-side partitioning, which AQE skew-split handles.
    * The corpus total is a broadcast singleton. Per-doc reduction is
    * one combinable doc_id shuffle. Nothing is quadratic in corpus
    * size; no window touches the token stream.
    */
  def crossEntropy(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", lambda: Double = 0.7): DataFrame = {
    val w = split(col(textCol), " ")
    val scorable = docs.filter(size(w) >= 2)
    // uniform doc-keyed exchange as the shared lineage cut (the
    // TextQuality.overlapPairs remedy, measured 2.9× there): the bigram
    // stream is pure map-side lineage consumed THREE times (token
    // stream → unigram counts, bigram counts, and the scored join), so
    // without an exchange between, each consumer re-executes the
    // split+explode of the whole corpus; one repartition makes the
    // three consumers share a single canonical exchange via AQE stage
    // reuse (r10 x31 stage profile: ~100 s task CPU, almost all in the
    // repeated explode lineage, shuffles ≤ 2 MB)
    val bg = bigrams(docs, idCol, textCol).repartition(col("doc_id"))
    // token stream = every w1 plus each doc's final word (covers every
    // token exactly once); unigram counts come from it
    val tokens = bg.select(col("doc_id"), col("w1").as("w"))
      .unionByName(scorable.select(col(idCol).as("doc_id"),
        element_at(w, -1).as("w")))
    val uniCounts = tokens.groupBy(col("w")).agg(count(lit(1)).cast("double").as("c1"))
    val total = broadcast(uniCounts.agg(sum(col("c1")).as("t")))
    val biCounts = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("double").as("c2"))

    val scoredBigrams = bg
      .join(biCounts, Seq("w1", "w2"))
      .join(uniCounts.select(col("w").as("w1"), col("c1").as("c_prev")), Seq("w1"))
      .join(uniCounts.select(col("w").as("w2"), col("c1").as("c_cur")), Seq("w2"))
      .crossJoin(total)
      .select(col("doc_id"),
        log2(lit(lambda) * col("c2") / col("c_prev") +
          lit(1 - lambda) * col("c_cur") / col("t")).as("logp"))
    val scoredFirst = scorable
      .select(col(idCol).as("doc_id"), element_at(w, 1).as("w"))
      .join(uniCounts, Seq("w"))
      .crossJoin(total)
      .select(col("doc_id"), log2(col("c1") / col("t")).as("logp"))

    scoredFirst.unionByName(scoredBigrams)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(-avg(col("logp")), 6).as("h_bits"))
  }

  /** DSIR importance log-weights: per document, the log-likelihood
    * ratio of its hashed-bigram feature bag under the target-domain
    * feature distribution vs the raw-corpus one (Xie et al. 2023 §3;
    * add-1 smoothing over `buckets` hashed features). `isTarget` marks
    * the target-domain exemplar rows inside `docs` — in DSIR proper
    * the target is a small high-quality corpus; relationally it is a
    * predicate over the same table. Output: (doc_id, n_feats, log_w)
    * with log_w rounded to 6 dp — resample by keeping the
    * highest-weight documents.
    *
    * Scale shape: the feature stream is map-side (adjacent word pairs
    * hashed through the md5-nibble bucket both engines replay
    * bit-for-bit — Sampling.hashBucket16); bucket counts are ONE
    * combinable aggregation over `buckets` keys whose result is
    * constant-size and broadcast back; the per-doc reduction is one
    * doc_id shuffle. Corpus-linear with constant-size model state —
    * the same shape at 100 TB.
    */
  def dsirLogWeights(docs: DataFrame, isTarget: Column,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 256): DataFrame = {
    val w = split(col(textCol), " ")
    val m = size(w) - 1
    val stream = docs.filter(size(w) >= 2)
      .select(col(idCol).as("doc_id"), isTarget.as("is_t"),
        explode(zip_with(slice(w, lit(1), m), slice(w, lit(2), m),
          (a, b) => concat(a, lit(" "), b))).as("g"))
      .select(col("doc_id"), col("is_t"),
        (Sampling.hashBucket16(col("g")) % buckets).as("b"))

    val counts = stream.groupBy(col("b")).agg(
      count(lit(1)).cast("double").as("cr"),
      sum(when(col("is_t"), 1L).otherwise(0L)).cast("double").as("ct"))
    val totals = broadcast(counts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt")))
    val ratios = broadcast(counts.crossJoin(totals)
      .select(col("b"),
        (log2((col("ct") + 1) / (col("nt") + buckets)) -
          log2((col("cr") + 1) / (col("nr") + buckets))).as("lr")))

    stream.join(ratios, Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), round(sum(col("lr")), 6).as("log_w"))
  }
}
