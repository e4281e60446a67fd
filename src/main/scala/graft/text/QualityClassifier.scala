package graft.text

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Sampling

/** Model-based quality filtering with a TRAINED classifier — the
  * fastText-style quality gate (as used for CommonCrawl curation in the
  * GPT-3 / PaLM data pipelines: train a linear classifier to separate a
  * trusted corpus from raw crawl, keep documents the model scores high).
  * Complements the rule-based gates (TextQuality.gopherGates) and the
  * corpus-statistical signals (LangModel): this is the supervised member
  * of the filter family.
  *
  * Featurization is hashed bag-of-bigrams over the SAME md5-nibble
  * bucket both engines replay bit-for-bit (Sampling.hashBucket16), so
  * the scoring path is oracle-checkable and fit/score cannot drift
  * apart.
  *
  * Scale shape:
  *   - [[score]] is pure map-side expression work — bigrams, bucket
  *     hashing, and the weighted fold never leave the row; the model
  *     (`buckets` doubles) is a plan literal. Corpus-linear, no shuffle,
  *     whole-stage codegen.
  *   - [[fit]] is the one deliberately iterative step (the Word2Vec /
  *     k-means posture, SCALE.md "driver-resident model state"): MLlib
  *     LBFGS, each iteration one combinable gradient treeAggregate over
  *     the corpus, model state = `buckets` doubles on the driver. Train
  *     on a SAMPLE (hashSplit / weightedSample) as the published
  *     pipelines do — the classifier needs thousands of exemplars, not
  *     the corpus.
  */
object QualityClassifier {

  /** Ordered hashed-bigram bucket ids for a document (array<int>,
    * position order preserved — the scoring fold depends on it).
    */
  def bucketIds(text: Column, buckets: Int = 256): Column = {
    val w = split(text, " ")
    val m = size(w) - 1
    val grams = zip_with(slice(w, lit(1), m), slice(w, lit(2), m),
      (a, b) => concat_ws(" ", a, b))
    transform(grams, g => pmod(Sampling.hashBucket16(g), lit(buckets)))
  }

  /** Map-side linear scoring: prob = sigmoid(intercept + Σ_i w[bucket_i])
    * — each bigram occurrence adds its bucket's weight, a strict
    * left-to-right fold in document order so the float sum is
    * bit-reproducible cross-engine. Documents with fewer than two words
    * score sigmoid(intercept). Output: (id, n_feats, prob) with prob
    * rounded to 6 dp (sigmoid is the one libm call, far above 1 ulp).
    */
  def score(docs: DataFrame, weights: Seq[Double], intercept: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val wlit = array(weights.map(lit): _*)
    val bids = bucketIds(col(textCol), weights.size)
    val z = aggregate(bids, lit(intercept),
      (acc, b) => acc + element_at(wlit, b + 1))
    docs.select(col(idCol),
      size(bids).as("n_feats"),
      round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("prob"))
  }

  /** Fit a logistic-regression quality model on labelled exemplars:
    * returns (weights, intercept) sized to `buckets`, ready for
    * [[score]]. The per-doc feature vector is the dense bucket-count
    * histogram built from the SAME [[bucketIds]] hashing the scorer
    * uses. `labelCol` must be 0.0/1.0 (1 = high quality).
    */
  def fit(docs: DataFrame, spark: SparkSession, labelCol: String = "label",
      textCol: String = "text", buckets: Int = 256, maxIter: Int = 50,
      regParam: Double = 0.0): (Seq[Double], Double) = {
    import spark.implicits._
    // persisted (serialized) for the optimizer: LBFGS reads the
    // featurized frame once per iteration, and without the pin each
    // gradient pass re-executes the text → bigram → md5-bucket lineage
    // (measured at 10M docs / 4% sample: the un-pinned fit made the
    // whole stage 5.9× for 4× data; pinned it returns to sample-linear)
    val data = docs
      .select(col(labelCol).cast("double").as("label"),
        bucketIds(col(textCol), buckets).as("bids"))
      .as[(Double, Seq[Int])]
      .map { case (l, bids) =>
        val counts = new Array[Double](buckets)
        bids.foreach(b => counts(b) += 1.0)
        (l, Vectors.dense(counts))
      }
      .toDF("label", "features")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      val model = new LogisticRegression()
        .setMaxIter(maxIter).setRegParam(regParam).fit(data)
      (model.coefficients.toArray.toSeq, model.intercept)
    } finally data.unpersist()
  }
}
