package graft.etl

import org.apache.spark.ml.feature.{Word2Vec, Word2VecModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding step: turn grounded matches into per-publication entity-ID
  * "sentences" and fit a skip-gram Word2Vec over them (capability-parity
  * rebuild of reference Embedding.scala + spark/Helpers.scala:60–80).
  */
object Embedding {

  /** Reference hyperparameters (reference.conf:84–90) + a fixed seed —
    * the reference leaves the seed to Spark's default (nondeterministic
    * across runs); training here is reproducible by default.
    */
  /** numPartitions: the reference pins 16; the round-7 isolated fit
    * sweep (SCALE.md "Embedding") measured the optimum scaling with the
    * corpus — ≈ cores at 7.5M bags, and 64 beating 16 by 1.4× at 30M
    * bags. Size it ≈ max(cores, bags / 500k), but no higher than
    * throughput requires: every extra partition is one more
    * asynchronously averaged model replica (MLlib's accuracy caveat).
    */
  final case class W2VConfig(
      windowSize: Int = 10,
      numPartitions: Int = 16,
      maxIter: Int = 3,
      minCount: Int = 1,
      stepSize: Double = 0.02,
      vectorSize: Int = 100,
      seed: Long = 42L)

  /** Training set: per publication, one term-bag per section rank (the
    * distinct keywordIds of that rank's sections) plus the flattened
    * overall bag (reference filterMatches + regroupMatches,
    * Embedding.scala:13–67).
    *
    * The reference computes the per-rank key sets with a window +
    * dropDuplicates and collects rank lists in physical order; here both
    * levels are plain aggregations with explicit sort keys — same bags,
    * deterministic order, two map-side-combinable shuffles. The inner join
    * with the rank table silently drops unranked sections — that is the
    * reference's semantics for embedding (J7, vs the lenient J6 of the
    * literature index).
    */
  def trainingSet(matches: DataFrame, spark: SparkSession,
      ranks: Seq[SectionRank] = SectionRanks.default): DataFrame = {
    val rankTable = broadcast(SectionRanks.table(spark, ranks))
    val types = Seq("DS", "GP", "CD")
    val perRank = matches
      .filter(col("isMapped") === true && col("type").isInCollection(types))
      .join(rankTable, Seq("section"))
      .groupBy(col("pmid"), col("rank"))
      .agg(sort_array(collect_set(col("keywordId"))).as("keys"))

    perRank
      .groupBy(col("pmid"))
      .agg(transform(
        array_sort(collect_list(struct(col("rank"), col("keys")))),
        s => s.getField("keys")).as("keys"))
      .withColumn("overall", flatten(col("keys")))
      .withColumn("all", concat(col("keys"), array(col("overall"))))
      .select(col("pmid"), explode(col("all")).as("terms"))
  }

  /** Fit the skip-gram model over the term bags (reference
    * makeWord2VecModel, spark/Helpers.scala:60–80). MLlib's Word2Vec is
    * the one deliberate departure from pure SQL execution — its
    * driver-coordinated iterative trainer is the established distributed
    * implementation and matches the reference exactly.
    */
  def fit(training: DataFrame, config: W2VConfig = W2VConfig()): Word2VecModel =
    new Word2Vec()
      .setWindowSize(config.windowSize)
      .setNumPartitions(config.numPartitions)
      .setMaxIter(config.maxIter)
      .setMinCount(config.minCount)
      .setStepSize(config.stepSize)
      .setVectorSize(config.vectorSize)
      .setSeed(config.seed)
      .setInputCol("terms")
      .setOutputCol("synonyms")
      .fit(training)

  /** trainingSet → model in one call (reference generateModel,
    * Embedding.scala:69–79).
    */
  def generateModel(matches: DataFrame, spark: SparkSession,
      config: W2VConfig = W2VConfig(),
      ranks: Seq[SectionRank] = SectionRanks.default): Word2VecModel =
    fit(trainingSet(matches, spark, ranks), config)

  /** SHARD-AND-AVERAGE skip-gram — the candidate break of the MLlib fit
    * ceiling (the fit is 40%+ of the 10M pipeline): split the bags into
    * `shards` deterministic pmid-hash shards, fit an INDEPENDENT model
    * per shard from the same seed, and average each word's vectors
    * across the shards that saw it (unweighted; hash sharding balances
    * shard sizes). This is MLlib's own async replica-averaging taken to
    * its extreme — replicas sync once at the END instead of every
    * iteration — so it trades synonym quality for fit isolation; the
    * W2VProbe A/B measures both sides (wall AND top-k synonym
    * agreement vs the single fit), and SCALE.md records the verdict.
    *
    * `shards = 1` is exactly [[fit]] (degenerate case, spec-locked).
    * Caveat: `minCount` applies PER SHARD — a word at the threshold can
    * fall below it in every shard and vanish; keep minCount at the
    * reference's 1 when sharding.
    *
    * Returns the averaged vector table in `model.getVectors`' exact
    * shape — (word, vector ml.linalg.Vector) — so [[Vectors.compute]]
    * and Evidence consume it unchanged. The averaging is one
    * vocab-bounded aggregation (vocab × dim × shards rows), never
    * corpus-shaped.
    */
  def fitSharded(training: DataFrame, config: W2VConfig = W2VConfig(),
      shards: Int = 2): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    if (shards == 1) return fit(training, config).getVectors
    val tagged = training
      .withColumn("_shard", pmod(xxhash64(col("pmid")), lit(shards)))
    // one pass to find the nonempty shards: MLlib refuses an empty
    // vocabulary, and tiny corpora can leave a hash shard empty
    // (callers should persist `training`; each shard fit scans it)
    val present = tagged.groupBy(col("_shard")).count()
      .collect().map(_.getLong(0)).toSet
    val perShard = (0 until shards).filter(s => present(s.toLong)).map { s =>
      fit(tagged.filter(col("_shard") === s).drop("_shard"), config)
        .getVectors
        .select(col("word"),
          org.apache.spark.ml.functions.vector_to_array(col("vector")).as("v"))
    }
    require(perShard.nonEmpty, "fitSharded: training set is empty")
    perShard.reduce(_ unionByName _)
      .select(col("word"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("word"), col("pos"))
      .agg(avg(col("x")).as("x"))
      .groupBy(col("word"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("x")))),
        s => s.getField("x")).as("arr"))
      .select(col("word"),
        org.apache.spark.ml.functions.array_to_vector(col("arr")).as("vector"))
  }
}
