package graft

import org.apache.spark.sql.SparkSession
import graft.core.Sessions
import graft.etl.Embedding

/** Isolated Word2Vec fit-time probe: answers the one scale question
  * EtlBench's end-to-end numbers can't — how the MLlib skip-gram fit
  * (the pipeline's long pole at 10M docs, 53% of wall) responds to
  * `numPartitions` at a fixed corpus, and so whether that knob should
  * scale with corpus size.
  *
  * The grounded-match stream is generated directly in EtlBench's shape
  * (3 sections × 2 mapped matches per doc, entity ids cycling over E
  * targets + E diseases) so `Embedding.trainingSet` produces the same
  * bags the pipeline would — without paying the 200 s grounding stage
  * per sweep point. The training set is built and persisted ONCE per
  * JVM; only the fit is swept, so points differ in nothing but
  * `numPartitions`.
  *
  * Env: GRAFT_W2V_DOCS (default 2,500,000), GRAFT_W2V_ENTITIES
  * (default docs/250 — EtlBench's 10M/40k ratio), GRAFT_W2V_PARTS
  * (comma list, default "8,16,32"), SPARK_GRAFT_CPUS. Prints one JSON
  * line: {docs, entities, vocab, bags, parts:{"8":sec,…}}.
  */
object W2VProbe {

  /** Grounded matches in the shape Embedding.trainingSet consumes:
    * columns (pmid, section, type, keywordId, isMapped). Six rows per
    * doc — (Title|Abstract|Results) × (GP, DS) — with entity indices
    * mixed by (doc, slot) exactly like EtlBench.corpus's sentences.
    */
  def matches(spark: SparkSession, docs: Long, entities: Long) =
    spark.range(docs * 6).selectExpr(
      "cast(id div 6 + 1 as string) as pmid",
      "element_at(array('title','abstract','results'), cast(id % 6 div 2 as int) + 1) as section",
      "if(id % 2 = 0, 'GP', 'DS') as type",
      s"""if(id % 2 = 0,
         |  concat('ENSG', lpad(cast(((id div 6) * 13 + id % 6) % $entities as string), 9, '0')),
         |  concat('EFO_', lpad(cast(((id div 6) * 7 + id % 6) % $entities as string), 7, '0'))
         |) as keywordId""".stripMargin,
      "true as isMapped")

  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("GRAFT_W2V_DOCS", "2500000").toLong
    val entities = sys.env.getOrElse("GRAFT_W2V_ENTITIES", (docs / 250).toString).toLong
    val parts = sys.env.getOrElse("GRAFT_W2V_PARTS", "8,16,32")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors()).toString).toInt
    val spark = Sessions.builder("graft-w2v-probe", Some(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val training = Embedding.trainingSet(matches(spark, docs, entities), spark).persist()
    val bags = training.count()
    // the vocab each fit will broadcast per iteration: distinct terms
    val vocab = training.selectExpr("explode(terms) as term")
      .selectExpr("count(distinct term) as v").head().getLong(0)

    var firstModel: Option[org.apache.spark.ml.feature.Word2VecModel] = None
    var lastModel: Option[org.apache.spark.ml.feature.Word2VecModel] = None
    val timings = parts.map { p =>
      val t0 = System.nanoTime()
      // vectorSize 32 matches EtlBench so the curves are comparable
      lastModel = Some(Embedding.fit(training,
        Embedding.W2VConfig(vectorSize = 32, numPartitions = p)))
      if (firstModel.isEmpty) firstModel = lastModel
      p -> (System.nanoTime() - t0) / 1e9
    }

    // GRAFT_W2V_SHARDS (comma list): A/B the shard-and-average fit
    // against the sweep's LAST single fit — wall AND synonym quality
    // (mean top-10 cosine-neighbor overlap over 20 probe entities; the
    // quality side is what decides whether an end-only model average
    // preserves the structure MLlib's per-iteration averaging builds).
    // GRAFT_W2V_SHARD_PARTS sizes each shard's fit (default cores —
    // the curve's optimum once shards carry <= 500k-bag partitions).
    val shardSpecs = sys.env.get("GRAFT_W2V_SHARDS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Nil)
    val shardedJson = if (shardSpecs.isEmpty) "{}" else {
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.ml.functions.vector_to_array
      import org.apache.spark.sql.functions._
      val probeWords = (0 until 20).map(i => f"ENSG$i%09d")
      def topK(vectors: DataFrame, k: Int): Map[String, Set[String]] = {
        val v = vectors.select(col("word"), vector_to_array(col("vector")).as("e"))
        val q = v.filter(col("word").isin(probeWords: _*))
          .select(col("word").as("qw"), col("e").as("qe"))
        val w = Window.partitionBy(col("qw")).orderBy(col("s").desc, col("word"))
        v.crossJoin(broadcast(q)).filter(col("word") =!= col("qw"))
          .select(col("qw"), col("word"),
            graft.functions.VectorOps.cosine(col("e"), col("qe")).as("s"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
          .select("qw", "word").collect()
          .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
      }
      val refTop = topK(lastModel.get.getVectors, 10)
      // noise floor: two SINGLE fits (the sweep's first and last — same
      // seed, different replica layouts) disagree too; sharded agreement
      // should be read against this, not against 1.0
      val selfAgree =
        if (parts.size < 2) -1.0
        else {
          val t = topK(firstModel.get.getVectors, 10)
          val a = probeWords.map(w =>
            refTop.getOrElse(w, Set.empty).intersect(t.getOrElse(w, Set.empty)).size / 10.0)
          a.sum / a.size
        }
      System.err.println(s"[w2v-probe] single-vs-single top-10 agreement floor: $selfAgree")
      val shardParts = sys.env.getOrElse("GRAFT_W2V_SHARD_PARTS", cpus.toString).toInt
      shardSpecs.map { s =>
        val t0 = System.nanoTime()
        val avg = Embedding.fitSharded(training,
          Embedding.W2VConfig(vectorSize = 32, numPartitions = shardParts), s)
          .persist()
        avg.count() // the averaging agg is lazy; time it inside the fit wall
        val sec = (System.nanoTime() - t0) / 1e9
        val got = topK(avg, 10)
        avg.unpersist()
        val agree = probeWords.map(w =>
          refTop.getOrElse(w, Set.empty).intersect(got.getOrElse(w, Set.empty)).size / 10.0)
        s""""$s":{"sec":$sec,"agreement":${agree.sum / agree.size},"self_floor":$selfAgree}"""
      }.mkString("{", ",", "}")
    }

    val partsJson = timings.map { case (p, s) => s""""$p":$s""" }.mkString("{", ",", "}")
    println(s"""{"metric":"w2v_fit","unit":"sec","docs":$docs,"entities":$entities,""" +
      s""""vocab":$vocab,"bags":$bags,"vector_size":32,"max_iter":3,"parts":$partsJson,""" +
      s""""sharded":$shardedJson}""")
    spark.stop()
  }
}
