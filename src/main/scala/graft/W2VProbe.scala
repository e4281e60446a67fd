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

    val timings = parts.map { p =>
      val t0 = System.nanoTime()
      // vectorSize 32 matches EtlBench so the curves are comparable
      Embedding.fit(training, Embedding.W2VConfig(vectorSize = 32, numPartitions = p))
      p -> (System.nanoTime() - t0) / 1e9
    }

    val partsJson = timings.map { case (p, s) => s""""$p":$s""" }.mkString("{", ",", "}")
    println(s"""{"metric":"w2v_fit","unit":"sec","docs":$docs,"entities":$entities,""" +
      s""""vocab":$vocab,"bags":$bags,"vector_size":32,"max_iter":3,"parts":$partsJson}""")
    spark.stop()
  }
}
