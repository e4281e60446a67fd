package graft

import org.apache.spark.ml.feature.Word2VecModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{Io, Sessions}
import graft.etl._

/** CLI entry for the literature pipeline — the runnable surface a user of
  * the reference switches to (reference Main.scala:8–62: step dispatch
  * over processing/embedding/vectors/evidence/all, configured by
  * Configuration.scala:73–81 + reference.conf with per-release overlays).
  *
  * Usage:
  *   graft.EtlMain <step> [config=run.yaml] key=value...
  * steps: processing | embedding | vectors | evidence | all
  * keys (CLI overrides win over the config file; nested keys dotted):
  *   config=        YAML config file (see EtlConfig — section ranks and
  *                  w2v hyperparameters live here)
  *   epmc= epmcids= targets= diseases= drugs=   (processing inputs,
  *                  equivalently inputs.epmc= …)
  *   out=           (output root, required)
  *   format=        (output format, default parquet)
  *   threshold=     (evidence cosine threshold, default 0.01)
  *   w2v.vectorSize= w2v.windowSize= w2v.maxIter= w2v.minCount=
  *   w2v.stepSize= w2v.numPartitions= w2v.seed=
  * Step-to-step inputs are read from the standard locations under out=.
  */
object EtlMain {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EtlMain <step> [config=file.yaml] key=value...")
    val step = args.head
    val opts = args.tail.map { a =>
      val Array(k, v) = a.split("=", 2); k -> v
    }.toMap
    val cfg = EtlConfig.load(opts.get("config"), opts - "config")
    val spark = Sessions.builder(appName = s"graft-$step").getOrCreate()
    try run(step, cfg, spark)
    finally spark.stop()
  }

  private[graft] def run(step: String, cfg: EtlConfig, spark: SparkSession): Unit = {
    def w(name: String, df: DataFrame): Unit =
      Io.write(df, Io.WriteSpec(cfg.format, s"${cfg.out}/$name", mode = "overwrite"))
    def r(name: String): DataFrame =
      Io.read(spark, Io.ReadSpec(cfg.format, s"${cfg.out}/$name"))

    def processing(): Unit = {
      val epmc = Io.read(spark, Io.ReadSpec("json", cfg.input("epmc")))
      val ids = Io.read(spark,
        Io.ReadSpec("csv", cfg.input("epmcids"), options = Map("header" -> "true")))
      val g = Grounding.compute(
        epmc, ids,
        Io.read(spark, Io.ReadSpec("parquet", cfg.input("targets"))),
        Io.read(spark, Io.ReadSpec("parquet", cfg.input("diseases"))),
        Io.read(spark, Io.ReadSpec("parquet", cfg.input("drugs"))))
      val p = Processing.compute(g, spark, cfg.sectionRanks)
      Seq("matches", "cooccurrences", "failedMatches", "failedCooccurrences",
        "literatureIndex").foreach(n => w(n, p(n)))
    }

    def embedding(): Unit = {
      val matches = r("matches")
      val training = Embedding.trainingSet(matches, spark, cfg.sectionRanks)
      w("trainingSet", training)
      Embedding.fit(training, cfg.w2v).save(s"${cfg.out}/W2VModel")
    }

    def vectors(): Unit =
      w("vectors", Vectors.fromModel(Word2VecModel.load(s"${cfg.out}/W2VModel")))

    def evidence(): Unit =
      w("evidence", Evidence.generate(
        Word2VecModel.load(s"${cfg.out}/W2VModel"), r("matches"), r("cooccurrences"),
        spark, Some(cfg.threshold), cfg.sectionRanks))

    step match {
      case "processing" => processing()
      case "embedding"  => embedding()
      case "vectors"    => vectors()
      case "evidence"   => evidence()
      case "all"        => processing(); embedding(); vectors(); evidence()
      case other        => sys.error(s"unknown step '$other' " +
        "(expected processing|embedding|vectors|evidence|all)")
    }
  }
}
