package graft

import org.apache.spark.ml.feature.Word2VecModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{Io, Sessions}
import graft.etl._

/** CLI entry for the literature pipeline — the runnable surface a user of
  * the reference switches to (reference Main.scala:8–62: step dispatch
  * over processing/embedding/vectors/evidence/all).
  *
  * Usage:
  *   graft.EtlMain <step> key=value...
  * steps: processing | embedding | vectors | evidence | all
  * keys:  epmc= epmcids= targets= diseases= drugs=   (processing inputs)
  *        out=           (output root, required)
  *        format=        (output format, default parquet)
  *        threshold=     (evidence cosine threshold, default 0.01)
  * Step-to-step inputs are read from the standard locations under out=.
  */
object EtlMain {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EtlMain <step> key=value...")
    val step = args.head
    val opts = args.tail.map { a =>
      val Array(k, v) = a.split("=", 2); k -> v
    }.toMap
    val out = opts.getOrElse("out", sys.error("out= is required"))
    val fmt = opts.getOrElse("format", "parquet")
    val spark = Sessions.builder(appName = s"graft-$step").getOrCreate()
    try run(step, opts, out, fmt, spark)
    finally spark.stop()
  }

  private[graft] def run(step: String, opts: Map[String, String], out: String,
      fmt: String, spark: SparkSession): Unit = {
    def w(name: String, df: DataFrame): Unit =
      Io.write(df, Io.WriteSpec(fmt, s"$out/$name", mode = "overwrite"))
    def r(name: String): DataFrame =
      Io.read(spark, Io.ReadSpec(fmt, s"$out/$name"))

    def processing(): Unit = {
      val in = (k: String) => opts.getOrElse(k, sys.error(s"$k= is required for processing"))
      val epmc = Io.read(spark, Io.ReadSpec("json", in("epmc")))
      val ids = Io.read(spark, Io.ReadSpec("csv", in("epmcids"), options = Map("header" -> "true")))
      val g = Grounding.compute(
        epmc, ids,
        Io.read(spark, Io.ReadSpec("parquet", in("targets"))),
        Io.read(spark, Io.ReadSpec("parquet", in("diseases"))),
        Io.read(spark, Io.ReadSpec("parquet", in("drugs"))))
      val p = Processing.compute(g, spark)
      Seq("matches", "cooccurrences", "failedMatches", "failedCooccurrences",
        "literatureIndex").foreach(n => w(n, p(n)))
    }

    def embedding(): Unit = {
      val matches = r("matches")
      val training = Embedding.trainingSet(matches, spark)
      w("trainingSet", training)
      Embedding.fit(training).save(s"$out/W2VModel")
    }

    def vectors(): Unit =
      w("vectors", Vectors.fromModel(Word2VecModel.load(s"$out/W2VModel")))

    def evidence(): Unit = {
      val threshold = Some(opts.getOrElse("threshold", "0.01").toDouble)
      w("evidence", Evidence.generate(
        Word2VecModel.load(s"$out/W2VModel"), r("matches"), r("cooccurrences"),
        spark, threshold))
    }

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
