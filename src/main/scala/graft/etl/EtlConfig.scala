package graft.etl

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** File-driven run configuration — the reference's "same jar, different
  * release config" workflow (reference Configuration.scala:73–81 loading
  * reference.conf:1–122 with per-release overlay files under the
  * reference's configurations/2022 directory). The reference reads HOCON
  * via pureconfig;
  * this container ships no HOCON parser, so the file format is YAML
  * (jackson-dataformat-yaml is on Spark's classpath) with identical
  * layering semantics: file values ← CLI `key=value` overrides, nested
  * keys dotted (`w2v.vectorSize=64`), section ranks and Word2Vec
  * hyperparameters overridable without recompiling.
  */
final case class EtlConfig(
    out: String,
    format: String = "parquet",
    inputs: Map[String, String] = Map.empty,
    threshold: Double = 0.01,
    w2v: Embedding.W2VConfig = Embedding.W2VConfig(),
    sectionRanks: Seq[SectionRank] = SectionRanks.default) {

  def input(key: String): String =
    inputs.getOrElse(key, sys.error(s"inputs.$key is required (CLI $key=… or config file)"))
}

object EtlConfig {

  /** Flat CLI keys accepted for backward compatibility with the bare
    * `key=value` invocation — normalized to `inputs.<key>`.
    */
  private val legacyInputKeys = Set("epmc", "epmcids", "targets", "diseases", "drugs")

  /** Layered load: optional YAML file, then CLI overrides on top. */
  def load(path: Option[String], overrides: Map[String, String]): EtlConfig = {
    val (fileKv, fileRanks) = path match {
      case Some(p) => parseYaml(new String(Files.readAllBytes(Paths.get(p)), UTF_8))
      case None    => (Map.empty[String, String], None)
    }
    val normalized = overrides.map { case (k, v) =>
      (if (legacyInputKeys(k)) s"inputs.$k" else k) -> v
    }
    build(fileKv ++ normalized, fileRanks)
  }

  /** YAML → (dotted scalar keys, structured sectionRanks). Kept separate
    * from build() so tests can exercise the parse in isolation.
    */
  private[etl] def parseYaml(text: String): (Map[String, String], Option[Seq[SectionRank]]) = {
    val root = new ObjectMapper(new YAMLFactory()).readTree(text)
    if (root == null || root.isNull) return (Map.empty, None)
    val flat = scala.collection.mutable.LinkedHashMap[String, String]()
    def walk(prefix: String, node: JsonNode): Unit =
      if (node.isObject) {
        node.fieldNames().asScala.foreach { f =>
          walk(if (prefix.isEmpty) f else s"$prefix.$f", node.get(f))
        }
      } else if (node.isValueNode) flat(prefix) = node.asText()
    root.fieldNames().asScala.filterNot(_ == "sectionRanks")
      .foreach(f => walk(f, root.get(f)))
    val ranks = Option(root.get("sectionRanks")).map { arr =>
      arr.elements().asScala.map { n =>
        SectionRank(n.get("section").asText(), n.get("rank").asInt(), n.get("weight").asDouble())
      }.toSeq
    }
    (flat.toMap, ranks)
  }

  private def build(kv: Map[String, String], ranks: Option[Seq[SectionRank]]): EtlConfig = {
    val w2vD = Embedding.W2VConfig()
    def i(k: String, d: Int): Int = kv.get(k).map(_.toInt).getOrElse(d)
    def d(k: String, dv: Double): Double = kv.get(k).map(_.toDouble).getOrElse(dv)
    EtlConfig(
      out = kv.getOrElse("out", sys.error("out is required (out= or config file)")),
      format = kv.getOrElse("format", "parquet"),
      inputs = kv.collect {
        case (key, v) if key.startsWith("inputs.") => key.stripPrefix("inputs.") -> v
      },
      threshold = d("threshold", 0.01),
      w2v = Embedding.W2VConfig(
        windowSize = i("w2v.windowSize", w2vD.windowSize),
        numPartitions = i("w2v.numPartitions", w2vD.numPartitions),
        maxIter = i("w2v.maxIter", w2vD.maxIter),
        minCount = i("w2v.minCount", w2vD.minCount),
        stepSize = d("w2v.stepSize", w2vD.stepSize),
        vectorSize = i("w2v.vectorSize", w2vD.vectorSize),
        seed = kv.get("w2v.seed").map(_.toLong).getOrElse(w2vD.seed)),
      sectionRanks = ranks.getOrElse(SectionRanks.default))
  }
}
