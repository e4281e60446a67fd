package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, Sampling}
import graft.text.TextAnalysis

/** The end-to-end training-corpus cleaning pipeline, composed entirely
  * from the library's oracle-checked operators — the C4-style chain a
  * 100 TB pretraining ingest runs:
  *
  *   language filter → quality gate → exact-dup canonicalization →
  *   near-dup cluster-loser removal → deterministic train/val/test split
  *
  * Stage shapes at scale: language/quality are map-side codegen'd
  * expressions (no shuffle); exact canonical shuffles 32-char hashes;
  * near-dup removal runs the capped-shingle inverted index + min-label
  * propagation at candidate scale; the split is a pure id-hash function.
  * Nothing in the chain materializes N² pairs or collects to the driver.
  */
object CorpusClean {

  /** Train/test decontamination report: near-dup pairs that straddle a
    * split boundary — the leakage a hash split cannot see (near-dups
    * hash independently) and an eval-integrity pipeline must remove.
    * Returns (doc1, split1, doc2, split2, jaccard) for pairs whose
    * members landed in different splits; cost is the capped-shingle
    * candidate join plus two broadcast-size label attaches.
    */
  def splitLeakage(docs: DataFrame, minJaccard: Double = 0.5,
      maxShingleDf: Int = 1000, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val labels = Sampling.hashSplit(docs, "doc_id", trainPct, valPct)
      .select(col("doc_id"), col("split"))
    Dedup.jaccardPairs(docs, minJaccard, maxShingleDf)
      .join(labels.select(col("doc_id").as("doc1"), col("split").as("split1")), "doc1")
      .join(labels.select(col("doc_id").as("doc2"), col("split").as("split2")), "doc2")
      .filter(col("split1") =!= col("split2"))
      .select(col("doc1"), col("split1"), col("doc2"), col("split2"), col("jaccard"))
  }

  def apply(docs: DataFrame, minQuality: Double = 0.3, minJaccard: Double = 0.5,
      maxShingleDf: Int = 1000, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val scored = docs
      .select(col("doc_id"), col("text"),
        TextAnalysis.langId(col("text")).as("pl"),
        TextAnalysis.wordCount(col("text")).as("nw"),
        TextAnalysis.punctCount(col("text")).as("np"),
        length(col("text")).as("nc"))
      .filter(col("pl") === "en" && col("nw") > 0)
      .filter(TextAnalysis.qualityScore(col("nw"), col("np"), col("nc")) >= minQuality)
      .select(col("doc_id"))
    val exactCanon = docs
      .groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val nearDupLosers = Dedup
      .clusters(Dedup.jaccardPairs(docs, minJaccard, maxShingleDf))
      .filter(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id"))
    Sampling.hashSplit(
      scored
        .join(exactCanon, "doc_id")
        .join(nearDupLosers, Seq("doc_id"), "left_anti"),
      "doc_id", trainPct, valPct)
  }
}
