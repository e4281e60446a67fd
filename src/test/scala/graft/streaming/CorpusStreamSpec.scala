package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private def doc(i: Long, seed: Long): (Long, String) =
    (i, (1 to 12).map(w => s"s${seed}w$w").mkString(" "))

  "CorpusStream" should "flag near-dups against a growing index across micro-batches" in {
    val landing = Files.createTempDirectory("graft-corpus-landing").toFile.getAbsolutePath
    // the session is JVM-shared across suites, so the block-manager bound
    // below is asserted as a DELTA over whatever other suites persisted
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size

    // standing corpus: docs 0 and 1
    val corpus = Seq(doc(0L, 0L), doc(1L, 1L)).toDF("doc_id", "text")
    val initialSigs = Dedup.minhashSignatures(corpus)

    // batch A (file 1): doc 10 duplicates corpus doc 0; doc 11 is novel.
    // batch B (file 2): doc 20 duplicates doc 11 — admitted in a PRIOR
    // batch, so only a growing index can flag it; doc 21 is novel.
    Seq(doc(10L, 0L), doc(11L, 5L)).toDF("doc_id", "text")
      .coalesce(1).write.json(s"$landing/f1")
    Seq(doc(20L, 5L), doc(21L, 6L)).toDF("doc_id", "text")
      .coalesce(1).write.json(s"$landing/f2")

    val schema = corpus.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .json(s"$landing/f*")

    var admitted = Vector.empty[Long]
    var flagged = Vector.empty[Long]
    val writer = CorpusStream.admissionWriter(stream, initialSigs, minSim = 0.8,
      out => {
        admitted ++= out.admitted.select("doc_id").as[Long].collect().sorted
        flagged ++= out.flagged.select("doc_id").as[Long].collect().sorted
      })
    val q = CorpusStream.backfill(writer)
    q.awaitTermination(120000)

    flagged.toSet shouldBe Set(10L, 20L) // vs corpus AND vs earlier batch
    admitted.toSet shouldBe Set(11L, 21L)

    // block-manager bound: superseded index generations and per-batch
    // signature checkpoints are unpersisted after each fold, so at most
    // ONE index generation's RDD outlives the drained stream — without
    // the unpersists this 2-batch run retains 5 checkpoints (initial +
    // 2 sigs + 2 folds). Unpersist is async — poll briefly.
    val deadline = System.currentTimeMillis() + 30000
    def persisted: Int = spark.sparkContext.getPersistentRDDs.size
    while (persisted > persistedBefore + 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    persisted should be <= (persistedBefore + 1)

    // storage-level pin: the standing index grows with the admitted
    // corpus and must live SERIALIZED in the block manager (SCALE.md 40M
    // storage-level rule) — a regression to deserialized default only
    // hurts at scale, so it must fail here
    import org.apache.spark.storage.StorageLevel
    val levels = spark.sparkContext.getPersistentRDDs.values
      .map(_.getStorageLevel).toSeq
    levels should contain (StorageLevel.MEMORY_AND_DISK_SER)
  }
}
