package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.etl.Fixtures
import org.apache.spark.sql.functions._

class LiteratureStreamSpec extends SparkSpec {

  "LiteratureStream" should "ground documents incrementally via foreachBatch" in {
    val landing = Files.createTempDirectory("graft-landing").toFile.getAbsolutePath
    // batch-write the fixture corpus as the landing JSON; schema from the
    // static read (streams need explicit schemas)
    val staticDocs = Fixtures.epmc(spark)
    staticDocs.write.mode("overwrite").json(landing)

    val stream = spark.readStream.schema(staticDocs.schema).json(landing)

    var matchTotal = 0L
    var coocTotal = 0L
    var batches = 0
    val writer = LiteratureStream.groundingWriter(
      stream,
      Fixtures.epmcIds(spark),
      Fixtures.targets(spark),
      Fixtures.diseases(spark),
      Fixtures.drugs(spark),
      out => {
        batches += 1
        matchTotal += out.matches.count()
        coocTotal += out.cooccurrences.count()
      })

    val q = LiteratureStream.backfill(writer)
    q.awaitTermination(120000)

    batches should be >= 1
    // same totals as the batch pipeline over the same corpus
    matchTotal shouldBe 9L
    coocTotal shouldBe 2L
  }
}
