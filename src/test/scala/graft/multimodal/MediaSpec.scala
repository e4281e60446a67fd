package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.multimodal.Media.StubDecoder

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .limit(50)
    .cache()

  "payloads" should "produce binary payloads with typed metadata" in {
    val p = Media.payloads(docs)
    p.schema("payload").dataType.typeName shouldBe "binary"
    p.select("media_type").distinct().as[String].collect().toSet shouldBe
      Set("image/png", "audio/wav", "video/mp4")
  }

  "extractFeatures" should "decode per partition with exact stub values" in {
    val rows = Media.payloads(docs).as[MediaRow].repartition(3)
    val feats = Media.extractFeatures(rows, StubDecoder, spark).cache()

    feats.count() shouldBe docs.count()
    // features match a driver-side decode of the same payload
    val sample = rows.orderBy("doc_id").head()
    val got = feats.filter(col("doc_id") === sample.doc_id).head()
    val (w, h, feat) = StubDecoder.decode(sample.media_type, sample.payload)
    got.n_bytes shouldBe sample.payload.length
    got.width shouldBe w
    got.height shouldBe h
    got.feature.toSeq shouldBe feat.toSeq
    // feature schema: 4-dim float vector
    all(feats.select(org.apache.spark.sql.functions.size(col("feature")))
      .as[Int].collect().toSeq) shouldBe 4
  }

  "sampleFrames" should "emit deterministic stride-sampled frame hashes" in {
    val frames = Media.sampleFrames(Media.payloads(docs)).cache()
    // every doc yields >= 1 frame; frame numbering starts at 0
    frames.groupBy("doc_id").count().filter(col("count") < 1).count() shouldBe 0
    frames.agg(min("frame_no")).as[Int].head() shouldBe 0
    // deterministic: same input → same hashes
    val again = Media.sampleFrames(Media.payloads(docs))
    frames.exceptAll(again).count() shouldBe 0
  }
}
