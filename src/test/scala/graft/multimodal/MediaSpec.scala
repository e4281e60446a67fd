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

  "resizePlan" should "preserve aspect ratio and never upscale" in {
    val decoded = Seq(
      (1L, 64, 48),   // downscale, width-bound
      (2L, 10, 20),   // under maxDim both ways: untouched
      (3L, 16, 32))   // exactly at maxDim: untouched
      .toDF("doc_id", "width", "height")
    val planned = Media.resizePlan(decoded, maxDim = 32)
      .select("doc_id", "scale", "out_width", "out_height")
      .as[(Long, Double, Int, Int)].collect().map(r => r._1 -> r).toMap
    planned(1L)._3 shouldBe 32 // 64 * 0.5
    planned(1L)._4 shouldBe 24 // 48 * 0.5 — ratio preserved
    planned(2L)._2 shouldBe 1.0
    planned(2L)._3 shouldBe 10
    planned(3L)._2 shouldBe 1.0
    // no output dimension ever exceeds... (ceil can add at most 1 on
    // non-exact scales; the max side is exact by construction)
    planned.values.foreach { case (_, scale, w, h) =>
      scale should be <= 1.0
      math.max(w, h) should be <= 32
    }
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
