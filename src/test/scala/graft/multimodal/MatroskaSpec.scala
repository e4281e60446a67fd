package graft.multimodal

import graft.SparkSpec

class MatroskaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .limit(60)
    .cache()

  "syntheticMkvs + extractMkvMeta" should "round-trip the planted metadata" in {
    val rows = Matroska.syntheticMkvs(docs, spark).as[MediaRow].repartition(3)
    val metas = Matroska.extractMkvMeta(rows, spark, lenient = true)
      .collect().map(m => m.doc_id -> m).toMap

    // every 9th payload is truncated and must be DROPPED in lenient mode
    val ids = docs.select("doc_id").as[Long].collect()
    metas.keySet shouldBe ids.filter(_ % 9 != 0).toSet

    ids.filter(_ % 9 != 0).foreach { id =>
      val m = metas(id)
      m.duration_ms shouldBe 250L * (1 + id % 8) * (1 + id % 4)
      m.timescale_ns shouldBe 1000000L * (1 + id % 4)
      m.n_tracks shouldBe (1 + id % 3).toInt
      m.width shouldBe 8 * (1 + id % 7).toInt
      m.height shouldBe 8 * (1 + id % 5).toInt
      m.codec shouldBe Seq("V_VP9", "V_MPEG4/ISO/AVC", "V_AV1")((id % 3).toInt)
    }
  }

  it should "parse the unknown-size Segment form" in {
    // ids ≡ 0 (mod 5) write the Segment with an all-ones size VINT
    val id = 10L // 10 % 5 == 0, 10 % 9 != 0
    val rows = Seq(id).toDF("doc_id")
    val m = Matroska.extractMkvMeta(
      Matroska.syntheticMkvs(rows, spark).as[MediaRow], spark).head()
    m.duration_ms shouldBe 250L * (1 + id % 8) * (1 + id % 4)
    m.n_tracks shouldBe (1 + id % 3).toInt
  }

  it should "throw on malformed payloads in strict mode" in {
    val bad = Seq(MediaRow(7L, "video/x-matroska", Array[Byte](1, 2, 3))).toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      Matroska.extractMkvMeta(bad, spark).collect()
    }
    ex.getMessage should include("doc 7")
  }

  it should "default TimestampScale to 1ms when Info omits it" in {
    // hand-built: EBML header + Segment(Info(Duration=4 units only))
    // 4-byte float this time — the parser accepts both widths
    def el(id: Array[Byte], body: Array[Byte]): Array[Byte] =
      id ++ Array((0x80 | body.length).toByte) ++ body
    val ebml = el(Array(0x1A.toByte, 0x45.toByte, 0xDF.toByte, 0xA3.toByte),
      Array.empty[Byte])
    val dur = el(Array(0x44.toByte, 0x89.toByte), {
      val bits = java.lang.Float.floatToIntBits(4.0f)
      Array.tabulate(4)(i => ((bits >> (8 * (3 - i))) & 0xff).toByte)
    })
    val info = el(Array(0x15.toByte, 0x49.toByte, 0xA9.toByte, 0x66.toByte), dur)
    val seg = el(Array(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte), info)
    val m = Matroska.extractMkvMeta(
      Seq(MediaRow(1L, "video/x-matroska", ebml ++ seg)).toDS(), spark).head()
    m.timescale_ns shouldBe 1000000L
    m.duration_ms shouldBe 4L // 4 units x 1e6 ns / 1e6
    m.n_tracks shouldBe 0
    m.codec shouldBe ""
  }
}
