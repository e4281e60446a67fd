package graft.multimodal

import graft.SparkSpec

class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  behavior of "AudioHash.fingerprint"

  it should "set exactly the louder-rightward bits on equal windows" in {
    // 2 bits → 3 windows of 2 samples: energies 3, 7, 5 → bits (1, 0)
    val h = AudioHash.fingerprint(Array(1, 2, 3, 4, 5, 0), gridBits = 2)
    h shouldBe 1L
    // flat signal → no strictly-greater window → 0
    AudioHash.fingerprint(Array.fill(6)(9), gridBits = 2) shouldBe 0L
  }

  it should "compare unequal window lengths by cross-multiplied means" in {
    // 7 samples, 2 bits → boxes [0,2) [2,4) [4,7): sums 2,2,9 cnts 2,2,3
    // bit0: 2*2 > 2*2 false; bit1: 9*2 > 2*3 true → hash 2
    AudioHash.fingerprint(Array(1, 1, 1, 1, 3, 3, 3), gridBits = 2) shouldBe 2L
  }

  it should "be invariant to uniform gain" in {
    val a = Array(10, -20, 30, 5, -8, 90, 4, 4, 17, -3, 6, 2)
    val b = a.map(_ * 3)
    AudioHash.fingerprint(a, 3) shouldBe AudioHash.fingerprint(b, 3)
  }

  behavior of "AudioHash.fingerprintDocs (real WAV decode)"

  it should "fingerprint the PCM fixture to the formula and drop corrupt payloads" in {
    def expected(audioId: Long, delta: Int): Long = {
      def v(i: Int) = ((audioId * 31 + i.toLong * i * 7) % 251 - 125) +
        (if (i == 0) delta else 0)
      val sums = (0 until 65).map(w => (0 until 4).map(j => math.abs(v(w * 4 + j))).sum)
      (0 until 64).foldLeft(0L)((h, w) =>
        if (sums(w + 1) > sums(w)) h | (1L << w) else h)
    }
    val docs = Seq(1L, 2L, 9L, 30L).toDF("doc_id")
    val rows = AudioHash.syntheticPcmWavs(docs, spark, planted = true)
    val got = AudioHash.fingerprintDocs(rows, spark, lenient = true)
      .as[(Long, Long)].collect().toMap
    // 9 is truncated and dropped; 30 plants a perturbed copy at 1000030
    got.keySet shouldBe Set(1L, 2L, 30L, 1000030L)
    got(1L) shouldBe expected(1L, 0)
    got(2L) shouldBe expected(2L, 0)
    got(30L) shouldBe expected(30L, 0)
    got(1000030L) shouldBe expected(30L, 60)
    // the planted copy is a true near-dup: only window 0 changes
    java.lang.Long.bitCount(got(30L) ^ got(1000030L)) should be <= 1
  }
}
