package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  "wordKgrams" should "produce overlapping k-grams and empty below k words" in {
    val out = docs((1L, "a b c d"), (2L, "a b"), (3L, ""))
      .select(col("doc_id"),
        TextQuality.wordKgrams(filter(split(col("text"), " "), w => w =!= ""), 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    out(1L) shouldBe Seq("a b c", "b c d")
    out(2L) shouldBe Seq.empty
    out(3L) shouldBe Seq.empty
  }

  "gopherStats" should "compute exact repetition fractions" in {
    val out = TextQuality.gopherStats(docs(
      (1L, "a a a b"),              // top uni 3/4; bigrams: "a a","a a","a b" -> 2/3
      (2L, "x y x y x y x y x y"),  // 10 words; 6 5-grams, 2 distinct -> 4/6
      (3L, "q")))                   // single word: fractions 1, no bigrams
      .select("doc_id", "n_words", "top_unigram_frac", "top_bigram_frac", "dup_5gram_frac")
      .as[(Long, Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    out(1L) shouldBe ((1L, 4L, 3.0 / 4, 2.0 / 3, 0.0))
    out(2L)._2 shouldBe 10L
    out(2L)._3 shouldBe 5.0 / 10
    out(2L)._4 shouldBe 5.0 / 9  // "x y" x5 of 9 bigrams
    out(2L)._5 shouldBe 1.0 - 2.0 / 6
    out(3L) shouldBe ((3L, 1L, 1.0, 0.0, 0.0))
  }

  "gopherQualityGates" should "trip each gate on its own fixture" in {
    val good = ("the cat and the dog have fun with all of that " * 6).trim // 66 words, all alpha, stops
    val out = TextQuality.gopherQualityGates(docs(
      (1L, good),
      (2L, "the of and short"),                       // n_words = 4 < 50
      (3L, good + " " + Seq.fill(20)("### ### ###").mkString(" ")), // symbol ratio over 0.1
      (4L, (1 to 60).map(i => s"- bullet $i the of and line\n").mkString), // all lines bullets
      (5L, good.split(" ").map(w => w + "...").mkString("\n")),     // every line ellipsis-ended
      (6L, good + " " + (1 to 60).map(_.toString).mkString(" ")),   // digits dilute alpha frac
      (7L, Seq.fill(60)("zz qq xx").mkString(" "))),                 // no stop words
      minWords = 50)
      .select("doc_id", "passes").as[(Long, Boolean)].collect().toMap
    out(1L) shouldBe true
    out(2L) shouldBe false
    out(3L) shouldBe false
    out(4L) shouldBe false
    out(5L) shouldBe false
    out(6L) shouldBe false
    out(7L) shouldBe false
  }

  it should "stay map-side (no Exchange)" in {
    val plan = TextQuality.gopherQualityGates(docs((1L, "the of and a b")))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  "winnowedFingerprints" should "hit boundary cases and guarantee shared runs" in {
    val eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    val fps = TextQuality.winnowedFingerprints(docs(
      (1L, "a b c d e f g"),        // 7 words < k: no fingerprints
      (2L, eight),                  // exactly one 8-gram: one fingerprint
      (3L, eight + " w9"),          // 2 grams < window: single global min
      (4L, "z1 z2 " + eight + " z3 z4 z5 z6 z7 z8 z9"), // shares the run
      (5L, eight)))                 // identical to doc 2
      .cache()
    val byDoc = fps.as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    byDoc.get(1L) shouldBe None
    byDoc(2L).size shouldBe 1
    byDoc(3L).size shouldBe 1
    // identical docs produce identical fingerprint sets
    byDoc(5L) shouldBe byDoc(2L)
    // winnowing guarantee: a shared word run of >= k + window - 1 = 11
    // words forces at least one shared fingerprint. Doc 4 embeds doc 2's
    // 8 words inside a longer run — 8 < 11 does NOT guarantee sharing,
    // so assert the guarantee with a full 11-word shared run instead
    val run = "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 r11"
    val shared = TextQuality.winnowedFingerprints(docs(
      (10L, "p1 p2 p3 " + run), (11L, run + " s1 s2 s3 s4")))
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    shared(10L).intersect(shared(11L)) should not be empty
  }

  "overlapPairs" should "find contaminated pairs and honor the DF cap" in {
    val passage = (1 to 20).map(i => s"t$i").mkString(" ")
    val base = docs(
      (1L, "alpha beta " + passage),
      (2L, passage + " gamma delta"),
      (3L, "completely different words " + (21 to 40).map(i => s"u$i").mkString(" ")))
    val fps = TextQuality.winnowedFingerprints(base)
    val pairs = TextQuality.overlapPairs(fps, minShared = 2, maxFpDf = 100)
      .as[(Long, Long, Long)].collect()
    pairs.map(p => (p._1, p._2)) shouldBe Array((1L, 2L))
    pairs.head._3 should be >= 2L

    // a corpus-wide passage is exactly what the DF cap drops: 30 docs
    // sharing one passage produce ZERO pairs at maxFpDf=10
    val hot = docs((1L to 30L).map(i => i -> (s"pre$i " + passage)): _*)
    TextQuality.overlapPairs(
      TextQuality.winnowedFingerprints(hot), minShared = 1, maxFpDf = 10)
      .count() shouldBe 0L

    TextQuality.overlapPairs(fps, minShared = 1000).count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      TextQuality.overlapPairs(fps, minShared = 0)
  }

  "removeBoilerplate" should "strip sentences above the df threshold, exactly" in {
    // "Footer" in docs 1,2,3 (df 3 > 2: hot); "Rare" in 1,2 (df 2 == maxDf:
    // SURVIVES — the boundary); within-doc repeat of a surviving sentence
    // is kept (that's firstOccurrences' job, not this op's)
    val base = docs(
      (1L, "Alpha one. Footer. Rare."),
      (2L, "Beta two. Rare. Beta two. Footer."),
      (3L, "Gamma three! Footer."),
      (4L, "Delta four?"))
    val out = TextQuality.removeBoilerplate(base, maxDf = 2)
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    out(1L)._2 shouldBe 3
    out(1L)._3 shouldBe 2 // "Alpha one", "Rare"
    out(2L)._3 shouldBe 3 // "Beta two", "Rare", "Beta two" (repeat kept)
    out(3L)._3 shouldBe 1
    out(4L)._3 shouldBe 1
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    out(1L)._4 shouldBe md5("Alpha one Rare")
    out(2L)._4 shouldBe md5("Beta two Rare Beta two")

    // a doc whose every sentence is hot keeps nothing but stays a row
    val all = TextQuality.removeBoilerplate(
      docs((1L to 5L).map(i => i -> "Same thing."): _*), maxDf = 2)
      .as[(Long, Int, Int, String)].collect()
    all.length shouldBe 5
    all.foreach { r => r._3 shouldBe 0; r._4 shouldBe md5("") }
  }

  it should "keep the document stream shuffle-free" in {
    // every Exchange in the plan belongs to the hot-set branch (sentence
    // key agg + singleton collapse + its broadcast); the document branch
    // filters arrays map-side. 2 shuffle exchanges total pins that.
    val base = docs((1L, "A. B."), (2L, "B. C."))
    val plan = TextQuality.removeBoilerplate(base, maxDf = 1)
      .queryExecution.executedPlan.toString
    "Exchange (hashpartitioning|SinglePartition)".r.findAllIn(plan).size shouldBe 2
  }

  "ngramNovelty" should "score the unseen-trigram fraction and skip short docs" in {
    val corpus = docs(
      (1L, "a b c d"),   // trigrams: "a b c" (shared with 2), "b c d"
      (2L, "a b c x"),   // trigrams: "a b c", "b c x"
      (3L, "q w e r"),   // both trigrams unique
      (4L, "a b"))       // < 3 words: no trigrams, absent
    val got = TextQuality.ngramNovelty(corpus, n = 3)
      .select("doc_id", "n_shingles", "n_novel", "novelty_ratio")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    got shouldBe Map(
      1L -> ((2L, 1L, 0.5)), 2L -> ((2L, 1L, 0.5)), 3L -> ((2L, 2L, 1.0)))
  }

  it should "count a repeated in-doc trigram once (distinct per doc)" in {
    // "a b c a b c" yields trigrams [a b c, b c a, c a b, a b c] — the
    // repeat collapses in the per-doc distinct, df still reads 1, and
    // novelty stays 1.0 (in-doc repetition is x13's concern, not
    // cross-doc novelty's)
    val corpus = docs((1L, "a b c a b c"))
    TextQuality.ngramNovelty(corpus, n = 3)
      .select("n_shingles", "n_novel").as[(Long, Long)].head() shouldBe ((3L, 3L))
  }
}
