package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
    .toDF("doc_id", "lang")

  "hashSplit" should "assign every row exactly once, near the target ratios, deterministically" in {
    val split = Sampling.hashSplit(docs, "doc_id").cache()
    split.count() shouldBe 2000L
    val byLabel = split.groupBy("split").count().as[(String, Long)].collect().toMap
    byLabel.keySet shouldBe Set("train", "val", "test")
    byLabel("train").toDouble shouldBe 1600.0 +- 160.0
    byLabel("val").toDouble shouldBe 200.0 +- 80.0
    // determinism: a second evaluation assigns identical labels
    val again = Sampling.hashSplit(docs, "doc_id")
    split.join(again.withColumnRenamed("split", "split2"), Seq("doc_id", "lang"))
      .filter(col("split") =!= col("split2")).count() shouldBe 0
  }

  "sequencePacks" should "equal the global cumulative sum and never use a corpus-wide window" in {
    val sized = (0L until 1000L).map(i => (i, (i % 37 + 1).toInt)).toDF("doc_id", "n")
    val packs = Sampling.sequencePacks(sized, "doc_id", col("n"), budget = 100L,
      numRanges = 16).cache()

    // oracle: single global exclusive cumsum (what the two-level prefix
    // sum must reproduce exactly)
    val rows = sized.orderBy("doc_id").as[(Long, Int)].collect()
    var acc = 0L
    val expected = rows.map { case (id, n) =>
      val s = acc; acc += n; id -> ((s, s / 100L))
    }.toMap
    packs.select("doc_id", "start", "pack_id").as[(Long, Long, Long)].collect()
      .foreach { case (id, start, pack) => (start, pack) shouldBe expected(id) }

    // packs are contiguous in id order and every pack except the last
    // reaches the budget (boundary docs may straddle)
    packs.count() shouldBe 1000L
    val maxPack = packs.agg(max("pack_id")).as[Long].head()
    maxPack should be > 0L

    // scale shape: the only unpartitioned window runs over the tiny
    // per-range table, never the corpus — the corpus-side window must be
    // partitioned (by rng)
    val plan = packs.queryExecution.optimizedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    windows.nonEmpty shouldBe true
    // every window ordered by doc_id must be partitioned by rng; a
    // doc_id window without a partition key is the corpus-wide funnel
    windows.filter(_.contains("doc_id")).foreach(w => w should include("rng"))
  }

  it should "be invariant to numRanges (a pure performance knob)" in {
    val sized = (0L until 500L).map(i => (i, (i % 13 + 1).toInt)).toDF("doc_id", "n")
    def packMap(nr: Int) =
      Sampling.sequencePacks(sized, "doc_id", col("n"), budget = 64L, numRanges = nr)
        .select("doc_id", "start", "pack_id").as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val base = packMap(64)
    packMap(1) shouldBe base       // whole corpus in one range
    packMap(1000000) shouldBe base // ~one doc per range
  }

  it should "keep the range table bounded for SPARSE ids" in {
    // hashed/snowflake-style ids: a fixed id/width range key would give
    // one range per doc (the corpus-wide window again); span-derived
    // keys stay at <= numRanges regardless of density
    val sparse = (0L until 400L).map(i => (i * 2654435761L + 12345L, 5))
      .toDF("doc_id", "n")
    val packs = Sampling.sequencePacks(sparse, "doc_id", col("n"),
      budget = 50L, numRanges = 32)
    packs.count() shouldBe 400L
    // same values as the global cumsum in id order
    val inOrder = sparse.orderBy("doc_id").as[(Long, Int)].collect()
    var acc = 0L
    val expected = inOrder.map { case (id, n) =>
      val s = acc; acc += n; id -> ((s, s / 50L))
    }.toMap
    packs.select("doc_id", "start", "pack_id").as[(Long, Long, Long)].collect()
      .foreach { case (id, start, pack) => (start, pack) shouldBe expected(id) }
  }

  it should "emit offset_in_pack = start % budget (the writer seek position)" in {
    val sized = (0L until 300L).map(i => (i, (i % 23 + 1).toInt)).toDF("doc_id", "n")
    val packs = Sampling.sequencePacks(sized, "doc_id", col("n"), budget = 70L, numRanges = 8)
    packs
      .select("start", "pack_id", "offset_in_pack").as[(Long, Long, Long)].collect()
      .foreach { case (start, pack, off) =>
        off shouldBe start % 70L
        start shouldBe pack * 70L + off
      }
    // the budget rides the frame as column metadata — a pack writer
    // reads it instead of re-threading the parameter
    packs.schema("offset_in_pack").metadata.getLong("graft.pack.budget") shouldBe 70L
    packs.schema("pack_id").metadata.getLong("graft.pack.budget") shouldBe 70L
  }

  // Straddle-split spans: sizes i % 91 give ~1/91 zero-token docs and
  // docs up to 90 tokens (> budget 64, so multi-pack straddles occur).
  private lazy val spanSized =
    (0L until 800L).map(i => (i, (i % 91).toInt)).toDF("doc_id", "n")
  private val spanBudget = 64L

  "sequencePackSpans" should "tile every interior pack [0, budget) gap-free" in {
    val spans = Sampling.sequencePackSpans(spanSized, "doc_id", col("n"),
      spanBudget, numRanges = 16)
      .select("pack_id", "offset_in_pack", "take_tokens")
      .as[(Long, Long, Long)].collect()
    val lastPack = spans.map(_._1).max
    lastPack should be > 10L
    spans.groupBy(_._1).foreach { case (pack, ss) =>
      val taking = ss.filter(_._3 > 0).sortBy(_._2)
      // spans are contiguous: each starts where the previous ended
      taking.headOption.foreach(_._2 shouldBe 0L)
      taking.zip(taking.drop(1)).foreach { case ((_, off, take), (_, nextOff, _)) =>
        nextOff shouldBe off + take
      }
      // every interior pack is filled to exactly the budget
      if (pack < lastPack) ss.map(_._3).sum shouldBe spanBudget
    }
  }

  it should "concatenate per doc to the whole document, in order" in {
    val spans = Sampling.sequencePackSpans(spanSized, "doc_id", col("n"),
      spanBudget, numRanges = 16)
      .select("doc_id", "pack_id", "take_tokens", "doc_offset")
      .as[(Long, Long, Long, Long)].collect()
    val sizes = spanSized.as[(Long, Int)].collect().toMap
    spans.groupBy(_._1).foreach { case (doc, ss) =>
      val inOrder = ss.sortBy(_._2) // pack order == doc order
      inOrder.map(_._3).sum shouldBe sizes(doc).toLong
      var off = 0L
      inOrder.foreach { case (_, _, take, docOff) =>
        docOff shouldBe off
        off += take
      }
    }
  }

  it should "give zero-token docs exactly one empty span at their start pack" in {
    val spans = Sampling.sequencePackSpans(spanSized, "doc_id", col("n"),
      spanBudget, numRanges = 16).cache()
    val packs = Sampling.sequencePacks(spanSized, "doc_id", col("n"),
      spanBudget, numRanges = 16)
      .select("doc_id", "pack_id", "offset_in_pack").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val zeroDocs = spanSized.filter(col("n") === 0).as[(Long, Int)].collect().map(_._1)
    zeroDocs.length should be > 0
    val byDoc = spans.select("doc_id", "pack_id", "offset_in_pack", "take_tokens")
      .as[(Long, Long, Long, Long)].collect().groupBy(_._1)
    zeroDocs.foreach { doc =>
      val ss = byDoc(doc)
      ss.length shouldBe 1
      val (_, pack, off, take) = ss.head
      take shouldBe 0L
      (pack, off) shouldBe packs(doc)
    }
  }

  it should "be invariant to numRanges like sequencePacks" in {
    def spanSet(nr: Int) =
      Sampling.sequencePackSpans(spanSized, "doc_id", col("n"), spanBudget, numRanges = nr)
        .select("doc_id", "pack_id", "offset_in_pack", "take_tokens", "doc_offset")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val base = spanSet(16)
    spanSet(1) shouldBe base
    spanSet(1000000) shouldBe base
  }

  "mixtureSample" should "derive per-stratum rates from a token budget and keep clipped strata whole" in {
    // 3 sources, 600 docs each, 10 tokens per doc → 6000 tokens/source
    val mix = (0L until 1800L).map(i => (i, s"src${i % 3}", 10L))
      .toDF("doc_id", "source", "tokens")
    // budget 9000: srcA weight 0.6 → target 5400/6000 = rate 0.9;
    // srcB weight 0.4 → 3600/6000 = 0.6; srcC unlisted → dropped
    val kept = Sampling.mixtureSample(mix, "doc_id", "source", col("tokens"),
      Map("src0" -> 0.6, "src1" -> 0.4), budget = 9000L).cache()
    val bySrc = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    bySrc.keySet shouldBe Set("src0", "src1")
    bySrc("src0").toDouble shouldBe 540.0 +- 60.0
    bySrc("src1").toDouble shouldBe 360.0 +- 60.0
    // a weight whose target exceeds the stratum clips to rate 1 (keep all)
    Sampling.mixtureSample(mix, "doc_id", "source", col("tokens"),
      Map("src2" -> 1.0), budget = 60000L)
      .count() shouldBe 600L
    // deterministic: same inputs → identical keep set
    val again = Sampling.mixtureSample(mix, "doc_id", "source", col("tokens"),
      Map("src0" -> 0.6, "src1" -> 0.4), budget = 9000L)
    kept.select("doc_id").exceptAll(again.select("doc_id")).count() shouldBe 0
  }

  "shuffleOrder" should "rank exactly like the global (md5, id) order, without a corpus window" in {
    val n = 700L
    val df = (0L until n).map(i => (i, s"payload$i")).toDF("doc_id", "payload")
    val ordered = Sampling.shuffleOrder(df, "doc_id", numRanges = 32).cache()

    // positions are a permutation of 0..n-1
    ordered.count() shouldBe n
    ordered.agg(min("position"), max("position")).as[(Long, Long)].head() shouldBe ((0L, n - 1))
    ordered.select("position").distinct().count() shouldBe n

    // driver-side oracle: sort ids by md5 hex of their string form
    def hex(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expected = (0L until n).sortBy(id => (hex(id), id)).zipWithIndex
      .map { case (id, pos) => id -> pos.toLong }.toMap
    ordered.select("doc_id", "position").as[(Long, Long)].collect()
      .foreach { case (id, pos) => pos shouldBe expected(id) }

    // other columns ride along untouched
    ordered.columns.toSet shouldBe Set("doc_id", "payload", "position")

    // scale shape: the only unpartitioned window runs over the tiny
    // per-range count table; every row-level window is partitioned by rng
    val plan = ordered.queryExecution.optimizedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    windows.nonEmpty shouldBe true
    windows.filter(_.contains("_h")).foreach(w => w should include("_rng"))
  }

  it should "be invariant to numRanges" in {
    val df = (0L until 300L).map(i => (i * 7919L + 13L, i)).toDF("doc_id", "v")
    def posMap(nr: Int) =
      Sampling.shuffleOrder(df, "doc_id", numRanges = nr)
        .select("doc_id", "position").as[(Long, Long)].collect().toMap
    val base = posMap(64)
    posMap(1) shouldBe base
    posMap(65536) shouldBe base
  }

  "stratifiedSample" should "keep strata at their rates and drop unlisted strata" in {
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.25)).cache()
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    byLang("en") shouldBe 1000L                       // rate 1.0 keeps all
    byLang("de").toDouble shouldBe 250.0 +- 80.0      // rate 0.25
    Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.5))
      .filter(col("lang") === "de").count() shouldBe 0
  }

  "temperatureSample" should "up-weight low-resource strata relative to proportional sampling" in {
    // 16k 'big' docs vs 1k 'small' docs, 1 token each; budget 4k tokens.
    // sqrt smoothing: w_big = 4/(4+1)·4k/16k = 0.2, w_small = 1/5·4k/1k = 0.8
    val docs = ((0L until 16000L).map(i => (i, "big", 1L)) ++
      (16000L until 17000L).map(i => (i, "small", 1L)))
      .toDF("doc_id", "source", "n")
    val kept = Sampling.temperatureSample(docs, "doc_id", "source", col("n"),
      budget = 4000L).cache()
    val bySrc = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    // small keeps ~80% of its docs, big ~20% — the α=1/2 flattening
    bySrc("small").toDouble shouldBe 800.0 +- 100.0
    bySrc("big").toDouble shouldBe 3200.0 +- 300.0
    // deterministic: identical keep set on rerun
    val again = Sampling.temperatureSample(docs, "doc_id", "source", col("n"),
      budget = 4000L)
    kept.select("doc_id").except(again.select("doc_id")).count() shouldBe 0
  }

  it should "keep every row of a stratum whose derived rate reaches 1" in {
    val docs = ((0L until 100L).map(i => (i, "a", 100L)) ++
      (100L until 200L).map(i => (i, "b", 1L))).toDF("doc_id", "source", "n")
    // budget >> corpus: every rate clamps to 1, nothing is dropped
    Sampling.temperatureSample(docs, "doc_id", "source", col("n"),
      budget = 1000000L).count() shouldBe 200
  }

  "packedShards" should "fill every interior pack exactly and concatenate docs in order" in {
    // doc i has i+1 tokens "d<i>t<j>" — unique everywhere, so shard
    // content proves ordering, not just counts
    val tokDocs = (0L until 50L)
      .map(i => (i, (0L to i).map(j => s"d${i}t$j")))
      .toDF("doc_id", "toks")
    val budget = 64L
    val shards = Sampling.packedShards(tokDocs, "doc_id", col("toks"),
      budget = budget, numRanges = 8).cache()

    val total = (1 to 50).map(_.toLong).sum   // 1275 tokens
    val nPacks = (total + budget - 1) / budget
    shards.count() shouldBe nPacks
    // interior packs hold exactly `budget`; the last holds the remainder
    val sizes = shards.select("pack_id", "n_tokens").as[(Long, Long)].collect().toMap
    (0L until nPacks - 1).foreach(p => sizes(p) shouldBe budget)
    sizes(nPacks - 1) shouldBe total - budget * (nPacks - 1)

    // global concatenation in pack order replays every doc's tokens in
    // doc-id order with no loss at straddle boundaries
    val streamed = shards.orderBy("pack_id")
      .select("tokens").as[Seq[String]].collect().flatten
    val expected = (0L until 50L).flatMap(i => (0L to i).map(j => s"d${i}t$j"))
    streamed shouldBe expected
  }

  it should "drop empty documents from shard content" in {
    val tokDocs = Seq((0L, Seq("a", "b")), (1L, Seq.empty[String]), (2L, Seq("c")))
      .toDF("doc_id", "toks")
    val shards = Sampling.packedShards(tokDocs, "doc_id", col("toks"), budget = 10L)
    shards.count() shouldBe 1
    shards.select("tokens").as[Seq[String]].head() shouldBe Seq("a", "b", "c")
    shards.select("n_spans").as[Long].head() shouldBe 2
  }

  "contrastiveTriples" should "emit one valid negative per pair, deterministically" in {
    val corpus = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (10L, 20L)).toDF("id1", "id2")
    val triples = Sampling.contrastiveTriples(corpus, "doc_id", pairs).cache()
    triples.count() shouldBe 3
    // the negative exists in the corpus and never equals anchor/positive
    triples.as[(Long, Long, Long)].collect().foreach { case (a, p, n) =>
      n should be >= 0L
      n should be < 200L
      n should not be a
      n should not be p
    }
    // pure function of (corpus, pairs): a rerun picks identical negatives
    val again = Sampling.contrastiveTriples(corpus, "doc_id", pairs)
    triples.join(again.withColumnRenamed("negative_id", "n2"),
      Seq("anchor_id", "positive_id"))
      .filter(col("negative_id") =!= col("n2")).count() shouldBe 0
  }

  it should "vary negatives across pairs and drop a pair only when its bucket is exhausted" in {
    val corpus = (0L until 256L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = (0L until 40L).map(i => (i, i + 100L)).toDF("id1", "id2")
    val negs = Sampling.contrastiveTriples(corpus, "doc_id", pairs)
      .select("negative_id").as[Long].collect()
    negs.length shouldBe 40
    // hash-bucket picks must not collapse to one corpus doc
    negs.distinct.length should be > 10
    // two-doc corpus, the pair IS the corpus: the only bucket candidates
    // are excluded, so the pair drops instead of fabricating a negative
    val tiny = Seq((0L, "a"), (1L, "b")).toDF("doc_id", "text")
    Sampling.contrastiveTriples(tiny, "doc_id", Seq((0L, 1L)).toDF("id1", "id2"))
      .count() shouldBe 0
  }

  "weightedSample" should "pick exactly k per stratum, favoring heavy rows" in {
    // 1000 rows over 10 strata; half weight 5, half weight 1 — weight
    // keyed on i/10 so every stratum (i % 10) mixes both weights evenly
    val base = (0L until 1000L)
      .map(i => (i, i % 10, if ((i / 10) % 2 == 0) 5 else 1))
      .toDF("doc_id", "shard", "w")
    val got = Sampling.weightedSample(base, "doc_id", "shard", col("w"), k = 4)
      .as[(Long, Long, Int, String)].collect()
    got.length shouldBe 40
    got.groupBy(_._2).values.foreach(_.length shouldBe 4)
    // E-S property: weight-5 rows should take ~5/6 of the slots; with 40
    // draws the weight-5 share is overwhelmingly above half
    got.count(_._3 == 5) should be > 25
    // deterministic: same input, same selected ids
    Sampling.weightedSample(base, "doc_id", "shard", col("w"), k = 4)
      .select("doc_id").as[Long].collect().toSet shouldBe got.map(_._1).toSet
    // shard-phase invariance: the pre-selection shard count must not
    // change the selection (every global winner wins its shard) — the
    // two-phase claim that makes the funnel removal safe
    Sampling.weightedSample(base, "doc_id", "shard", col("w"), k = 4, shards = 1)
      .select("doc_id").as[Long].collect().toSet shouldBe got.map(_._1).toSet
    Sampling.weightedSample(base, "doc_id", "shard", col("w"), k = 4, shards = 257)
      .select("doc_id").as[Long].collect().toSet shouldBe got.map(_._1).toSet
  }

  it should "never select non-positive-weight rows and reject bad k" in {
    val base = Seq((1L, 0L, 0), (2L, 0L, -3), (3L, 0L, 1)).toDF("doc_id", "shard", "w")
    Sampling.weightedSample(base, "doc_id", "shard", col("w"), k = 3)
      .select("doc_id").as[Long].collect() shouldBe Array(3L)
    an[IllegalArgumentException] should be thrownBy
      Sampling.weightedSample(base, "doc_id", "shard", col("w"), k = 0)
  }

  behavior of "tokenBudgetMixture"

  it should "match the single-window reference and include the crossing doc" in {
    val docs = (0L until 60L).map(i => (i, s"d${i % 3}", 10L + i % 7))
      .toDF("doc_id", "dom", "nt")
    val got = Sampling.tokenBudgetMixture(docs, "doc_id", "dom", col("nt"),
      budgetPerDomain = 50L, numRanges = 16)
      .as[(Long, String, Long, Long)].collect().toSet
    // driver-side reference: one per-domain pass in (md5(id), id) order
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val expected = (0L until 60L).map(i => (i, s"d${i % 3}", 10L + i % 7))
      .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        var cum = 0L
        rows.sortBy(r => (md5hex(r._1.toString), r._1)).flatMap { r =>
          val keep = cum < 50L
          val out = if (keep) Some((r._1, r._2, r._3, cum)) else None
          cum += r._3
          out
        }
      }.toSet
    got shouldBe expected
    // every domain's spend crosses its budget via exactly one final doc
    got.groupBy(_._2).values.foreach { rows =>
      // toSeq before mapping: Set.map would dedupe equal token counts
      val spent = rows.toSeq.map(_._3).sum
      val maxBefore = rows.toSeq.map(_._4).max
      maxBefore should be < 50L
      spent should be >= 50L
    }
  }

  it should "be invariant to range granularity" in {
    val docs = (0L until 40L).map(i => (i, "only", 7L)).toDF("doc_id", "dom", "nt")
    val a = Sampling.tokenBudgetMixture(docs, "doc_id", "dom", col("nt"), 100L, numRanges = 1)
      .as[(Long, String, Long, Long)].collect().toSet
    val b = Sampling.tokenBudgetMixture(docs, "doc_id", "dom", col("nt"), 100L, numRanges = 4096)
      .as[(Long, String, Long, Long)].collect().toSet
    a shouldBe b
  }

  behavior of "epochMixture"

  it should "repeat scarce domains, cap at maxEpochs, and fill the remainder in x49 order" in {
    // d0: 5 docs x 10 tokens = 50 avail, budget 120 -> 2 full epochs +
    //   partial epoch 2 taking rem=20 (first-crossing order by md5)
    // d1: 2 docs x 10 = 20 avail -> fe = min(3, 6) = 3, CAPPED: no partial
    // d2: 20 docs x 10 = 200 avail > budget -> fe = 0, pure x49 at epoch 0
    val docs = ((0L until 5L).map(i => (i, "d0", 10L)) ++
      (10L until 12L).map(i => (i, "d1", 10L)) ++
      (20L until 40L).map(i => (i, "d2", 10L))).toDF("doc_id", "dom", "nt")
    val got = Sampling.epochMixture(docs, "doc_id", "dom", col("nt"),
      budgetPerDomain = 120L, maxEpochs = 3, numRanges = 16)
      .as[(Long, String, Int, Long)].collect().toSeq
    // d0: every doc in epochs 0 and 1
    got.count(r => r._2 == "d0" && r._3 < 2) shouldBe 10
    // d0 partial epoch 2: 20 remaining tokens -> exactly 2 docs (cum 0, 10)
    got.count(r => r._2 == "d0" && r._3 == 2) shouldBe 2
    // d1 capped: all 2 docs exactly 3 times, never epoch 3
    got.count(_._2 == "d1") shouldBe 6
    got.filter(_._2 == "d1").map(_._3).max shouldBe 2
    // d2: epoch 0 only, equals tokenBudgetMixture's kept set
    val x49 = Sampling.tokenBudgetMixture(docs.filter(col("dom") === "d2"),
      "doc_id", "dom", col("nt"), 120L, numRanges = 16)
      .select("doc_id").as[Long].collect().toSet
    got.filter(_._2 == "d2").map(_._3).toSet shouldBe Set(0)
    got.filter(_._2 == "d2").map(_._1).toSet shouldBe x49
    // no (doc, epoch) duplicates anywhere
    got.size shouldBe got.toSet.size
  }

  it should "spend close to the budget: full epochs + remainder crossing" in {
    val docs = (0L until 7L).map(i => (i, "only", 9L)).toDF("doc_id", "dom", "nt")
    // avail 63, budget 150 -> 2 full epochs (126) + partial of rem 24
    val got = Sampling.epochMixture(docs, "doc_id", "dom", col("nt"),
      budgetPerDomain = 150L, maxEpochs = 4, numRanges = 4)
      .as[(Long, String, Int, Long)].collect().toSeq
    val spent = got.map(_._4).sum
    spent should be >= 150L
    // overshoot bounded by one crossing doc
    spent should be < (150L + 9L)
  }
}
