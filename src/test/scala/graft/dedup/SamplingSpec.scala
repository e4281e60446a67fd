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

  "stratifiedSample" should "keep strata at their rates and drop unlisted strata" in {
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.25)).cache()
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    byLang("en") shouldBe 1000L                       // rate 1.0 keeps all
    byLang("de").toDouble shouldBe 250.0 +- 80.0      // rate 0.25
    Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.5))
      .filter(col("lang") === "de").count() shouldBe 0
  }
}
