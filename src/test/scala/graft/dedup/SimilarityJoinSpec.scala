package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  behavior of "prefixJaccardPairs"

  private val docs = Seq(
    (1L, "a b c d"),        // J(1,2) = 3/5 = 0.6
    (2L, "a b c e"),
    (3L, "a b x y z"),      // J(1,3) = 2/7 < 0.5
    (4L, "d c b a"),        // J(1,4) = 1.0 (set-equal, different order)
    (5L, "q r s t u v"),    // disjoint from the rest
    (6L, "a b c d e f g h") // J(1,6) = 4/8 = 0.5 exactly — boundary kept
  ).toDF("doc_id", "text")

  private def naive(minJ: Double): Set[(Long, Long)] = {
    val sets = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").toSet }
    (for {
      (i, si) <- sets; (j, sj) <- sets if i < j
      jac = (si & sj).size.toDouble / (si | sj).size
      if jac >= minJ
    } yield (i, j)).toSet
  }

  it should "equal the naive all-pairs join at threshold 0.5, including the exact-boundary pair" in {
    val got = SimilarityJoin.prefixJaccardPairs(docs, 0.5)
      .select($"doc1", $"doc2").as[(Long, Long)].collect().toSet
    got shouldBe naive(0.5)
    got should contain((1L, 6L)) // jaccard exactly at the threshold
    got should contain((1L, 4L)) // order-insensitive set equality
  }

  it should "equal the naive join at threshold 0.75 too" in {
    SimilarityJoin.prefixJaccardPairs(docs, 0.75)
      .select($"doc1", $"doc2").as[(Long, Long)].collect().toSet shouldBe naive(0.75)
  }

  it should "report each pair once with the exact jaccard value" in {
    val rows = SimilarityJoin.prefixJaccardPairs(docs, 0.5)
      .as[(Long, Long, Double)].collect()
    rows.map(r => (r._1, r._2)).distinct.length shouldBe rows.length
    rows.find(r => r._1 == 1L && r._2 == 2L).get._3 shouldBe 0.6 +- 1e-12
  }

  it should "explode only prefixes: a stop word shared by everything generates no candidates among docs with rarer tokens" in {
    // every doc contains "the"; each also has 3 unique tokens, so at
    // t = 0.5 the prefix is the 3 RAREST tokens and "the" (the most
    // frequent, hence last in rare-first order) never enters the join:
    // no candidates are generated at all
    val stop = (1L to 20L).map(i => (i, s"the u${i}a u${i}b u${i}c")).toDF("doc_id", "text")
    SimilarityJoin.prefixJaccardPairs(stop, 0.5).count() shouldBe 0L
  }

  it should "handle empty and whitespace-only docs by excluding them" in {
    val withEmpty = docs.union(Seq((7L, ""), (8L, " ")).toDF("doc_id", "text"))
    SimilarityJoin.prefixJaccardPairs(withEmpty, 0.5)
      .filter($"doc1" >= 7L || $"doc2" >= 7L).count() shouldBe 0L
  }

  behavior of "editDistancePairs"

  private val names = Seq(
    (1L, "kitten"), (2L, "sitten"), // substitution → 1
    (3L, "kitte"),                  // deletion vs 1 → 1
    (4L, "kittens"),                // insertion vs 1 → 1
    (5L, "sitting"),                // 2 from kitten — excluded
    (6L, "kitten")                  // equal to 1 → 0
  ).toDF("id", "name")

  it should "find exactly the distance ≤ 1 pairs, with distances" in {
    val got = SimilarityJoin.editDistancePairs(names, "name", "id")
      .as[(Long, Long, Int)].collect().toSet
    val naive = (for {
      (i, si) <- names.as[(Long, String)].collect()
      (j, sj) <- names.as[(Long, String)].collect() if i < j
      d = levenshteinRef(si, sj) if d <= 1
    } yield (i, j, d)).toSet
    got shouldBe naive
    got should contain((1L, 2L, 1))
    got should contain((1L, 6L, 0))
    got.exists(p => p._1 == 1L && p._2 == 5L) shouldBe false
  }

  it should "verify candidates exactly: a transposed pair shares deletion keys but fails the filter" in {
    // "ab" and "ba" share deletion keys {a, b} (so blocking surfaces
    // them) yet their distance is 2 — the exact verify must reject
    val tr = Seq((1L, "ab"), (2L, "ba")).toDF("id", "name")
    SimilarityJoin.editDistancePairs(tr, "name", "id").count() shouldBe 0L
  }

  it should "ignore empty strings rather than exploding a degenerate sequence" in {
    val withEmpty = names.union(Seq((7L, "")).toDF("id", "name"))
    SimilarityJoin.editDistancePairs(withEmpty, "name", "id")
      .filter($"id1" === 7L || $"id2" === 7L).count() shouldBe 0L
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
