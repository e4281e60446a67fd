package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-level key-fidelity check for the grounding tokenizer chain
  * (reference Grounding.scala:45–108 semantics). The golden-pair specs
  * lock individual rules; this spec locks the aggregate behavior over
  * thousands of realistic entity labels: every surface-form variant of an
  * entity (reordering, stop-word injection, Greek spelling, hyphenation,
  * punctuation) must collapse to the SAME LT key, and distinct entities
  * must never collide — the property the grounding joins silently depend
  * on (SURVEY §7 risk #1).
  */
class TextFidelitySpec extends SparkSpec {
  import spark.implicits._

  // biomedical-ish vocabulary with pairwise-distinct Porter stems
  private val words = Vector(
    "tumor", "necrosis", "factor", "kinase", "receptor", "protein", "synuclein",
    "amyloid", "insulin", "growth", "channel", "domain", "subunit", "ligand",
    "antagonist", "agonist", "inhibitor", "activator", "transporter", "enzyme",
    "mutation", "deletion", "syndrome", "disease", "cancer", "carcinoma",
    "lymphoma", "anemia", "asthma", "diabetes", "arthritis", "dermatitis",
    "hepatitis", "nephritis", "colitis", "sclerosis", "fibrosis", "melanoma",
    "glioma", "sarcoma")

  "LT keys" should "collapse every realistic surface-form variant, with zero cross-entity collisions" in {
    val rnd = new scala.util.Random(42)
    val nEntities = 3000
    val rows = (0 until nEntities).flatMap { i =>
      val k = 2 + rnd.nextInt(3)
      val toks = Vector.fill(k)(words(rnd.nextInt(words.size))) :+ s"sym$i"
      val base = toks.mkString(" ")
      val shuffled = rnd.shuffle(toks).mkString(" ")
      val stopped = (Vector(toks.head, "of", "the") ++ toks.tail).mkString(" ")
      val hyphen = (s"${toks(0)}-${toks(1)}" +: toks.drop(2)).mkString(" ")
      val punct = s"${toks.head}, ${toks.tail.mkString(" ")};"
      Seq((i, "base", base), (i, "shuffled", shuffled), (i, "stopped", stopped),
        (i, "hyphen", hyphen), (i, "punct", punct))
    }
    val keyed = rows.toDF("entity", "variant", "label")
      .withColumn("lt", TextNormalize.ltKey(col("label")))
      .withColumn("tt", TextNormalize.ttKey(col("label")))
      .cache()

    // every variant of an entity lands on one LT key
    keyed.groupBy("entity").agg(countDistinct("lt").as("n"))
      .filter(col("n") =!= 1).count() shouldBe 0
    // distinct entities never collide (sym$i makes labels unique)
    keyed.select("lt").distinct().count() shouldBe nEntities.toLong

    // TT stays order-sensitive: a reorder that changed token order
    // changes TT even though LT is identical
    val ttDiff = keyed.filter(col("variant").isin("base", "shuffled"))
      .groupBy("entity").agg(countDistinct("tt").as("n"), countDistinct("lt").as("nlt"))
    ttDiff.filter(col("nlt") =!= 1).count() shouldBe 0
    ttDiff.filter(col("n") === 2).count() should be > (nEntities / 2).toLong

    // hyphenation is invisible to TT (dash stripped inside the token) and
    // to LT (dash is a split char) alike
    val hyphenTT = keyed.filter(col("variant").isin("base", "hyphen"))
      .groupBy("entity").agg(countDistinct("tt").as("n"))
    hyphenTT.filter(col("n") =!= 1).count() shouldBe 0
  }

  it should "match the hand-derived reference semantics on the sharp edges" in {
    val df = Seq(
      "α-synuclein",     // Greek → latin BEFORE tokenize; then 'a' is a stop word
      "a synuclein",     // bare latin spelling, same stop-word drop
      "synuclein",
      "AS inhibitor",    // all-caps AS is NOT the stop word As/as → survives
      "as inhibitor",    // lowercase as IS a stop word → dropped
      "TNF-α",
      "TNFα",
      "kinases activated",
      "kinase activation" // stems collide: kinas + activ
    ).toDF("label")
      .select(col("label"), TextNormalize.ltKey(col("label")).as("lt"),
        TextNormalize.ttKey(col("label")).as("tt"))
    val m = df.collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap

    m("α-synuclein")._1 shouldBe m("synuclein")._1
    m("a synuclein")._1 shouldBe m("synuclein")._1
    // TT keeps the transliterated alpha glued to the token
    m("TNF-α")._2 shouldBe "tnfa"
    m("TNFα")._2 shouldBe "tnfa"
    // case-sensitive stop-word removal separates the gene symbol from the
    // conjunction
    m("AS inhibitor")._1 should not be m("as inhibitor")._1
    m("as inhibitor")._1 shouldBe "inhibitor"
    // stemming folds inflection variants onto one key
    m("kinases activated")._1 shouldBe m("kinase activation")._1
  }
}
