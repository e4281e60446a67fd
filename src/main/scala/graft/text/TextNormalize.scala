package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure-Spark text normalization replacing the reference's spark-nlp
  * pipeline (reference Grounding.scala:45–108: DocumentAssembler →
  * Tokenizer(split - / : , ;) → Tokenizer(split : , ;) → Normalizer
  * (lowercase, strip non-word) → StopWordsCleaner (case-sensitive) →
  * Normalizer → Stemmer → Finisher).
  *
  * Everything except stemming is codegen'd Spark SQL expressions — split /
  * filter / transform / regexp_replace — so the normalization runs inside
  * WholeStageCodegen with no serialization. Stemming goes through one UDF
  * call per token array (PorterStemmer). Tokenization is a simple
  * split-char model rather than spark-nlp's annotator grammar: same
  * capability, deliberately simpler; key semantics (LT/TT, below) are
  * preserved exactly.
  *
  * Two key flavors drive the grounding joins (reference
  * Grounding.scala:33–34, 367–387):
  *  - LT ("label terms"): split on whitespace and - / : , ; → drop stop
  *    words (case-sensitive) → lowercase + strip non-alphanumerics → stem →
  *    dedup → sort → concat. Order-insensitive: synonym phrasing variants
  *    collide to the same key.
  *  - TT ("token terms"): split on whitespace and : , ; (dashes/slashes
  *    kept inside tokens) → lowercase + strip non-alphanumerics → concat in
  *    order. Order-sensitive: for gene symbols and chemical codes where
  *    token order is meaning-bearing.
  */
object TextNormalize {

  val LabelKeyType = "LT"
  val TokenKeyType = "TT"

  /** Google stop word list (public:
    * https://meta.wikimedia.org/wiki/Stop_word_list/google_stop_word_list),
    * as used by the reference (Grounding.scala:19–31) — matched
    * case-sensitively against raw tokens, so the capitalized variants and
    * the bare "a"/"i" are included explicitly.
    */
  val stopWords: Seq[String] = {
    val base = (
      "about above after again against all am an and any are aren't as at be because " +
        "been before being below between both but by can't cannot could couldn't did didn't do does doesn't doing don't down " +
        "during each few for from further had hadn't has hasn't have haven't having he he'd he'll he's her here here's hers " +
        "herself him himself his how how's i'd i'll i'm i've if in into is isn't it it's its itself let's me more most mustn't " +
        "my myself no nor not of off on once only or other ought our ours ourselves out over own same shan't she she'd she'll " +
        "she's should shouldn't so some such than that that's the their theirs them themselves then there there's these they " +
        "they'd they'll they're they've this those through to too under until up very was wasn't we we'd we'll we're we've " +
        "were weren't what what's when when's where where's which while who who's whom why why's with won't would wouldn't " +
        "you you'd you'll you're you've your yours yourself yourselves").split(" ").toSeq
    Seq("a", "i") ++ base ++ base.map(_.capitalize)
  }

  /** Greek → Latin transliteration (reference spark/Helpers.scala:94–96):
    * NER surface forms like "α-synuclein" must match entity labels spelled
    * "a-synuclein".
    */
  def transliterate(c: Column): Column =
    translate(c, "αβγδεζηικλμνξπτυω", "abgdezhiklmnxptuo")

  /** Split into raw tokens. `splitDashSlash` distinguishes the two
    * reference tokenizers (Grounding.scala:51–61): the LT path also splits
    * on - and /, the TT path keeps them inside tokens (they're stripped by
    * normalization instead, gluing "TNF-alpha" into "tnfalpha").
    */
  def tokenize(c: Column, splitDashSlash: Boolean): Column = {
    val pattern = if (splitDashSlash) "[\\s\\u00a0\\-/:,;]+" else "[\\s\\u00a0:,;]+"
    filter(split(c, pattern), t => t =!= "")
  }

  /** Case-sensitive stop-word removal on raw (pre-lowercase) tokens —
    * order matters: "AS" the gene symbol survives, "as" the conjunction
    * doesn't (reference Grounding.scala:70–75).
    */
  def removeStopWords(tokens: Column): Column =
    array_except(tokens, typedLit(stopWords))

  /** Per-token normalization: lowercase then strip every char that is not
    * a word char ([a-z0-9_] — Java-regex \w semantics, matching the
    * reference Normalizer cleanup patterns Grounding.scala:63–68, 77–82,
    * which reduce to exactly this on whitespace-free tokens).
    */
  def normalizeTokens(tokens: Column): Column =
    filter(transform(tokens, t => regexp_replace(lower(t), "[^a-z0-9_]", "")), t => t =!= "")

  /** Porter-stem every token — a native codegen'd Catalyst expression
    * (graft.text.StemArrayExpression), not a UDF: stays inside
    * WholeStageCodegen with no per-row converter allocation.
    */
  def stemTokens(tokens: Column): Column = StemArrayExpression(tokens)

  /** Stemmed token array for the LT path (transliterate → tokenize with
    * dash/slash splits → stop-word removal → normalize → stem).
    */
  def ltTokens(text: Column): Column =
    stemTokens(normalizeTokens(removeStopWords(tokenize(transliterate(text), splitDashSlash = true))))

  /** Normalized token array for the TT path. */
  def ttTokens(text: Column): Column =
    normalizeTokens(tokenize(transliterate(text), splitDashSlash = false))

  /** Order-insensitive stemmed key (reference Grounding.scala:377–382). */
  def ltKey(text: Column): Column =
    array_join(array_sort(array_distinct(ltTokens(text))), "")

  /** Order-sensitive token key (reference Grounding.scala:383–385). */
  def ttKey(text: Column): Column = array_join(ttTokens(text), "")

  /** Key selected by a per-row key-type discriminator column. */
  def keyFor(text: Column, keyType: Column): Column =
    when(keyType === LabelKeyType, ltKey(text))
      .when(keyType === TokenKeyType, ttKey(text))
}
