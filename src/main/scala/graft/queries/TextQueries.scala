package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Q.t

/** Text-analysis + deduplication operators over the `documents` table —
  * the training-data-pipeline surface (exact dedup, MinHash+LSH, SimHash,
  * n-gram Jaccard, language-ID, quality scoring, token counting, document
  * fingerprinting). All hashes are MD5-hex based so the DuckDB oracle can
  * reproduce them bit-for-bit.
  */
object TextQueries {

  /** words of a doc, split on single spaces. */
  private def words(c: Column): Column = split(c, " ")

  /** Documents augmented with deterministic near-duplicates: every 10th doc
    * gets a copy (id+1000000) with one token prepended. Guarantees the
    * near-dup queries have non-trivial results at every scale factor.
    */
  private def corpus(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionByName(
      d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), concat(lit("xx "), col("text")).as("text")))
  }

  private val corpusSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS doc_id, 'xx ' || text AS text
      |FROM documents WHERE doc_id % 10 = 0""".stripMargin

  /** (doc_id, shingle) pairs: word 3-grams. Docs with <3 words drop out in
    * both engines.
    */
  private def shingles(c: DataFrame): DataFrame = {
    val w = words(col("text"))
    c.filter(size(w) >= 3)
      .select(
        col("doc_id"),
        explode(transform(sequence(lit(1), size(w) - 2), i => array_join(slice(w, i, lit(3)), " "))).as("shingle"))
  }

  private val shinglesSql =
    """SELECT doc_id, array_to_string(w[i:i+2], ' ') AS shingle FROM (
      |  SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM __CORPUS__) WHERE len(w) >= 3)""".stripMargin

  // ------------------------------------------------------------ exact dedup

  /** Exact dedup by content hash: canonical id + duplicate count per
    * distinct text. At scale this is a single hash-shuffle on a 32-char key
    * instead of the full document payload.
    */
  val dedupExact: Q = Q(
    "d1_dedup_exact",
    """SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id, count(*) AS n_dups
      |FROM documents GROUP BY md5(text)""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_dups"))
  }

  // ---------------------------------------------------------------- MinHash

  private val seeds = 1 to 4

  /** One md5 per shingle, then 4 hex ROTATIONS as the permutation family:
    * each rotation is a bijection on 32-char hex strings, so taking the
    * min under each rotated ordering is an independent MinHash
    * permutation — at 1/4 the hashing cost of seeded re-hashing (the hash
    * is the hot loop: it runs once per shingle occurrence over the whole
    * corpus).
    */
  private def sigAggs: Seq[Column] =
    seeds.map(h =>
      min(concat(substring(col("m"), h + 1, 32 - h), substring(col("m"), 1, h))).as(s"sig$h"))

  private def sigSelectSql: String =
    seeds.map(h => s"min(substr(m, ${h + 1}) || substr(m, 1, $h)) AS sig$h").mkString(", ")

  /** (doc_id, m=md5(shingle)) — the hashed shingle stream feeding the
    * signature aggregation.
    */
  private def hashedShingles(c: DataFrame): DataFrame =
    shingles(c).select(col("doc_id"), md5(col("shingle")).as("m"))

  private val hashedShinglesSql =
    s"SELECT doc_id, md5(shingle) AS m FROM (${shinglesSql.replace("__CORPUS__", "corpus")})"

  /** MinHash signatures (4 rotation-permutations over one MD5 per
    * shingle): per-doc signature is the min hash under each permutation.
    * Shuffle key is doc_id with map-side partial min — the shingle
    * explosion never leaves the mapper.
    */
  val minhashSignature: Q = Q(
    "d2_minhash_signature",
    s"""SELECT doc_id, $sigSelectSql
       |FROM (${hashedShinglesSql.replace("corpus", "documents")})
       |GROUP BY doc_id""".stripMargin) { (s, dir) =>
    hashedShingles(t(s, dir, "documents").select(col("doc_id"), col("text")))
      .groupBy(col("doc_id"))
      .agg(sigAggs.head, sigAggs.tail: _*)
  }

  /** MinHash LSH candidate pairs: signatures banded 2×2
    * (band1 = md5(sig1||sig2), band2 = md5(sig3||sig4)); docs sharing a band
    * bucket become candidates; estimated similarity = fraction of matching
    * signature components. The band bucket-join is the scale path — it
    * shuffles on the band hash, never comparing all N² pairs.
    */
  val minhashLshPairs: Q = Q(
    "d3_minhash_lsh_pairs",
    s"""WITH corpus AS ($corpusSql),
       |sigs AS (
       |  SELECT doc_id, $sigSelectSql
       |  FROM ($hashedShinglesSql)
       |  GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, sig1, sig2, sig3, sig4, unnest([md5(sig1 || sig2), md5(sig3 || sig4)]) AS band
       |  FROM sigs)
       |SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
       |  round((CASE WHEN a.sig1 = b.sig1 THEN 1 ELSE 0 END +
       |         CASE WHEN a.sig2 = b.sig2 THEN 1 ELSE 0 END +
       |         CASE WHEN a.sig3 = b.sig3 THEN 1 ELSE 0 END +
       |         CASE WHEN a.sig4 = b.sig4 THEN 1 ELSE 0 END) / 4.0, 6) AS est_sim
       |FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id""".stripMargin) { (s, dir) =>
    val sigs = hashedShingles(corpus(s, dir)).groupBy(col("doc_id")).agg(sigAggs.head, sigAggs.tail: _*)
    val banded = sigs.select(
      col("doc_id"), col("sig1"), col("sig2"), col("sig3"), col("sig4"),
      explode(array(md5(concat(col("sig1"), col("sig2"))), md5(concat(col("sig3"), col("sig4"))))).as("band"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val matches = seeds
      .map(h => when(col(s"a.sig$h") === col(s"b.sig$h"), 1).otherwise(0))
      .reduce(_ + _)
    a.join(b, col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc1"),
        col("b.doc_id").as("doc2"),
        round(matches / 4.0, 6).as("est_sim"))
      .distinct()
  }

  // ---------------------------------------------------------------- SimHash

  /** 16-bit SimHash over word hashes (first 4 MD5 nibbles per word): each
    * bit is the sign of the vote sum across words. Near-dup docs differ in
    * few bits. One groupBy(doc_id) with 16 conditional sums — fully
    * map-side-combinable.
    */
  val simhash: Q = {
    // nibble k (0..3) of the word hash, as an int 0..15
    def nibbleSpark(k: Int): Column =
      conv(substring(md5(col("word")), k + 1, 1), 16, 10).cast("int")
    def nibbleSql(k: Int): String =
      s"(strpos('0123456789abcdef', substr(md5(word), ${k + 1}, 1)) - 1)"
    // vote for bit b: +1 if set else -1
    def voteSpark(b: Int): Column = {
      val nib = nibbleSpark(b / 4)
      sum(when(floor(nib / math.pow(2, b % 4).toInt) % 2 === 1, 1).otherwise(-1)).as(s"v$b")
    }
    def voteSql(b: Int): String = {
      val shifted = s"(${nibbleSql(b / 4)} // ${math.pow(2, b % 4).toInt})"
      s"sum(CASE WHEN $shifted % 2 = 1 THEN 1 ELSE -1 END) AS v$b"
    }
    val bits = 0 until 16
    val simhashSpark: Column =
      bits.map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
    val simhashSql: String =
      bits.map(b => s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    Q(
      "d4_simhash",
      s"""SELECT doc_id, CAST(${simhashSql} AS BIGINT) AS simhash FROM (
         |  SELECT doc_id, ${bits.map(voteSql).mkString(", ")}
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |  GROUP BY doc_id)""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(words(col("text"))).as("word"))
        .groupBy(col("doc_id"))
        .agg(bits.map(voteSpark).head, bits.map(voteSpark).tail: _*)
        .select(col("doc_id"), simhashSpark.as("simhash"))
    }
  }

  // --------------------------------------------------------- n-gram Jaccard

  /** Exact n-gram Jaccard near-dup pairs via a shingle inverted index:
    * distinct (doc, shingle) self-joined on shingle → |A∩B|, combined with
    * per-doc set sizes → |A∪B|. Shuffles on shingle (bounded frequency),
    * never materializing N² pairs.
    */
  val ngramJaccardPairs: Q = Q(
    "d5_ngram_jaccard_pairs",
    s"""WITH corpus AS ($corpusSql),
       |sh AS (SELECT DISTINCT doc_id, shingle FROM (${shinglesSql.replace("__CORPUS__", "corpus")})),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n_inter
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT doc1, doc2,
       |  round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6) AS jaccard
       |FROM inter
       |JOIN sizes sa ON doc1 = sa.doc_id
       |JOIN sizes sb ON doc2 = sb.doc_id
       |WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5""".stripMargin) { (s, dir) =>
    val sh = shingles(corpus(s, dir)).distinct()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.alias("a")
    val b = sh.alias("b")
    val inter = a
      .join(b, col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .agg(count(lit(1)).as("n_inter"))
    val jac = col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter"))
    inter
      .join(broadcast(sizes.select(col("doc_id"), col("n").as("na"))), col("doc1") === col("doc_id")).drop("doc_id")
      .join(broadcast(sizes.select(col("doc_id"), col("n").as("nb"))), col("doc2") === col("doc_id")).drop("doc_id")
      .filter(jac >= 0.5)
      .select(col("doc1"), col("doc2"), round(jac, 6).as("jaccard"))
  }

  // ------------------------------------------------------------ text stats

  private val stopEn = Seq("the", "and", "of", "to", "a", "in", "is")
  private val stopDe = Seq("der", "die", "und", "das", "ist")
  private val stopFr = Seq("le", "la", "les", "et", "des")
  private val stopEs = Seq("el", "los", "las", "y", "si")

  private def stopCount(wordsCol: Column, stop: Seq[String]): Column =
    size(filter(wordsCol, w => array_contains(typedLit(stop), w)))

  private def stopCountSql(stop: Seq[String]): String =
    s"len(list_filter(w, t -> list_contains([${stop.map("'" + _ + "'").mkString(",")}], t)))"

  /** Language-ID by stop-word voting (an n-gram-free heuristic; real
    * pipelines would use char n-gram profiles — same dataflow shape).
    */
  val langId: Q = Q(
    "x1_lang_id",
    s"""SELECT doc_id,
       |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
       |       WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
       |       WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
       |       WHEN s_es > 0 THEN 'es'
       |       ELSE 'und' END AS pred_lang,
       |  lang AS labeled_lang
       |FROM (SELECT doc_id, lang,
       |        ${stopCountSql(stopEn)} AS s_en, ${stopCountSql(stopDe)} AS s_de,
       |        ${stopCountSql(stopFr)} AS s_fr, ${stopCountSql(stopEs)} AS s_es
       |      FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS w FROM documents))""".stripMargin) { (s, dir) =>
    val w = words(lower(col("text")))
    t(s, dir, "documents")
      .select(
        col("doc_id"), col("lang"),
        stopCount(w, stopEn).as("s_en"), stopCount(w, stopDe).as("s_de"),
        stopCount(w, stopFr).as("s_fr"), stopCount(w, stopEs).as("s_es"))
      .select(
        col("doc_id"),
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") && col("s_en") >= col("s_es") && col("s_en") > 0, "en")
          .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es") && col("s_de") > 0, "de")
          .when(col("s_fr") >= col("s_es") && col("s_fr") > 0, "fr")
          .when(col("s_es") > 0, "es")
          .otherwise("und")
          .as("pred_lang"),
        col("lang").as("labeled_lang"))
  }

  /** Quality scoring: word count, punctuation ratio, stop-word ratio and a
    * composite score — the standard pre-training filter features.
    */
  val qualityScore: Q = Q(
    "x2_quality_score",
    s"""SELECT doc_id, n_words,
       |  round(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
       |  round(CAST(n_stop AS DOUBLE) / n_words, 6) AS stop_ratio,
       |  round(least(CAST(n_words AS DOUBLE) / 50, 1.0) * (1 - CAST(n_punct AS DOUBLE) / n_chars), 6) AS quality
       |FROM (SELECT doc_id, n_chars,
       |        len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_words,
       |        len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct,
       |        ${stopCountSql(stopEn)} AS n_stop
       |      FROM (SELECT doc_id, n_chars, text, string_split(lower(text), ' ') AS w FROM documents))
       |WHERE n_words > 0""".stripMargin) { (s, dir) =>
    val nWords = size(filter(split(col("text"), " "), w => w =!= ""))
    val nPunct = size(expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)"))
    t(s, dir, "documents")
      .select(
        col("doc_id"), col("n_chars"),
        nWords.as("n_words"), nPunct.as("n_punct"),
        stopCount(words(lower(col("text"))), stopEn).as("n_stop"))
      .filter(col("n_words") > 0)
      .select(
        col("doc_id"), col("n_words"),
        round(col("n_punct").cast("double") / col("n_chars"), 6).as("punct_ratio"),
        round(col("n_stop").cast("double") / col("n_words"), 6).as("stop_ratio"),
        round(least(col("n_words").cast("double") / 50, lit(1.0)) * (lit(1) - col("n_punct").cast("double") / col("n_chars")), 6).as("quality"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex tokenizer
    * (letter runs / digit runs / single punctuation).
    */
  val tokenStats: Q = Q(
    "x3_token_stats",
    """SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS re_tokens
      |FROM documents""".stripMargin) { (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)")).as("re_tokens"))
  }

  /** Document fingerprint: 31-polynomial rolling hash mod 1e9+7 over the
    * character stream — identical left-fold recurrence in both engines.
    */
  val fingerprint: Q = Q(
    "x4_fingerprint",
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(regexp_extract_all(text, '[\s\S]'), c -> CAST(ascii(c) AS BIGINT))),
      |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
      |FROM documents""".stripMargin) { (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      aggregate(
        expr("regexp_extract_all(text, '[\\\\s\\\\S]', 0)"),
        lit(0L),
        (acc, c) => (acc * 31 + ascii(c)) % 1000000007L).as("fp"))
  }

  /** LT/TT key canonicalization (reference Grounding.scala:367–387): the
    * order-insensitive (sorted, deduped) and order-sensitive token keys that
    * drive the grounding joins. Stemming variant lives in graft.text and is
    * covered by specs (no SQL-expressible Porter stemmer).
    */
  val textKeys: Q = Q(
    "t1_text_keys",
    """SELECT p_partkey,
      |  array_to_string(list_sort(list_distinct(string_split(lower(p_name), ' '))), '') AS lt_key,
      |  array_to_string(list_filter(string_split(lower(p_name), ' '), t -> t <> ''), '') AS tt_key
      |FROM part""".stripMargin) { (s, dir) =>
    val toks = split(lower(col("p_name")), " ")
    t(s, dir, "part").select(
      col("p_partkey"),
      array_join(array_sort(array_distinct(toks)), "").as("lt_key"),
      array_join(filter(toks, w => w =!= ""), "").as("tt_key"))
  }

  val all: Seq[Q] = Seq(
    dedupExact, minhashSignature, minhashLshPairs, simhash, ngramJaccardPairs,
    langId, qualityScore, tokenStats, fingerprint, textKeys)
}
