package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT similarity self-joins with sub-quadratic candidate generation —
  * the lossless complements to the sketch family in [[Dedup]].
  *
  * MinHash/SimHash pairs (d2–d6) trade recall for volume; jaccardPairs'
  * DF cap (d5) trades a documented sliver of exactness for straggler
  * immunity. Sometimes the contract is "every pair above the threshold,
  * exactly" — contamination audits, eval-set leakage, legal takedown
  * sweeps — and the two joins here deliver that without ever going N²:
  *
  *   - [[prefixJaccardPairs]]: ALL pairs with word-set Jaccard ≥ t, via
  *     prefix filtering (Bayardo, Ma & Srikant, WWW 2007, "Scaling up
  *     all pairs similarity search"). Order every doc's tokens by a
  *     global rare-first total order; if J(x,y) ≥ t then |x∩y| ≥
  *     ⌈t·|x|⌉, so x and y MUST share a token inside their first
  *     |x| − ⌈t·|x|⌉ + 1 tokens — candidates are an equi-join on
  *     prefix tokens only. Rare-first is the efficiency half: a corpus
  *     stop word lands in a doc's prefix only when the doc has almost
  *     nothing rarer, so the hot-key postings that force d5's cap
  *     simply never enter the join.
  *   - [[editDistancePairs]]: ALL pairs with Levenshtein ≤ 1, via the
  *     FastSS/SymSpell deletion neighborhood (Bocek et al., 2007): two
  *     strings within edit distance 1 share a member of
  *     {s} ∪ single-char-deletions(s), so candidates are an equi-join
  *     on ≤ len+1 keys per string, verified with the builtin
  *     codegen'd `levenshtein`.
  *
  * Scale shape, both joins: candidate generation is a map-side explode
  * (Σ prefix/neighborhood sizes, linear in corpus tokens), one
  * equi-join shuffle on the candidate key, one pair-distinct shuffle,
  * and a map-side exact verify. Token arrays ride through the join
  * (the measured carry-the-payload default — SCALE.md "LSH
  * pair-generation payload tradeoff"); nothing materializes N².
  */
object SimilarityJoin {

  /** All pairs with distinct-word-set Jaccard ≥ `minJaccard`, exactly.
    *
    * `minJaccard` should be exactly representable in binary (0.5, 0.25,
    * 0.75) so ⌈t·n⌉ never rounds through float fuzz — the prefix-length
    * arithmetic is the one place where an epsilon would silently cost
    * recall rather than fail loudly.
    *
    * Output: (doc1, doc2, jaccard), doc1 < doc2, each qualifying pair
    * exactly once.
    */
  def prefixJaccardPairs(docs: DataFrame, minJaccard: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    prefixJaccardPairsOver(
      docs.select(col(idCol).as("doc_id"),
          explode(array_distinct(split(col(textCol), " "))).as("tok"))
        .filter(col("tok") =!= ""),
      minJaccard)

  /** The core over an arbitrary pre-tokenized (doc_id, tok) relation —
    * whitespace words, shingles ([[Dedup.shingles]]), hostnames,
    * whatever set universe the dedup contract names. Rows must be
    * distinct per (doc_id, tok); Jaccard is over the induced sets.
    */
  def prefixJaccardPairsOver(toks: DataFrame, minJaccard: Double): DataFrame = {
    // the global rare-first total order is carried as ONE STRING per
    // token: zero-padded df ++ tok. Two measured pathologies at 2.5M
    // docs forced this encoding (SCALE.md "prefix_jaccard shape"):
    //   - df via window-over-token ran at ~1 row per window GROUP — 36
    //     us/row of per-group frame machinery, 3100 task-seconds; a
    //     combinable hash agg + equi-join computes the same df for a
    //     fraction of that;
    //   - sort_array over struct(df, tok) elements falls to interpreted
    //     struct ordering (~1 ms/doc); the same order over the padded
    //     string key is a binary UTF8 sort.
    // The key is injective in tok (df is a function of tok), so set
    // intersections/unions over KEYS equal those over tokens and the
    // verify never needs the raw token back.
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val keyed = toks.join(dfreq, "tok")
      .select(col("doc_id"),
        concat(lpad(col("df").cast("string"), 10, "0"), col("tok")).as("k"))
    // `ordered` feeds FOUR consumers (both prefix-candidate join sides +
    // both verify re-attach joins) and its post-shuffle collect_list
    // merge + sort_array re-executes once per consumer (4× in the r10
    // plan audit) — but an eager localCheckpoint here was A/B-REFUTED at
    // sf0.1 (5.31 s → 10.98 s, OPTIMIZATION_r10.md): materializing the
    // full sorted-key-array table through the block store costs more
    // than three re-merges, the cappedShingleIntersections lesson again.
    // The heavy work below the groupBy exchange (token explode + df
    // join) is AQE-stage-shared and runs once either way.
    val ordered = keyed
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("k"))).as("ks"))
      .select(col("doc_id"), col("ks"), size(col("ks")).as("n"))
    val prefixLen = (col("n") - ceil(lit(minJaccard) * col("n")) + 1).cast("int")
    // the candidate join moves ONLY (doc_id, n, key): exploding the
    // prefix duplicates each row ~p times, so carrying the key array
    // here would shuffle every doc's array once per prefix token — the
    // 2.5M soak measured that shape at 27 GB shuffle + 40 GB spill,
    // vs ~2 GB with bare candidates and arrays attached at verify
    // (each doc's array crosses the wire once, doc-keyed). This is the
    // opposite call from lshPairs' carry-the-vector default because the
    // duplication factor differs: LSH bands carry per-band (constant,
    // small), prefixes carry per-token (~ (1−t)·|doc|).
    // df = 1 prefix keys can never meet anything, and the shared token
    // of any qualifying pair has df ≥ 2 and sits inside BOTH prefixes
    // (the prefix theorem), so dropping singletons here loses no pair
    // while collapsing the candidate join's input to only keys that can
    // actually collide — in a mostly-unique shingle universe that is
    // almost all of the explode volume
    val singletonPrefix = "0" * 9 + "1"
    val pref = ordered
      .select(col("doc_id"), col("n"),
        explode(filter(slice(col("ks"), lit(1), prefixLen),
          k => !k.startsWith(singletonPrefix))).as("k"))
    val cand = pref.select(col("doc_id").as("doc1"), col("n").as("n1"), col("k"))
      .join(pref.select(col("doc_id").as("doc2"), col("n").as("n2"), col("k")), Seq("k"))
      // length filter (AllPairs §3.1): J ≥ t forces min(n1,n2) ≥
      // t·max(n1,n2) — kill size-mismatched meets before they pay the
      // pair-dedup shuffle
      .filter(col("doc1") < col("doc2") &&
        col("n2") >= lit(minJaccard) * col("n1") &&
        col("n1") >= lit(minJaccard) * col("n2"))
      // EXPLICIT-COUNT repartition on the pair-dedup key (r11, guide
      // §2.2): the exact verify below (array_intersect/array_union over
      // the attached hash arrays) executes in the post-dedup stage, and
      // AQE's byte-based coalescing sees only the 16-byte (doc1, doc2)
      // pair rows — the r10 stage profile measured the whole verify on
      // 5 tasks / 21 s CPU at sf0.1. Pinning the dedup exchange to
      // defaultParallelism (REPARTITION_BY_NUM is exempt from
      // coalescing) spreads the CPU-dense verify across the cores the
      // session actually has; the count is cluster-derived, not a
      // constant, and the dedup's own ENSURE_REQUIREMENTS exchange is
      // replaced (not added to) because the explicit partitioning
      // already satisfies the aggregate's distribution.
      .repartition(toks.sparkSession.sparkContext.defaultParallelism,
        col("doc1"), col("doc2"))
      .dropDuplicates("doc1", "doc2")
    // verify over HASHED key arrays (r10, guide §2.3/§4): the exact
    // |∩|/|∪| needs set identity, never the key text, so the attach
    // joins ship xxhash64 longs (8 B/element) instead of the padded
    // df++shingle strings (~30–50 B), and array_intersect/array_union
    // compare longs instead of UTF8 strings — the d14 stage profile put
    // nearly all remaining CPU in this verify. Keys are distinct per
    // doc by construction, so the hashed arrays have the same sizes and
    // the same intersection cardinalities as the key arrays (collision
    // odds ~n²/2⁶⁴ per doc pair); the prefix side keeps the string keys
    // because the rare-first ORDER lives there.
    val hashed = ordered.select(col("doc_id"),
      transform(col("ks"), k => xxhash64(k)).as("kh"))
    val withArrays = cand
      .join(hashed.select(col("doc_id").as("doc1"), col("kh").as("t1")), Seq("doc1"))
      .join(hashed.select(col("doc_id").as("doc2"), col("kh").as("t2")), Seq("doc2"))
    val jac = size(array_intersect(col("t1"), col("t2"))).cast("double") /
      size(array_union(col("t1"), col("t2"))).cast("double")
    withArrays.select(col("doc1"), col("doc2"), jac.as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** All pairs with Levenshtein distance ≤ 1 (0 = distinct rows with
    * equal strings), exactly. Deletion depth 1 ships because ed ≤ 1 is
    * the entity-resolution workhorse (typo'd names, off-by-one ids);
    * the same construction extends to ed ≤ k with C(len, k) keys per
    * string.
    *
    * Bucket sizes are bounded by the number of strings within one edit
    * of a shared subsequence — alphabet × length shaped, never
    * corpus-shaped — so the candidate join inherits no hot key from
    * corpus-frequency skew (unlike token blocking on a common prefix).
    *
    * Output: (id1, id2, dist), id1 < id2.
    */
  def editDistancePairs(df: DataFrame, strCol: String, idCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(length(col("s")) > 0)
    val s = col("s")
    val deletions = transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))
    val keyed = base.select(col("id"), s,
      explode(array_union(array(s), deletions)).as("k"))
    keyed.select(col("id").as("id1"), s.as("s1"), col("k"))
      .join(keyed.select(col("id").as("id2"), s.as("s2"), col("k")), Seq("k"))
      .filter(col("id1") < col("id2"))
      .dropDuplicates("id1", "id2")
      .select(col("id1"), col("id2"), levenshtein(col("s1"), col("s2")).as("dist"))
      .filter(col("dist") <= 1)
  }
}
