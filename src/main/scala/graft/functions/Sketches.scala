package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed probabilistic sketches built entirely from Catalyst
  * expressions and combinable aggregates — no UDFs, no driver-side state.
  *
  * Both sketches here serve the same 100-TB pattern: collapse a huge
  * stream into ONE broadcastable row (an array of counters / bit words),
  * then prune the stream map-side against that row before the expensive
  * exact operation. Because counter cells are sums and bit words are ORs,
  * the build aggregation is associative and commutative — map-side
  * combine collapses each partition to at most depth×width rows before
  * the (tiny) shuffle, and the result is deterministic under any
  * partitioning or AQE re-plan.
  *
  * The sketches are PRUNING structures, not answers: every consumer in
  * this library follows them with an exact verification pass, so query
  * output is exact and oracle-checkable while the sketch only bounds the
  * work. A count-min estimate is an upper bound on the true count
  * (Cormode & Muthukrishnan 2005), so threshold-pruning with it never
  * drops a true heavy hitter; a Bloom probe has no false negatives, so
  * semi-join pre-filtering never drops a matching row.
  */
object Sketches {

  // ------------------------------------------------------------ count-min

  /** Count-min sketch of `key` occurrences in `rows`, as a single-row
    * DataFrame: `cms` = depth arrays of width counters (row i counts
    * bucket xxhash64(key, i) mod width), `total` = occurrence count.
    *
    * Shuffle volume is ≤ depth×width rows per map partition regardless of
    * input size; the dense matrix is assembled once from the ≤ depth×width
    * aggregated cells (map → dense array per seed row, then one ordered
    * collect into the matrix).
    */
  def cmsRow(rows: DataFrame, key: Column, depth: Int = 3, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad cms shape: $depth x $width")
    val cells = rows
      .select(explode(array((0 until depth).map { i =>
        struct(lit(i).as("seed"),
          pmod(xxhash64(key, lit(i)), lit(width.toLong)).cast("int").as("bucket"))
      }: _*)).as("sb"))
      .groupBy(col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
    cells
      .groupBy(col("seed"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("n")))).as("m"),
        sum(col("n")).as("seed_total"))
      .select(col("seed"), col("seed_total"),
        expr(s"transform(sequence(0, ${width - 1}), b -> coalesce(m[b], CAST(0 AS BIGINT)))")
          .as("row"))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("seed"), col("row")))).as("rows"),
        // every seed row counts each occurrence once; take seed 0's total
        min(col("seed_total")).as("total"))
      .select(expr("transform(rows, r -> r.row)").as("cms"), col("total"))
  }

  /** Point-estimate expression: min over the depth counter rows of `cms`
    * (a `cms` column produced by [[cmsRow]], typically attached via one
    * broadcast crossJoin). Upper-bounds the true occurrence count of
    * `key`; the bound is what makes threshold pruning lossless.
    */
  def cmsEstimate(cms: Column, key: Column, depth: Int = 3, width: Int = 1024): Column =
    (0 until depth).map { i =>
      element_at(element_at(cms, i + 1),
        pmod(xxhash64(key, lit(i)), lit(width.toLong)).cast("int") + 1)
    }.reduce(least(_, _))

  /** Exact heavy hitters — keys occurring in at least total/denom of the
    * `rows` stream — via count-min pruning: occurrences whose sketch
    * UPPER BOUND is below the threshold are dropped map-side, and only
    * the surviving minority is exact-counted and threshold-filtered.
    *
    * Output (key, cnt) is EXACT (the verify pass removes the sketch's
    * false positives) and all arithmetic is integral (heavy ⇔
    * cnt·denom ≥ total), so the result is engine-independent.
    *
    * At 100 TB this is the difference between shuffling every distinct
    * key (a groupBy over trillions of keys to find the hot few) and
    * shuffling only keys that might plausibly be heavy: the sketch ride
    * is one broadcast row, the pruned exact count touches ≤ width·denom
    * candidate keys' occurrences.
    */
  def heavyHitters(rows: DataFrame, key: Column, denom: Long = 256L,
      depth: Int = 3, width: Int = 1024): DataFrame = {
    val occ = rows.select(key.as("hh_key"))
    val sketch = cmsRow(occ, col("hh_key"), depth, width)
    occ
      .crossJoin(broadcast(sketch))
      .filter(cmsEstimate(col("cms"), col("hh_key"), depth, width) * denom >= col("total"))
      .groupBy(col("hh_key"), col("total"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * denom >= col("total"))
      .select(col("hh_key").as("key"), col("cnt"))
  }

  // ---------------------------------------------------------------- bloom

  /** Bloom filter over the distinct `key` values of `rows`, as a
    * single-row DataFrame: `bloom` = bits/64 words, each the bit_or of
    * `hashes` set bits per key. Like the sketch above, the build is one
    * combinable aggregation (bit_or) whose shuffle is ≤ bits/64 rows per
    * map partition; false-positive rate ≈ (1−e^(−hashes·n/bits))^hashes.
    */
  def bloomRow(rows: DataFrame, key: Column, bits: Int = 1 << 16, hashes: Int = 3): DataFrame = {
    require(bits % 64 == 0 && hashes >= 1, s"bad bloom shape: $bits bits, $hashes hashes")
    val words = bits / 64
    val wordBits = rows
      .select(explode(array((0 until hashes).map { i =>
        val p = pmod(xxhash64(key, lit(i)), lit(bits.toLong))
        struct((p / 64).cast("int").as("w"),
          call_function("shiftleft", lit(1L), (p % 64).cast("int")).as("b"))
      }: _*)).as("wb"))
      .groupBy(col("wb.w").as("w"))
      .agg(bit_or(col("wb.b")).as("bits"))
    wordBits
      .groupBy()
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits")))).as("m"))
      .select(
        expr(s"transform(sequence(0, ${words - 1}), i -> coalesce(m[i], CAST(0 AS BIGINT)))")
          .as("bloom"))
  }

  /** Membership-probe expression against a [[bloomRow]] `bloom` column:
    * true iff every one of the key's `hashes` bits is set. No false
    * negatives — a row whose key IS in the build set always passes — so
    * using this as a pre-filter before an exact join is lossless.
    */
  def mightContain(bloom: Column, key: Column, bits: Int = 1 << 16, hashes: Int = 3): Column =
    (0 until hashes).map { i =>
      val p = pmod(xxhash64(key, lit(i)), lit(bits.toLong))
      call_function("shiftright", element_at(bloom, (p / 64).cast("int") + 1),
        (p % 64).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** Bloom-pre-filtered left-semi join — the runtime-filter pattern: the
    * build side collapses to one broadcast bit-array row, the probe side
    * drops non-matching rows MAP-SIDE (before its shuffle), and the
    * surviving sliver goes through a normal exact semi join. Result is
    * exactly `probe SEMI JOIN build` (no false negatives + exact verify);
    * the bloom stage only shrinks the shuffled volume.
    *
    * This is what Spark's own runtime filtering injects for selective
    * star joins; expressed here as a first-class operator so a pipeline
    * can apply it where the optimizer's heuristics don't reach (e.g.
    * probe-side columns feeding later stages, pre-aggregated builds).
    */
  def bloomSemiJoin(probe: DataFrame, probeKey: Column, build: DataFrame, buildKey: Column,
      bits: Int = 1 << 16, hashes: Int = 3): DataFrame = {
    val keys = build.select(buildKey.as("bf_key")).distinct()
    val bloom = bloomRow(keys, col("bf_key"), bits, hashes)
    probe
      .crossJoin(broadcast(bloom))
      .filter(mightContain(col("bloom"), probeKey, bits, hashes))
      .drop("bloom")
      .join(keys, probeKey === col("bf_key"), "left_semi")
  }
}
