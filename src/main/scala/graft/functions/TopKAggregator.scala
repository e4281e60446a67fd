package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate inside a bounded top-k buffer. Ordering is
  * score DESC then id ASC — the id is the deterministic tiebreaker every
  * ranking in this library carries (Q.scala rules).
  */
final case class Scored(score: Double, id: Long)

/** Bounded top-k-per-group as a typed, combinable [[Aggregator]].
  *
  * The standard top-k-per-group shapes both fail at 100 TB:
  *   - `row_number().over(Window.partitionBy(g).orderBy(...))` shuffles
  *     EVERY row to its group's reducer and sorts the full group just to
  *     keep k of them — the shuffle is the whole table;
  *   - `slice(array_sort(collect_list(...)), 1, k)` is combinable but its
  *     partial state is the whole group collected on the map side —
  *     unbounded memory per key.
  *
  * This aggregator's partial state is AT MOST k elements, so the map-side
  * combine reduces each partition to ≤ k rows per group BEFORE the
  * shuffle: the exchange carries ≤ k·groups·partitions rows instead of
  * the table, and reducer memory is O(k) per key. Merge is a k-bounded
  * sorted-list merge, associative and commutative (the buffer is a
  * function of the SET of inputs seen), so the result is identical under
  * any partitioning — the property the cross-engine hash compare and
  * TopKAggSpec's repartition-invariance case pin.
  *
  * Runs as ObjectHashAggregate (typed buffers don't codegen); that trade
  * is the point — a non-codegen agg over ≤ k·groups rows beats a
  * codegen'd sort over all of them. For k large enough that k·groups
  * approaches the table size, use the window instead.
  */
class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  def zero: Seq[Scored] = Seq.empty

  /** Total order on scores matching Spark SQL's sort semantics: NaN
    * compares GREATER than every other double (so `ORDER BY score DESC`
    * ranks NaN first — identical to the row_number window form), NaN ==
    * NaN, and -0.0 == 0.0 (Spark normalizes signed zero in comparisons).
    * A plain `>`/`==` pair is partial under NaN: beats() would be false
    * in both directions, silently dropping NaN rows once the buffer is
    * full and breaking the sorted-merge invariant when under-full.
    */
  private def cmpScore(x: Double, y: Double): Int =
    java.lang.Double.compare(if (x == 0.0) 0.0 else x, if (y == 0.0) 0.0 else y)

  private def beats(a: Scored, b: Scored): Boolean = {
    val c = cmpScore(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  /** Merge two (score DESC, id ASC)-sorted lists, keeping the first k. */
  private def mergeSorted(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = {
    val out = new ArrayBuffer[Scored](k)
    var i = 0
    var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && beats(a(i), b(j)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
    }
    out.toSeq
  }

  def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] =
    // skip the merge when the buffer is full and `in` can't place — the
    // common case once a partition has seen k good rows
    if (buf.length >= k && !beats(in, buf.last)) buf
    else mergeSorted(buf, Seq(in))

  def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = mergeSorted(a, b)

  def finish(r: Seq[Scored]): Seq[Scored] = r

  def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopKAgg {
  /** DataFrame-facing column function: `topK(3)(col("score"), col("id"))`
    * → `array<struct<score,id>>` sorted score DESC, id ASC, length ≤ 3.
    */
  def topK(k: Int): UserDefinedFunction = udaf(new TopKAgg(k))
}
