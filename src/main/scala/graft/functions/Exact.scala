package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-insensitive exact aggregates for floating-point columns.
  * Double addition is not associative, so a plain sum() depends on
  * partial-aggregation order — fine for analytics, fatal for
  * hash-compared cross-engine results. Accumulating as decimal(30,10) is
  * associative and exact over the value ranges here; the result is cast
  * back to double.
  */
object Exact {
  def decSum(c: Column): Column = sum(c.cast("decimal(30,10)")).cast("double")

  /** Exact sum for money-like columns (≤4 decimal digits). Scale 4 keeps
    * the unscaled total under 2^53 at these magnitudes, so the final
    * decimal→double conversion is a single correctly-rounded IEEE divide
    * in every engine; at scale 10 the unscaled value overflows the double
    * mantissa and DuckDB's divide-by-10^10 double-rounds 1 ulp away from
    * Spark's BigDecimal conversion.
    */
  def moneySum(c: Column): Column = sum(c.cast("decimal(30,4)")).cast("double")
}
