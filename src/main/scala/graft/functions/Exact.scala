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
}
