package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared expression helpers for deterministic, oracle-comparable output.
  *
  * Floating-point SUM/AVG over a shuffled dataset is order-dependent, so a
  * raw double aggregate can differ between Spark and DuckDB (and between two
  * Spark runs). We sum in exact decimal arithmetic and convert the final
  * value to double: `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)` on both
  * engines gives bit-identical results regardless of partitioning/order.
  */
object Helpers {
  /** Order-independent exact sum of a double column, emitted as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Order-independent exact mean of a double column, emitted as double.
    * DuckDB equivalent: CAST(SUM(CAST(x AS DECIMAL(18,4))) / COUNT(x) AS DOUBLE).
    */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 4))) / count(c)).cast("double")
}
