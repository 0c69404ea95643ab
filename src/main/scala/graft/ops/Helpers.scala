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
  /** Order-independent exact sum of a double column, emitted as double.
    * Pick `scale` >= the decimal digits of the underlying values: a value
    * landing exactly halfway at the cast scale rounds differently across
    * engines (Spark HALF_UP vs DuckDB banker's-adjacent) — e.g. products of
    * three 2-decimal factors need scale 6, raw 2-decimal columns need 4.
    */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Order-independent exact mean of a double column, emitted as double.
    * The division happens in DOUBLE (exact-decimal sum first, then cast) so
    * both engines divide the identical numerator — decimal-division scale
    * rules differ between engines, double division does not.
    * DuckDB equivalent: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x).
    */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double") / count(c)
}
