package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (the Dataset-API UDAF surface, SURVEY.md §2-J):
  * element-wise mean of float vectors — per-group embedding centroids.
  *
  * The buffer is (running element sums, count); merge is element-wise, so
  * the aggregate is algebraic: Spark runs it as partial aggregation with
  * map-side combine, shuffling one (dim-length array, count) pair per
  * group instead of the group's vectors — the property that makes a
  * centroid computation over 100 TB of embeddings one narrow pass + one
  * tiny shuffle.
  */
object VecMeanAggregator extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    // ragged inputs would silently skew dimensions/divisor — reject them
    require(v.nonEmpty, "VecMeanAggregator: zero-length embedding")
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    require(v.length == sums.length,
      s"VecMeanAggregator: ragged embedding dimensions (${v.length} vs ${sums.length})")
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    // counts always add — an empty-sums buffer is the ZERO buffer, not a
    // license to drop the other side's count
    if (a._1.isEmpty) (b._1, a._2 + b._2)
    else if (b._1.isEmpty) (a._1, a._2 + b._2)
    else {
      require(a._1.length == b._1.length,
        s"VecMeanAggregator: ragged partial sums (${a._1.length} vs ${b._1.length})")
      val out = a._1.clone()
      var i = 0
      while (i < out.length) { out(i) += b._1(i); i += 1 }
      (out, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0) Array.empty else r._1.map(_ / r._2)

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
