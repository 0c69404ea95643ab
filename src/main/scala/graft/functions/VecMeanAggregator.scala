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
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length && i < sums.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      val out = a._1.clone()
      var i = 0
      while (i < out.length && i < b._1.length) { out(i) += b._1(i); i += 1 }
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
