package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator: element-wise mean of float vectors (label
  * centroids). The `Aggregator[IN, BUF, OUT]` extension point from
  * SURVEY.md §2.10 — partial aggregation (map-side combine) comes for
  * free: buffers merge associatively, so a 100 TB corpus reduces to
  * one small buffer per group per partition before the shuffle.
  *
  * For oracle-exact results use the decimal posexplode form in
  * SparkEntry q46 — double summation order varies with partitioning;
  * this typed form is the ergonomic API.
  */
class VectorMean(dim: Int) extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {
  def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)
  def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    if (v != null) {
      require(v.length == dim, s"expected dim $dim, got ${v.length}")
      var i = 0
      while (i < dim) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    } else b
  }
  def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dim) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }
  def finish(b: (Array[Double], Long)): Array[Double] =
    if (b._2 == 0) new Array[Double](dim) else b._1.map(_ / b._2)
  def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
