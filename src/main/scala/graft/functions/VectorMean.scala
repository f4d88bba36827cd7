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
class VectorMean extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {
  // dimension is taken from the first vector seen — the empty buffer is
  // the identity for merge, so partial aggregation stays associative
  def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)
  def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    if (v == null) b
    else {
      val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
      require(v.length == acc.length, s"expected dim ${acc.length}, got ${v.length}")
      var i = 0
      while (i < acc.length) { acc(i) += v(i); i += 1 }
      (acc, b._2 + 1)
    }
  }
  def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      require(a._1.length == b._1.length,
        s"merging buffers of dims ${a._1.length} and ${b._1.length}")
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }
  def finish(b: (Array[Double], Long)): Array[Double] =
    if (b._2 == 0) b._1 else b._1.map(_ / b._2)
  def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
