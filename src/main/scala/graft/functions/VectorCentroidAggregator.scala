package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mutable aggregation buffer: element-wise sums + count. */
case class CentroidBuf(sums: Array[Double], n: Long)

/** Typed `Aggregator` computing a per-group vector centroid in one pass
  * — the SURVEY §2.10 custom-aggregate surface ("Aggregator[IN,BUF,OUT]
  * if we add vector centroids per label"). Buffer is a dim-wide double
  * sum + count; merge is element-wise, so partial aggregation
  * (map-side combine) works exactly like any built-in agg and the
  * whole vector never shuffles more than once per group per partition.
  * The alternative formulation (posexplode → per-cell avg, used by the
  * oracled q21) shuffles (group, pos) pairs; this one shuffles one
  * buffer per (group, partition) — fewer, wider records, preferable
  * when dim is large and groups are few.
  */
class VectorCentroidAggregator(dim: Int)
    extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {

  override def zero: CentroidBuf = CentroidBuf(new Array[Double](dim), 0L)

  override def reduce(b: CentroidBuf, v: Seq[Float]): CentroidBuf = {
    var i = 0
    val n = math.min(dim, v.length)
    while (i < n) { b.sums(i) += v(i).toDouble; i += 1 }
    CentroidBuf(b.sums, b.n + 1)
  }

  override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    CentroidBuf(a.sums, a.n + b.n)
  }

  override def finish(b: CentroidBuf): Seq[Double] =
    if (b.n == 0L) Seq.fill(dim)(0.0)
    else b.sums.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
