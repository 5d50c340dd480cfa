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

/** Mutable buffer for [[CentroidScaledAggregator]]: element-wise sums
  * of values scaled to 1e-12-resolution longs, + count. */
case class CentroidScaledBuf(sums: Array[Long], n: Long)

/** Order-independent centroid aggregator: each element is quantized to
  * 12 decimal places (`Math.round(v * 1e12)` — the same resolution as
  * the DECIMAL(28,12) discipline of the oracled centroid queries) and
  * summed as a LONG, so partial-aggregation merge order cannot perturb
  * the result the way double addition can. This is what lets the
  * k-means loop ([[graft.operators.Similarity.kMeans]]) converge to the
  * SAME exact fixpoint under any partition count (the 3-vs-8-CPU
  * crosscheck) while shuffling one k-wide buffer per (group, partition)
  * instead of exploding (group, pos) cells. Headroom: 1e12-scaled unit
  * floats overflow a long only past ~9e6 rows per PARTIAL buffer;
  * map-side combine keeps partials per-partition-sized (and the final
  * merge is k buffers), so at 100 TB this holds per-task, with the
  * explode+DECIMAL path as the unbounded-precision fallback. */
class CentroidScaledAggregator(dim: Int)
    extends Aggregator[Seq[Double], CentroidScaledBuf, Seq[Double]] {

  override def zero: CentroidScaledBuf = CentroidScaledBuf(new Array[Long](dim), 0L)

  override def reduce(b: CentroidScaledBuf, v: Seq[Double]): CentroidScaledBuf = {
    var i = 0
    val n = math.min(dim, v.length)
    while (i < n) { b.sums(i) += Math.round(v(i) * 1e12); i += 1 }
    CentroidScaledBuf(b.sums, b.n + 1)
  }

  override def merge(a: CentroidScaledBuf, b: CentroidScaledBuf): CentroidScaledBuf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    CentroidScaledBuf(a.sums, a.n + b.n)
  }

  override def finish(b: CentroidScaledBuf): Seq[Double] =
    if (b.n == 0L) Seq.fill(dim)(0.0)
    else b.sums.map(s => s.toDouble / 1e12 / b.n).toSeq

  override def bufferEncoder: Encoder[CentroidScaledBuf] =
    Encoders.product[CentroidScaledBuf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
