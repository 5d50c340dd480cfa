package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One top-k candidate: sort value + tie-breaking id. */
case class TopKEntry(v: Double, id: Long)

/** Bounded per-group top-k as a MERGEABLE aggregate — the scalable
  * replacement for `row_number().over(Window.partitionBy(g).orderBy
  * ...) <= k` at 100 TB: the window form shuffles EVERY row of a group
  * to one task and sorts it (the q08 shape — fine when groups are
  * small, a straggler when one group holds a billion rows), while this
  * aggregate keeps at most 2k candidates per partial buffer, combines
  * map-side like any built-in agg, and shuffles one ≤ 2k-entry buffer
  * per (group, partition). A hot group's cost collapses from
  * sort(|group|) on one task to |group| local comparisons spread over
  * its partitions.
  *
  * Order is (v DESC, id ASC) — a TOTAL order, so the top-k set and its
  * sorted sequence are MERGE-ORDER INDEPENDENT (the 3-vs-8-CPU
  * crosscheck discipline; contrast the double-sum Aggregator lesson —
  * selection, unlike addition, commutes exactly). The comparison goes
  * through `java.lang.Double.compare`, which totally orders NaN as the
  * GREATEST double (matching Spark SQL's own sort semantics) — raw
  * `>`/`==` compare false on both sides of a NaN, which breaks
  * sortWith's contract (TimSort can throw, and the surviving set
  * becomes merge-order dependent). Null values must be filtered by the
  * caller BEFORE the aggregate (a null cannot be ranked by value;
  * `Analytics.topKPerGroup` drops such rows and documents it).
  * Buffers trim lazily: `reduce` appends and only sorts once the
  * buffer hits 2k, so the per-row cost is O(1) amortized with an
  * O(k log k) trim every k rows. */
class TopKAggregator(k: Int)
    extends Aggregator[TopKEntry, Seq[TopKEntry], Seq[TopKEntry]] {
  require(k > 0, s"k must be positive: $k")

  private def before(a: TopKEntry, b: TopKEntry): Boolean = {
    val c = java.lang.Double.compare(a.v, b.v)
    c > 0 || (c == 0 && a.id < b.id)
  }

  private def trim(s: Seq[TopKEntry]): Seq[TopKEntry] =
    s.sortWith(before).take(k)

  override def zero: Seq[TopKEntry] = Vector.empty

  override def reduce(b: Seq[TopKEntry], a: TopKEntry): Seq[TopKEntry] = {
    val appended = b :+ a
    if (appended.length >= 2 * k) trim(appended) else appended
  }

  override def merge(a: Seq[TopKEntry], b: Seq[TopKEntry]): Seq[TopKEntry] =
    trim(a ++ b)

  override def finish(b: Seq[TopKEntry]): Seq[TopKEntry] = trim(b)

  override def bufferEncoder: Encoder[Seq[TopKEntry]] =
    ExpressionEncoder[Seq[TopKEntry]]()
  override def outputEncoder: Encoder[Seq[TopKEntry]] =
    ExpressionEncoder[Seq[TopKEntry]]()
}
