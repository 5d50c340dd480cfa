package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — for each left row, the most recent right row at or
  * before its event time, per key. The canonical "operator Spark
  * lacks" (SURVEY preference order: compose built-ins before custom
  * plans); here composition genuinely suffices: tag both sides, union,
  * and take a running `last(_, ignoreNulls)` over
  * (key, time, side, tiebreak) — one shuffle on the key, linear state,
  * no range-join blowup. This is the same merge-scan an engine-native
  * ASOF JOIN performs, expressed declaratively; a custom
  * LogicalPlan/SparkPlan would buy nothing but bypass Catalyst.
  *
  * Right rows at exactly the left timestamp match (<= semantics);
  * ties among right rows resolve to the greatest tiebreak value —
  * explicitly deterministic where engine-native ASOF leaves ties
  * unspecified.
  */
object AsOfJoin {

  /** @param left       probe side (keeps all rows)
    * @param right      reference side
    * @param key        equi-join key column name (both sides)
    * @param ts         event-time column name (both sides)
    * @param rightVal   right column to carry to matched left rows
    * @param rightTiebreak right column ordering ties at equal ts
    * @return left rows + `matched` (rightVal of the as-of row, null if
    *         no right row precedes)
    */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightVal: String, rightTiebreak: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__is_l", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(rightVal).dataType))
      .withColumn("__tb", lit(null).cast(right.schema(rightTiebreak).dataType))
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("__is_l"),
        col(rightVal).cast(right.schema(rightVal).dataType).as("__rv"),
        col(rightTiebreak).as("__tb")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__is_l"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r.select(l.columns.toIndexedSeq.map(col): _*))
      .withColumn("matched", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__is_l") === 1)
      .drop("__is_l", "__rv", "__tb")
  }

  /** Forward as-of: for each left row, the EARLIEST right row at or
    * after its event time, per key — the mirror of [[join]] (same
    * union + merge-scan shape, the same running `last` over the
    * REVERSED sort — see [[fwdWindow]] for why the frame is never
    * UNBOUNDED FOLLOWING). Right rows at exactly the left
    * timestamp match; ties resolve to the greatest tiebreak, the same
    * contract as backward. */
  def joinForward(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightVal: String, rightTiebreak: String): DataFrame =
    merged(left, right, key, ts, rightVal, rightTiebreak)
      .withColumn("matched", last(col("__rv"), ignoreNulls = true)
        .over(fwdWindow(key, ts)))
      .filter(col("__is_l") === 1)
      .drop("__is_l", "__rv", "__rts", "__tb")

  /** Nearest as-of: the closer of the backward and forward matches by
    * absolute time distance (exact integer micros — never a float
    * boundary), ties to the BACKWARD side; one-sided rows take the
    * side that exists. One shuffle on the key, two in-partition sorts
    * (the two scan directions), still no range-join blowup. */
  def joinNearest(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightVal: String, rightTiebreak: String): DataFrame = {
    val wB = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__is_l"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = fwdWindow(key, ts)
    def micros(c: Column): Column =
      if (left.schema(ts).dataType ==
        org.apache.spark.sql.types.TimestampType) unix_micros(c)
      else c.cast("long")
    val both = merged(left, right, key, ts, rightVal, rightTiebreak)
      .withColumn("__bv", last(col("__rv"), ignoreNulls = true).over(wB))
      .withColumn("__bts", last(col("__rts"), ignoreNulls = true).over(wB))
      .withColumn("__fv", last(col("__rv"), ignoreNulls = true).over(wF))
      .withColumn("__fts", last(col("__rts"), ignoreNulls = true).over(wF))
      .filter(col("__is_l") === 1)
    both
      .withColumn("matched",
        when(col("__bv").isNull, col("__fv"))
          .when(col("__fv").isNull, col("__bv"))
          .when(micros(col(ts)) - micros(col("__bts")) <=
            micros(col("__fts")) - micros(col(ts)), col("__bv"))
          .otherwise(col("__fv")))
      .drop("__is_l", "__rv", "__rts", "__tb",
        "__bv", "__bts", "__fv", "__fts")
  }

  /** Forward merge-scan order, expressed as the EXACT REVERSAL of the
    * natural (ts ASC, is_l DESC, tb DESC) forward order so the frame
    * is the incremental [unbounded preceding, current] — Spark's
    * `UnboundedFollowingWindowFunctionFrame` re-evaluates from scratch
    * per row (quadratic in the partition: a Zipf-hot key at m30z
    * measured a 15–19 s single-task straggler, 28.7/38.8 s total on
    * q136/q137), while the preceding frame is O(n) running state —
    * same key shuffle, same sort cost, 33–41× off the hot-key wall.
    * Under (ts DESC, is_l ASC, tb ASC) the rows at-or-after a left row
    * in event time are exactly those at-or-before it in sort order
    * (asc-nulls-first reverses to desc-nulls-last, so default null
    * placement reverses too), an exactly-at-t right row lands in the
    * frame (is_l ASC puts rights before lefts at equal ts), and the
    * running `last` picks the smallest future ts with greatest
    * tiebreak — bit-identical to `first` over the following frame.
    * Null tiebreaks never mix across sides (left __tb is all-null,
    * right all non-null), so engine null-ordering differences cannot
    * reorder anything that matters. */
  private def fwdWindow(key: String, ts: String) =
    Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col("__is_l"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, 0)

  /** Tagged union of both sides carrying the right value, the right
    * row's own timestamp (for distance tests) and the tiebreak. */
  private def merged(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightVal: String, rightTiebreak: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__is_l", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(rightVal).dataType))
      .withColumn("__rts", lit(null).cast(right.schema(ts).dataType))
      .withColumn("__tb", lit(null).cast(right.schema(rightTiebreak).dataType))
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("__is_l"),
        col(rightVal).cast(right.schema(rightVal).dataType).as("__rv"),
        col(ts).as("__rts"),
        col(rightTiebreak).as("__tb")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    l.unionByName(r.select(l.columns.toIndexedSeq.map(col): _*))
  }
}
