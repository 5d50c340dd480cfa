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
}
