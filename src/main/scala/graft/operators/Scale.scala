package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: skew mitigation and storage-layout helpers for the
  * 100 TB design point. These exist because at cluster scale the two
  * recurring shuffle pathologies are (a) a handful of hot keys
  * serializing a join onto a few reducers, and (b) re-shuffling the
  * same fact table for every join against the same key.
  */
object Scale {

  /** Salted equi-join for skewed keys: the big (skewed) side is salted
    * deterministically by `saltOf` into `buckets` sub-keys; the small
    * side is replicated once per salt value, so each hot key fans out
    * over `buckets` reducers instead of one. Result is identical to
    * `big.join(small, key, joinType)` for inner/left joins (the small
    * side is replicated, never filtered). AQE's skew-join handles sort
    * -merge cases adaptively; explicit salting remains the tool when
    * the skew is known ahead of time or the join is hash-based.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltOf: Column, buckets: Int, joinType: String = "inner"): DataFrame = {
    val bigS = big.withColumn("__salt", pmod(saltOf, lit(buckets)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Z-order (Morton) interleave of two non-negative bucket columns,
    * each already reduced to `bits` bits: bit i of `x` lands at z-bit
    * 2i, bit i of `y` at 2i+1. Points close in BOTH dimensions are
    * close on the z-curve, so range-partitioning + sorting a table by
    * `z` clusters it for predicates on EITHER dimension — the
    * multi-dimensional write-time layout (Delta/Iceberg OPTIMIZE
    * ZORDER) that `writeBucketed` cannot give, because a bucket layout
    * serves exactly one key. Pure integer column arithmetic: 2·bits
    * shift/mask terms folded into one codegen'd projection — exact and
    * engine-portable (the oracle replays it per-bit in DuckDB). */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Write `df` z-order-clustered on (`x`, `y`): range-partition by the
    * z-value into `files` output files and sort within each — every
    * file covers a disjoint z-range (asserted in ScaleSpec), so parquet
    * footer min/max on the z column prunes file reads for rectangles in
    * EITHER dimension. At 100 TB this is the scan-side complement to
    * partition pruning: partitions prune directories, z-order prunes
    * files (and row groups) inside them. */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
      bits: Int, files: Int): Unit =
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .write.mode("overwrite").parquet(path)

  /** Write a table bucketed (and sorted) by its join key: co-located,
    * co-sorted joins between two tables bucketed on the same key with
    * the same bucket count need NO exchange and no sort — the shuffle
    * is paid once at write time and amortized over every subsequent
    * join/aggregation on that key. This is the storage-layout answer
    * to "the fact table shuffles for every join" at 100 TB. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
}
