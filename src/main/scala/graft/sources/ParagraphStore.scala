package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Streaming paragraph-boilerplate dedup — the incremental continuation
  * of `Dedup.dropDuplicateParagraphs` (q154), the way
  * [[SignatureStore.ingestDedup]] continues the batch near-dup ops and
  * [[MediaDedupStore]] continues the perceptual-hash ones: a persisted
  * store of paragraph DOCUMENT FREQUENCIES lets each new micro-batch
  * drop paragraphs whose CUMULATIVE corpus df (prior ingests + this
  * batch) exceeds `maxDf` — the CCNet boilerplate killer run as the
  * daily operation instead of a whole-corpus rescan.
  *
  * Store layout under `path`: `ingest=<key>/shard=<s>/` parquet rows
  * (h = sha2 paragraph digest, cnt = docs of that ingest containing
  * the paragraph), shard = pmod(hash(h), nShards). A batch probe
  * collects its own shard set (≤ nShards ints, driver-bounded) and
  * Catalyst prunes every other shard directory; counts are ADDITIVE,
  * so probes SUM across ingest partitions and [[compact]]'s
  * re-aggregation into `ingest=base` is probe-identical by
  * construction. df counts each INGESTED DOC once (exactly-once batch
  * semantics — the streaming checkpoint — make the per-batch
  * distinct-doc counts disjoint).
  *
  * Incremental semantics, pinned: a paragraph is kept while cumulative
  * df ≤ maxDf, so EARLY copies survive and later ones drop — the
  * standard incremental posture (re-running the corpus as one batch
  * gives q154's symmetric answer instead). Crash-replay idempotence is
  * the SignatureStore contract verbatim: both sinks write under the
  * batch's own `ingest=b<id>_<checkpoint-hash>` partition with dynamic
  * overwrite, and the keep decision EXCLUDES that partition from the
  * store it reads.
  *
  * Maintenance carries the full store contract from birth (the r15
  * MediaDedupStore lesson): [[compact]] (stage-then-swap, lease),
  * [[delete]] (tombstones by paragraph digest — known boilerplate/PII
  * strings stop counting immediately and are removed physically at
  * compaction), [[withReadRetry]], [[recover]].
  */
object ParagraphStore {

  /** `sep`/`nShards` MUST match between ingests of one store. */
  final case class Params(sep: String = "\n", nShards: Int = 32)

  private def lockPath(path: String): String = path + ".compact_lock"
  private def tombstoneDir(path: String): String = path + "/_tombstones"
  private def shardOf(h: Column, n: Int): Column = pmod(hash(h), lit(n))
  private def streamKey(checkpoint: String): String =
    Integer.toHexString(checkpoint.hashCode)

  /** This batch's paragraph document frequencies: (h, cnt) with cnt =
    * DISTINCT batch docs containing the paragraph (q154's df axis). */
  private def batchCounts(segs: DataFrame): DataFrame =
    segs.select(col("__h").as("h"), col("__id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("cnt"))

  /** Idempotent per-micro-batch store write: this batch's partition is
    * replaced, nothing else is touched; fails fast on the compactor
    * lease. */
  private[graft] def appendBatch(counts: DataFrame, path: String,
      ingest: String, p: Params): Unit = {
    StoreFs.failIfLeased(counts.sparkSession, lockPath(path),
      s"ParagraphStore write (ingest=$ingest)")
    counts
      .withColumn("shard", shardOf(col("h"), p.nShards))
      .withColumn("ingest", lit(ingest))
      .repartition(p.nShards, col("shard"))
      .write.partitionBy("ingest", "shard").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(path)
  }

  private[graft] def tombstones(spark: SparkSession,
      path: String): Option[DataFrame] = {
    val dir = tombstoneDir(path)
    if (StoreFs.hasCommittedData(spark, dir))
      Some(spark.read.parquet(dir).distinct())
    else None
  }

  /** Prior corpus df for exactly the hashes in `hashes`: shard-pruned
    * scan (the probe's shard set is collected — ≤ nShards ints),
    * `excludeIngest` scopes a replay to the pre-batch store state,
    * tombstoned digests never count. */
  private[graft] def priorDf(spark: SparkSession, path: String,
      hashes: DataFrame, p: Params,
      excludeIngest: Option[String]): DataFrame = {
    val shards = hashes
      .select(shardOf(col("h"), p.nShards).as("s")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val stored0 = spark.read.parquet(path)
      .filter(col("shard").isin(shards: _*))
    val scoped = excludeIngest
      .fold(stored0)(ex => stored0.filter(col("ingest") =!= lit(ex)))
    val visible = tombstones(spark, path).fold(scoped)(t =>
      scoped.join(broadcast(t.toDF("h")), Seq("h"), "left_anti"))
    visible.join(hashes.select(col("h")).distinct(), Seq("h"), "left_semi")
      .groupBy(col("h")).agg(sum(col("cnt")).as("prior"))
  }

  /** One micro-batch: split paragraphs, decide keeps against the
    * CUMULATIVE df (committed store, excluding this batch's own
    * partition, + this batch's counts), write the reassembled cleaned
    * docs and the batch's df rows, each under the batch's ingest key. */
  private[graft] def processBatch(batch: DataFrame, ingest: String,
      idCol: String, textCol: String, path: String, cleanedPath: String,
      p: Params, maxDf: Long): Unit = {
    val spark = batch.sparkSession
    val segs = Dedup.paragraphSegments(batch, idCol, textCol, p.sep)
      .localCheckpoint() // three consumers: counts, keep join, reassembly
    val counts = batchCounts(segs).localCheckpoint()
    val totals =
      if (!StoreFs.hasCommittedData(spark, path))
        counts.withColumn("__tot", col("cnt"))
      else counts
        .join(priorDf(spark, path, counts, p, Some(ingest)), Seq("h"), "left")
        .withColumn("__tot", col("cnt") + coalesce(col("prior"), lit(0L)))
    val keep = totals
      .select(col("h").as("__h"), (col("__tot") <= maxDf).as("__keep"))
    val cleaned = Dedup.reassembleKept(batch, idCol,
      segs.join(keep, Seq("__h")), p.sep)
      .localCheckpoint() // evaluate the decision ONCE, before any write
    if (!cleaned.isEmpty)
      cleaned.write.mode("overwrite")
        .parquet(cleanedPath + "/ingest=" + ingest)
    if (!counts.isEmpty) appendBatch(counts, path, ingest, p)
  }

  /** Drain a document stream with AvailableNow: per batch, paragraphs
    * whose cumulative corpus df exceeds `maxDf` are dropped, cleaned
    * docs land under `cleanedPath/ingest=<key>`, and the batch's df
    * rows join the store. Replay-idempotent per the store contract. */
  def ingestClean(stream: DataFrame, idCol: String, textCol: String,
      path: String, cleanedPath: String, checkpoint: String,
      p: Params = Params(), maxDf: Long = 1)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(maxDf >= 1, s"maxDf must be >= 1: $maxDf")
    val key = streamKey(checkpoint)
    stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, s"b${batchId}_$key", idCol, textCol, path,
          cleanedPath, p, maxDf)
      }
      .start()
  }

  /** Logical delete of paragraph digests (single column named `h` —
    * sha2 hex of the trimmed paragraph, e.g. known boilerplate or PII
    * strings): masked from every probe immediately, applied physically
    * and cleared by [[compact]]; wins over later appends of the same
    * digest until then. */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    require(ids.columns.length == 1,
      s"delete expects a single id column, got ${ids.columns.mkString(",")}")
    StoreFs.failIfLeased(spark, lockPath(path), "ParagraphStore delete")
    val dir = tombstoneDir(path)
    if (StoreFs.hasCommittedData(spark, dir)) {
      val existing = spark.read.parquet(dir).columns.head
      require(existing == ids.columns.head,
        s"tombstone id column mismatch: store has '$existing', " +
          s"delete got '${ids.columns.head}'")
    }
    ids.distinct().write.mode("append").parquet(dir)
  }

  /** Compact: fold every per-batch `ingest=` partition into
    * `ingest=base` with ONE row per (surviving) digest — counts are
    * additive, so probe results are identical by construction (probes
    * sum either way; spec-asserted). Stage-then-swap with the sibling
    * lease, tombstones snapshotted at entry and applied physically,
    * late tombstones rescued out of `.trash` (the shared
    * `beforeTrashDelete` hook). */
  def compact(spark: SparkSession, path: String,
      p: Params = Params()): Unit = {
    StoreFs.acquireLease(spark, lockPath(path))
    val tsFiles = StoreFs.listDataFiles(spark, tombstoneDir(path))
    val snapNames =
      tsFiles.map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    val dead =
      if (tsFiles.isEmpty) None
      else Some(spark.read.parquet(tsFiles: _*).distinct())
    SignatureStore.stageAndSwap(spark, path,
      () => StoreFs.rescueLateTombstones(spark, path, snapNames)) {
      (src, staged) =>
        val cleaned = dead.fold(src)(t =>
          src.join(broadcast(t.toDF("h")), Seq("h"), "left_anti"))
        cleaned.groupBy(col("h")).agg(sum(col("cnt")).as("cnt"))
          .withColumn("shard", shardOf(col("h"), p.nShards))
          .withColumn("ingest", lit("base"))
          .repartition(p.nShards, col("shard"))
          .write.partitionBy("ingest", "shard").mode("overwrite")
          .parquet(staged)
    }
    StoreFs.releaseLease(spark, lockPath(path))
  }

  /** Reader retry through a concurrent [[compact]]'s swap windows —
    * build the probe AND run the action inside the thunk. */
  def withReadRetry[T](spark: SparkSession, path: String,
      attempts: Int = 6)(thunk: => T): T =
    StoreFs.retryingRead(spark, Seq(path), attempts)(thunk)

  /** Recover an interrupted [[compact]]: repair the swap, clear the
    * crashed compactor's lease. */
  def recover(spark: SparkSession, path: String): Unit = {
    val h = new org.apache.hadoop.fs.Path(path)
    SignatureStore.recoverSwap(
      h.getFileSystem(spark.sessionState.newHadoopConf()), path)
    StoreFs.releaseLease(spark, lockPath(path))
  }
}
