package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Streaming char-gram duplication scoring — the incremental (ST7)
  * continuation of the char-level dedup family (q87 `duplicatedSpans`,
  * q190 `sharedSubstringPairs`), the one dedup family that had no
  * store until r19: a persisted store of char `k`-gram document
  * frequencies (md5 digests, ADDITIVE counts — exactly
  * [[ParagraphStore]]'s contract over gram digests instead of
  * paragraph digests) lets each new micro-batch score its documents'
  * duplicated-substring fraction against the CUMULATIVE corpus
  * (prior ingests + the batch itself) without rescanning 100 TB.
  *
  * Store layout under `path`: `ingest=<key>/shard=<s>/` parquet rows
  * (h = md5 hex of the char k-gram — the q170/q190 digest idiom, cnt =
  * batch docs containing the gram; grams are DISTINCT per doc, so the
  * count IS the batch df). shard = pmod(hash(h), nShards); a probe
  * collects its own shard set (≤ nShards ints, driver-bounded) and
  * Catalyst prunes every other shard directory. Counts are ADDITIVE:
  * probes SUM across ingest partitions, so [[compact]]'s re-aggregation
  * into `ingest=base` is probe-identical BY CONSTRUCTION.
  *
  * Incremental semantics, pinned: a batch document's score counts a
  * gram as duplicated iff its CUMULATIVE df (batches 0..i) ≥ 2 — i.e.
  * batch i's scored rows equal `Dedup.duplicatedSpans` over the
  * CONCATENATION of batches 0..i restricted to batch i's docs
  * (spec-asserted bit-identical); earlier batches' scores do NOT
  * retro-update when later copies arrive — the standard incremental
  * posture (re-run the corpus as one batch for the symmetric answer).
  *
  * Crash-replay idempotence is the SignatureStore contract verbatim:
  * both sinks write under the batch's own `ingest=b<id>_<ckpt-hash>`
  * partition with dynamic overwrite, and the scoring decision EXCLUDES
  * that partition from the store it reads. Full maintenance contract
  * from birth (the r15 rule): [[compact]] (stage-then-swap, sibling
  * lease), [[delete]] (tombstones by gram digest — known boilerplate
  * stops counting immediately), [[withReadRetry]], [[recover]].
  */
object SubstringStore {

  /** `k`/`nShards` MUST match between ingests of one store. */
  final case class Params(k: Int = 32, nShards: Int = 32)

  private def lockPath(path: String): String = path + ".compact_lock"
  private def tombstoneDir(path: String): String = path + "/_tombstones"
  private def shardOf(h: Column, n: Int): Column = pmod(hash(h), lit(n))
  private def streamKey(checkpoint: String): String =
    Integer.toHexString(checkpoint.hashCode)

  /** This batch's (doc, h) gram-digest stream: DISTINCT char k-grams
    * per doc (the q87 span semantics), md5-digested. Docs shorter than
    * k have no gram and are excluded — the q87 contract. */
  private def batchGrams(batch: DataFrame, idCol: String,
      textCol: String, p: Params): DataFrame =
    Dedup.spanStream(batch, idCol, textCol, p.k)
      .select(col("doc"), md5(col("span")).as("h"))

  /** Idempotent per-micro-batch store write: this batch's partition is
    * replaced, nothing else touched; fails fast on the compactor
    * lease. */
  private[graft] def appendBatch(counts: DataFrame, path: String,
      ingest: String, p: Params): Unit = {
    StoreFs.failIfLeased(counts.sparkSession, lockPath(path),
      s"SubstringStore write (ingest=$ingest)")
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

  /** Prior corpus df for exactly the digests in `hashes`: shard-pruned
    * scan, `excludeIngest` scopes a replay to the pre-batch store
    * state, tombstoned digests never count. */
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

  /** One micro-batch: digest grams, decide duplication against the
    * CUMULATIVE df (committed store excluding this batch's own
    * partition, + the batch's own counts), write per-doc scores
    * (id, total_spans, dup_spans, dup_ppm — exact integers) and the
    * batch's df rows, each under the batch's ingest key. */
  private[graft] def processBatch(batch: DataFrame, ingest: String,
      idCol: String, textCol: String, path: String, scoredPath: String,
      p: Params): Unit = {
    val spark = batch.sparkSession
    // NO eager checkpoint on the gram-mass frames (the r5/q96 lessons,
    // re-measured r20): grams ≈ Σ doc-len rows — localCheckpointing
    // that twice through block storage cost 702 s at m30 where the
    // shape below reads ~q87's batch cost. grams recomputes its
    // charShingles+md5 kernel per consumer (cheaper than
    // materializing); counts (consumed by the shard collect, the
    // scoring join and the store append) gets a LAZY serialized
    // persist — it materializes inside the first consumer's job
    // instead of paying a separate pass. Every aggregate is
    // exact-integer, so recompute is bit-identical by construction.
    val grams = batchGrams(batch, idCol, textCol, p)
    val counts = grams.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      val totals =
        if (!StoreFs.hasCommittedData(spark, path))
          counts.withColumn("__tot", col("cnt"))
        else counts
          .join(priorDf(spark, path, counts, p, Some(ingest)), Seq("h"), "left")
          .withColumn("__tot", col("cnt") + coalesce(col("prior"), lit(0L)))
      // agg-then-rejoin over the gram stream: merge hint (the r13 rule —
      // the digest side is gram-mass-sized on mostly-unique text)
      val scored = grams
        .join(totals.select(col("h"), col("__tot")).hint("merge"), Seq("h"))
        .groupBy(col("doc"))
        .agg(count(lit(1)).as("total_spans"),
          sum(when(col("__tot") >= 2L, 1L).otherwise(0L)).as("dup_spans"))
        .select(col("doc").as(idCol), col("total_spans"), col("dup_spans"),
          expr("dup_spans * 1000000L DIV total_spans").as("dup_ppm"))
        .localCheckpoint() // evaluate the decision ONCE, before any write
      val noGrams = scored.isEmpty
      if (!noGrams)
        scored.write.mode("overwrite")
          .parquet(scoredPath + "/ingest=" + ingest)
      // scored is empty IFF no doc emitted a gram IFF counts is empty
      // (every gram belongs to a doc and every doc with >= 1 gram gets
      // a scored row) — reuse the checkpointed decision instead of
      // re-evaluating the gram aggregation for an emptiness probe
      if (!noGrams) appendBatch(counts, path, ingest, p)
    } finally {
      counts.unpersist()
      ()
    }
  }

  /** Drain a document stream with AvailableNow: per batch, each doc's
    * duplicated-substring score against the cumulative corpus lands
    * under `scoredPath/ingest=<key>`, and the batch's gram-df rows
    * join the store. Replay-idempotent per the store contract. */
  def ingestScore(stream: DataFrame, idCol: String, textCol: String,
      path: String, scoredPath: String, checkpoint: String,
      p: Params = Params())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(p.k >= 1, s"gram length must be >= 1: ${p.k}")
    val key = streamKey(checkpoint)
    stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, s"b${batchId}_$key", idCol, textCol, path,
          scoredPath, p)
      }
      .start()
  }

  /** Logical delete of gram digests (single column named `h` — md5 hex
    * of the char k-gram, e.g. known boilerplate): masked from every
    * probe immediately, applied physically and cleared by [[compact]];
    * wins over later appends of the same digest until then. */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    require(ids.columns.length == 1,
      s"delete expects a single id column, got ${ids.columns.mkString(",")}")
    // enforce the documented contract on EVERY delete (not just
    // consistency with whatever the first delete happened to use):
    // tombstones() masks probes via toDF("h"), so a misnamed column
    // would silently lock the store into an undocumented name
    require(ids.columns.head == "h",
      s"delete expects the gram-digest column to be named 'h' " +
        s"(md5 hex of the char k-gram), got '${ids.columns.head}'")
    StoreFs.failIfLeased(spark, lockPath(path), "SubstringStore delete")
    val dir = tombstoneDir(path)
    ids.distinct().write.mode("append").parquet(dir)
  }

  /** Compact: fold every per-batch `ingest=` partition into
    * `ingest=base` with ONE row per surviving digest — counts are
    * additive, so probe results are identical by construction
    * (spec-asserted). Stage-then-swap with the sibling lease,
    * tombstones snapshotted at entry and applied physically, late
    * tombstones rescued out of `.trash`. */
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
