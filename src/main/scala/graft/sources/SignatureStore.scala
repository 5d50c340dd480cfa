package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Persisted MinHash signature store + incremental (batch-vs-corpus)
  * near-dup dedup — the daily operation of a real training pipeline,
  * and the reference's documented failure mode: its ingest has no
  * unique key, so re-running re-inserts every row
  * (`src/rag/sqlx.rs:34-45`, SURVEY §2.8 ST7). All corpus-self dedup
  * ops (`Dedup.minhashNearDups` et al.) rescan the whole corpus; this
  * store lets a NEW batch be deduped against 100 TB of already-ingested
  * corpus by reading only the shards its candidate buckets live in.
  *
  * Layout under `path`:
  *   bands/    (doc, band, bucket)  partitionBy(ingest, shard)
  *   shingles/ (doc, sh)            partitionBy(ingest)
  * where shard = pmod(hash(bucket), nShards) and `ingest` identifies
  * the write that produced the rows ("base" for bulk builds, a
  * (stream, batchId)-derived key for streaming micro-batches). A small
  * batch touches few distinct (band, bucket) pairs, hence few shards —
  * the probe collects its shard set (bounded by nShards, a driver-side
  * constant, never corpus-sized) and Catalyst prunes every other shard
  * directory at planning time (`PartitionFilters`, spec-asserted). The
  * shingle sets — the bulk of the bytes — never ride the candidate
  * join: they rejoin per SURVIVING pair from `shingles/`, the same
  * late-materialization shape as `minhashNearDups` (r2 q48 finding).
  *
  * The `ingest` partition level is what makes streaming ingest
  * CRASH-REPLAY IDEMPOTENT ([[ingestDedup]]): each micro-batch writes
  * both its sinks under its own ingest key with dynamic partition
  * overwrite, so a replayed batch REPRODUCES its prior write instead of
  * re-deciding against it (the r8 data-loss window: with plain appends,
  * a crash between the store append and the accepted append made the
  * replayed rows near-dups of their own prior insertion — they dropped
  * out and never reached the accepted sink).
  */
object SignatureStore {

  /** Banding parameters; MUST match between store build and probe
    * (defaults = the production 0.8-threshold regime of
    * `Similarity.nearDupPairsLsh`; fixture callers pin 16×1 per the
    * r2 banding-math note). */
  final case class Params(shingleK: Int = 3, nBands: Int = 8,
      rowsPerBand: Int = 2, nShards: Int = 32)

  /** Parallelize-first exchange for the kernel passes: fixture files
    * are single-row-group (one scan partition), and at scale the fan
    * spreads the shingle/minhash compute regardless of file layout. */
  private def fanned(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc"), col(textCol).as("__text"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("doc"))

  private def banded(df: DataFrame, idCol: String, textCol: String,
      p: Params): DataFrame = {
    val nHashes = p.nBands * p.rowsPerBand
    fanned(df, idCol, textCol)
      .select(col("doc"),
        Dedup.shingles(col("__text"), p.shingleK).as("sh"))
      .select(col("doc"),
        Dedup.minhashSignature(col("sh"), nHashes).as("sig"))
      .select(col("doc"),
        posexplode(transform(
          sequence(lit(0), lit(p.nBands - 1)),
          b => array_join(
            slice(col("sig"), b * p.rowsPerBand + 1, lit(p.rowsPerBand)), ":")))
          .as(Seq("band", "bucket")))
      .withColumn("shard", pmod(hash(col("bucket")), lit(p.nShards)))
  }

  private def shingleRows(df: DataFrame, idCol: String, textCol: String,
      p: Params): DataFrame =
    fanned(df, idCol, textCol)
      .select(col("doc"), Dedup.shingles(col("__text"), p.shingleK).as("sh"))

  /** One write of (banded index, shingle payload) under `ingest`.
    * `dynamicOverwrite = true` is the batch-replay mode: only the
    * partitions present in THIS data are replaced, so re-running the
    * same micro-batch overwrites its own prior (possibly partial)
    * output and touches nothing else. The index write re-exchanges on
    * `shard` so each shard directory gets one file per write, not one
    * per compute task. */
  private def writeAs(df: DataFrame, idCol: String, textCol: String,
      path: String, ingest: String, p: Params, mode: String,
      dynamicOverwrite: Boolean): Unit = {
    // writer-vs-compact exclusion: fail fast instead of writing into a
    // surface compact() is about to rename away (see StoreFs lease note)
    StoreFs.failIfLeased(df.sparkSession, lockPath(path),
      s"SignatureStore write (ingest=$ingest)")
    def w(out: DataFrame, parts: Seq[String], dest: String): Unit = {
      val writer = out.write.partitionBy(parts: _*).mode(mode)
      (if (dynamicOverwrite) writer.option("partitionOverwriteMode", "dynamic")
       else writer).parquet(dest)
    }
    w(banded(df, idCol, textCol, p).withColumn("ingest", lit(ingest))
        .repartition(p.nShards, col("shard")),
      Seq("ingest", "shard"), path + "/bands")
    w(shingleRows(df, idCol, textCol, p).withColumn("ingest", lit(ingest)),
      Seq("ingest"), path + "/shingles")
  }

  /** Build (or extend, with mode=append) the store from a document
    * frame — two linear passes over the input (banded index, then
    * shingle payload). */
  def write(df: DataFrame, idCol: String, textCol: String, path: String,
      p: Params = Params(), mode: String = "overwrite"): Unit =
    writeAs(df, idCol, textCol, path, "base", p, mode, dynamicOverwrite = false)

  /** Incremental index maintenance — new files land inside the existing
    * `ingest=base` directories, no reorganization (same posture as
    * `VectorStore.append`; run [[compact]] periodically). */
  def append(df: DataFrame, idCol: String, textCol: String, path: String,
      p: Params = Params()): Unit =
    write(df, idCol, textCol, path, p, mode = "append")

  /** Idempotent per-micro-batch write: both store surfaces land under
    * `ingest=<key>` with dynamic partition overwrite — replaying the
    * batch replaces its own partitions bit-for-bit. */
  private[graft] def appendBatch(df: DataFrame, idCol: String,
      textCol: String, path: String, ingest: String,
      p: Params = Params()): Unit =
    writeAs(df, idCol, textCol, path, ingest, p, mode = "overwrite",
      dynamicOverwrite = true)

  /** Stable per-stream key so ingest partitions from different streams
    * (whose batch ids both start at 0) can never collide: the streaming
    * checkpoint IS the batch-id namespace, so its path is the right
    * discriminator — a restart reuses the checkpoint and hence the same
    * keys (that is what makes replay land on its own partitions). */
  private def streamKey(checkpoint: String): String =
    Integer.toHexString(checkpoint.hashCode)

  /** Streaming ingest into the signature store (AvailableNow drain —
    * the reference's drain-then-stop shape). Replay-idempotent: each
    * batch writes its own `ingest` partitions with dynamic overwrite. */
  def appendStream(stream: DataFrame, idCol: String, textCol: String,
      path: String, checkpoint: String,
      p: Params = Params()): org.apache.spark.sql.streaming.StreamingQuery = {
    val key = streamKey(checkpoint)
    stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, idCol, textCol, path, s"b${batchId}_$key", p)
      }
      .start()
  }

  /** Near-dup pairs between a NEW batch and the persisted corpus:
    * (id_new, id_stored, jaccard ≥ threshold). The batch's banded rows
    * equi-join the store's banded index on (band, bucket) — restricted,
    * at planning time, to the shards the batch's buckets hash into —
    * then exact Jaccard verifies each surviving DISTINCT pair over
    * shingle sets (batch side recomputed, store side read from
    * `shingles/`). Never compares batch-internal pairs (run
    * `Dedup.minhashNearDups` on the batch for those).
    * `excludeIngest` drops one ingest partition from the probe's view —
    * [[ingestDedup]] passes the current batch's own key so a replay
    * decides against exactly the pre-batch store state.
    *
    * 100 TB cost: the candidate join ships only (band, bucket, id)
    * triples from the pruned shards; the driver materializes only the
    * DISTINCT shard list (≤ nShards ints). */
  def dedupAgainstStore(batch: DataFrame, idCol: String, textCol: String,
      path: String, p: Params = Params(),
      jaccardThreshold: Double = 0.8,
      excludeIngest: Option[String] = None): DataFrame =
    storePairsRaw(batch, idCol, textCol, path, p, excludeIngest)
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_new"), col("id_stored"),
        round(col("jaccard"), 6).as("jaccard"))

  /** The shard-pruned candidate join + exact-Jaccard verify shared by
    * [[dedupAgainstStore]] (raw-threshold, its long-standing contract)
    * and [[decontaminateAgainstStore]] (round-then-threshold, the q99
    * rule): (id_new, id_stored, jaccard) UNfiltered and UNrounded. */
  private def storePairsRaw(batch: DataFrame, idCol: String,
      textCol: String, path: String, p: Params,
      excludeIngest: Option[String]): DataFrame = {
    val spark = batch.sparkSession
    val dead = tombstones(spark, path)
    def visible(df: DataFrame): DataFrame = {
      val scoped =
        excludeIngest.fold(df)(ex => df.filter(col("ingest") =!= lit(ex)))
      // logically deleted docs never act as dedup evidence
      dead.fold(scoped)(t =>
        scoped.join(broadcast(t.toDF("doc")), Seq("doc"), "left_anti"))
    }
    val batchBanded = banded(batch, idCol, textCol, p)
    val shards = batchBanded.select(col("shard")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val stored = visible(spark.read.parquet(path + "/bands"))
      .filter(col("shard").isin(shards: _*))
    val candidates = batchBanded
      .select(col("band"), col("bucket"), col("doc").as("id_new"))
      .join(stored.select(col("band"), col("bucket"), col("doc").as("id_stored")),
        Seq("band", "bucket"))
      .select(col("id_new"), col("id_stored"))
      .distinct()
    val batchSh = shingleRows(batch, idCol, textCol, p)
    candidates
      .join(batchSh.select(col("doc").as("id_new"), col("sh").as("__sha")), "id_new")
      .join(visible(spark.read.parquet(path + "/shingles"))
        .select(col("doc").as("id_stored"), col("sh").as("__shb")), "id_stored")
      .withColumn("jaccard", Dedup.jaccard(col("__sha"), col("__shb")))
  }

  /** Store-to-store decontamination — the batch form of the
    * contamination surfaces (q63/q84/q99/q127/q185) when the BENCHMARK
    * lives as a persisted SignatureStore rather than a frame: eval
    * suites are curated once and probed by every pretraining run, so
    * the production shape is "corpus vs committed store", not "corpus
    * vs recomputed frame". Flags corpus documents that near-dup-match
    * (exact Jaccard ≥ `jaccardThreshold` over word k-shingle sets) any
    * COMMITTED, non-tombstoned benchmark document, reading only the
    * shards the corpus's candidate buckets hash into (the
    * [[dedupAgainstStore]] partition-pruned probe). Semantics are
    * IDENTICAL to `Curation.decontaminateFuzzy(corpus, benchFrame)` at
    * the same `Params` — same banding, same round-BEFORE-threshold
    * keep rule (the q99 bit-stability discipline), same output
    * (id, n_matches, max_jaccard) — spec-pinned equal; a tombstoned
    * benchmark doc stops flagging immediately (the delete contract).
    * 100 TB posture: the benchmark side is eval-suite-sized by
    * construction; the corpus side streams through one banded pass +
    * the pruned equi-join, shingle payloads late-materialized per
    * surviving DISTINCT pair. */
  def decontaminateAgainstStore(corpus: DataFrame, idCol: String,
      textCol: String, path: String, p: Params = Params(),
      jaccardThreshold: Double = 0.8): DataFrame =
    storePairsRaw(corpus, idCol, textCol, path, p, None)
      .withColumn("__j", round(col("jaccard"), 6))
      .filter(col("__j") >= jaccardThreshold)
      .groupBy(col("id_new"))
      .agg(count(lit(1)).as("n_matches"), max(col("__j")).as("max_jaccard"))
      .select(col("id_new").as(idCol), col("n_matches"), col("max_jaccard"))

  /** The store read a probe performs, exposed for plan inspection
    * (the spec asserts `PartitionFilters` carries the shard filter). */
  def readShards(spark: SparkSession, path: String, shards: Seq[Int]): DataFrame =
    spark.read.parquet(path + "/bands").filter(col("shard").isin(shards: _*))

  /** [[StoreFs.hasCommittedData]] — kept as the store's own vocabulary;
    * goes through the Hadoop `FileSystem` so a store rooted at
    * `hdfs://`/`s3a://` probes correctly (r10 verdict: the old
    * `java.io.File` form was a real 100 TB blocker). */
  private[graft] def hasCommittedData(spark: SparkSession, dir: String): Boolean =
    StoreFs.hasCommittedData(spark, dir)

  /** The keep decision for one micro-batch: collapse exact within-batch
    * duplicates (deterministic keep-lowest-id), then drop documents
    * that near-dup-match the ALREADY-COMMITTED corpus — excluding this
    * batch's own ingest partition, so a crash-replay decides against
    * exactly the same store state the original attempt saw.
    * `localCheckpoint` because both sink writes scan the result and the
    * second must not recompute against a store the first just changed. */
  private[graft] def decideKept(batch: DataFrame, ingest: String,
      idCol: String, textCol: String, path: String, p: Params,
      jaccardThreshold: Double): DataFrame = {
    val exact = Dedup.exact(batch, idCol, textCol)
    val keep =
      if (!hasCommittedData(batch.sparkSession, path + "/bands")) exact
      else {
        val dupIds = dedupAgainstStore(exact, idCol, textCol, path, p,
          jaccardThreshold, excludeIngest = Some(ingest))
          .select(col("id_new").as(idCol)).distinct()
        exact.join(dupIds, Seq(idCol), "left_anti")
      }
    keep.localCheckpoint()
  }

  /** One micro-batch of [[ingestDedup]], exposed so the crash-replay
    * spec can reproduce a partial state (store written, accepted sink
    * not) and then replay. Both writes are keyed by `ingest` and
    * overwrite their own partitions, so any replay — after a crash
    * between the two writes included — converges to exactly one copy
    * of every survivor in both sinks. */
  private[graft] def processBatch(batch: DataFrame, ingest: String,
      idCol: String, textCol: String, path: String, acceptedPath: String,
      p: Params, jaccardThreshold: Double): Unit = {
    val kept = decideKept(batch, ingest, idCol, textCol, path, p,
      jaccardThreshold)
    if (!kept.isEmpty) {
      appendBatch(kept, idCol, textCol, path, ingest, p)
      kept.write.mode("overwrite").parquet(acceptedPath + "/ingest=" + ingest)
    }
  }

  /** The daily operation end-to-end, streaming: drain `stream` with
    * AvailableNow, and for each micro-batch KEEP only documents that
    * are NOT near-dups of the already-ingested corpus — survivors are
    * written to both the signature store and `acceptedPath`, so a
    * re-ingest of the same data inserts nothing (the exact failure the
    * reference ships, `src/rag/sqlx.rs:34-45`: its ingest re-inserts
    * every row). Batch→batch ordering is serial under AvailableNow.
    *
    * Crash-replay idempotence (the r8 defect, fixed): both sinks are
    * written under the batch's own `ingest=` partition with dynamic
    * overwrite, and the keep DECISION excludes that partition from the
    * store it reads — so a replayed batch re-derives the identical
    * survivor set and overwrites its own partitions, whether the crash
    * hit before, between, or after the two writes. */
  def ingestDedup(stream: DataFrame, idCol: String, textCol: String,
      path: String, acceptedPath: String, checkpoint: String,
      p: Params = Params(), jaccardThreshold: Double = 0.8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val key = streamKey(checkpoint)
    stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, s"b${batchId}_$key", idCol, textCol, path,
          acceptedPath, p, jaccardThreshold)
      }
      .start()
  }

  /** Compact the store in place: rewrite both surfaces into the single
    * `ingest=base` partition at one file per shard (bands) / a bounded
    * file count (shingles). A daily [[appendStream]]/[[ingestDedup]]
    * accretes one ingest partition with up-to-nShards files per batch;
    * probe scans degrade with file count even when pruning works —
    * compaction restores the bulk-build layout with BIT-IDENTICAL probe
    * results (same rows, same schema; spec-asserted). Stage-then-swap:
    * the rewrite lands in a sibling staging dir, then replaces the live
    * dir via the Hadoop FileSystem (works on local FS and HDFS alike).
    * WRITERS are excluded for the duration by the `_compact_lock`
    * lease — a racing [[append]]/[[appendBatch]]/[[delete]] fails fast
    * with a clear error instead of writing into a surface mid-swap (a
    * write landing in the no-live window would even recreate the live
    * path and break the swap's rename). A compactor CRASH leaves the
    * lease in place: writers keep failing until [[recover]] clears it,
    * and a fresh compact() REFUSES the held lease too (the acquire is
    * atomic `create(overwrite=false)` — two concurrent compactions can
    * no longer both "own" the store) — recover() is the one gate back.
    * Concurrent
    * PROBES are fine under the [[withReadRetry]] reader contract (the
    * swap's transient windows retry; results are bit-identical either
    * side). */
  def compact(spark: SparkSession, path: String, p: Params = Params()): Unit = {
    StoreFs.acquireLease(spark, lockPath(path))
    // apply pending deletes physically on both surfaces, reading a
    // SNAPSHOT of the tombstone dir's files taken now — a delete()
    // racing past the lease's probe window appends a NEW file, which
    // this compaction neither applies nor removes: it stays in force
    // (probes keep masking) and the next compaction applies it. The
    // snapshot files are removed only AFTER both swaps commit, so a
    // crash between them leaves the delete still logically in force
    // and a re-run re-applies it as a no-op.
    val tsFiles = StoreFs.listDataFiles(spark, tombstoneDir(path))
    val dead =
      if (tsFiles.isEmpty) None
      else Some(spark.read.parquet(tsFiles: _*).distinct())
    def cleaned(src: DataFrame): DataFrame =
      dead.fold(src)(t =>
        src.join(broadcast(t.toDF("doc")), Seq("doc"), "left_anti"))
    stageAndSwap(spark, path + "/bands") { (src, staged) =>
      cleaned(src.select(col("doc"), col("band"), col("bucket"), col("shard")))
        .withColumn("ingest", lit("base"))
        .repartition(p.nShards, col("shard"))
        .write.partitionBy("ingest", "shard").mode("overwrite").parquet(staged)
    }
    stageAndSwap(spark, path + "/shingles") { (src, staged) =>
      cleaned(src.select(col("doc"), col("sh")))
        .withColumn("ingest", lit("base"))
        .repartition(spark.sparkContext.defaultParallelism)
        .write.partitionBy("ingest").mode("overwrite").parquet(staged)
    }
    // remove ONLY the snapshot's files: a tombstone appended after the
    // snapshot survives to the next compaction instead of being wiped
    // unapplied (the delete-vs-compact race)
    tsFiles.foreach { f =>
      val (fs, hp) = StoreFs.fileSystem(spark, f)
      fs.delete(hp, false)
    }
    // then clear the write-protocol debris (_SUCCESS etc.) and the dir
    // itself NON-recursively — rmdir on a non-empty dir fails atomically,
    // so a late tombstone file keeps the dir (and itself) alive
    val (tfs, hDir) = StoreFs.fileSystem(spark, tombstoneDir(path))
    if (tfs.exists(hDir)) {
      tfs.listStatus(hDir).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && (n.startsWith("_") || n.startsWith(".")))
          tfs.delete(st.getPath, false)
      }
      try tfs.delete(hDir, false)
      catch { case _: java.io.IOException => () } // non-empty: keep it
    }
    StoreFs.releaseLease(spark, lockPath(path))
  }

  private def lockPath(path: String): String = path + "/_compact_lock"

  /** Logical delete of documents from the store (the right-to-be-
    * forgotten path): ids land in `_tombstones/` under the store root
    * (hidden from every store scan by the `_` prefix), probes exclude
    * them immediately ([[dedupAgainstStore]] — a deleted doc never
    * acts as dedup evidence), and [[compact]] removes the rows from
    * both surfaces physically and clears the tombstones. Same contract
    * as `VectorStore.delete`: a single id column; ids not present are
    * harmless; a tombstone wins over any later append of the same doc
    * until compaction.
    *
    * Operational posture: the pending set rides every probe as a
    * BROADCAST anti-join — the same bounded-set bet as the hot-key
    * caches. Past ~10⁶ pending ids the broadcast (and its per-probe
    * rebuild) stops being noise: that is the signal that [[compact]]
    * is due, which applies the deletes physically and empties the
    * set. */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    require(ids.columns.length == 1,
      s"delete expects a single id column, got ${ids.columns.mkString(",")}")
    StoreFs.failIfLeased(spark, lockPath(path), "SignatureStore delete")
    val dir = tombstoneDir(path)
    // mixed column names across delete calls would append mixed-schema
    // parquet files whose non-mergeSchema read returns NULL ids for one
    // of them — those deletes would silently stop masking probes; the
    // same check VectorStore.delete makes
    if (StoreFs.hasCommittedData(spark, dir)) {
      val existing = spark.read.parquet(dir).columns.head
      require(existing == ids.columns.head,
        s"tombstone id column mismatch: store has '$existing', " +
          s"delete got '${ids.columns.head}'")
    }
    ids.distinct().write.mode("append").parquet(dir)
  }

  private def tombstoneDir(path: String): String = path + "/_tombstones"

  private[graft] def tombstones(spark: SparkSession,
      path: String): Option[DataFrame] = {
    val dir = tombstoneDir(path)
    if (StoreFs.hasCommittedData(spark, dir))
      Some(spark.read.parquet(dir).distinct())
    else None
  }

  /** Reader contract for probes running CONCURRENTLY with [[compact]]:
    * wrap the whole probe — building the read AND running the action —
    * in this retry. The swap's no-live window is two directory renames
    * (milliseconds), but a reader can catch it (PATH_NOT_FOUND), or
    * hold a pre-swap file listing whose files disappear mid-scan
    * (FileNotFoundException) — both transient, both retried with a
    * session file-cache refresh of the store's two surfaces
    * ([[StoreFs.retryingRead]]). Probe results are bit-identical
    * before/after compaction, so WHICH side of the swap a retry lands
    * on is invisible. After a compactor CRASH (not a race) the no-live
    * state is permanent — run [[recover]] instead. */
  def withReadRetry[T](spark: SparkSession, path: String,
      attempts: Int = 6)(thunk: => T): T =
    StoreFs.retryingRead(spark,
      Seq(path + "/bands", path + "/shingles"), attempts)(thunk)

  /** Test-only pause hook for [[stageAndSwap]]'s between-renames
    * window: the concurrent-reader spec holds the swap open here (live
    * dir absent) while a racing probe exercises [[withReadRetry]].
    * Null latches = zero-cost no-op in production. */
  private[graft] object SwapPause {
    @volatile var entered: java.util.concurrent.CountDownLatch = null
    @volatile var gate: java.util.concurrent.CountDownLatch = null
    // second pause point: staged dir written, live not yet moved out —
    // the delete-vs-compact race spec injects a post-snapshot tombstone
    // here (it must survive the swap, not be wiped unapplied)
    @volatile var enteredStage: java.util.concurrent.CountDownLatch = null
    @volatile var gateStage: java.util.concurrent.CountDownLatch = null
    def maybePause(): Unit = {
      val e = entered
      if (e != null) e.countDown()
      val g = gate
      if (g != null) g.await()
    }
    def maybePauseStaged(): Unit = {
      val e = enteredStage
      if (e != null) e.countDown()
      val g = gateStage
      if (g != null) g.await()
    }
    def reset(): Unit = {
      entered = null; gate = null; enteredStage = null; gateStage = null
    }
  }

  /** Test-only crash injection for [[stageAndSwap]] (0 = off) — the
    * compaction crash-replay spec kills the swap at each window and
    * asserts recovery converges to one committed layout. */
  private[graft] object SwapCrash {
    final val AfterStage = 1   // staged dir written, live untouched
    final val AfterMoveOut = 2 // live moved to .trash, staged not yet live
    final val AfterSwapIn = 3  // staged now live, .trash not yet deleted
    @volatile var point: Int = 0
    // which stageAndSwap invocation fires (1-based) — SignatureStore
    // compaction swaps bands then shingles; 2 targets the shingles swap
    @volatile var fireAtCall: Int = 1
    private val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    final class Injected extends RuntimeException("injected swap crash")
    private[sources] def begin(): Unit = calls.incrementAndGet()
    def maybe(p: Int): Unit =
      if (point == p && calls.get() == fireAtCall) throw new Injected
    def reset(): Unit = { point = 0; fireAtCall = 1; calls.set(0) }
  }

  /** Read `live`, write its replacement to `<live>.compact` via
    * `rewrite`, then swap the staged dir into place.
    *
    * The swap is TWO atomic renames (live → `.trash`, staged → live)
    * with the delete deferred to last — there is no instant at which
    * both copies are gone (the old single delete-then-rename had a
    * window where a crash lost the live dir with nothing marking the
    * staged dir as adoptable). Every crash window leaves a state
    * [[recoverSwap]] resolves; it runs at entry, so re-running
    * compaction after any crash self-heals first.
    *
    * `beforeTrashDelete` (optional) runs after the staged dir is live
    * and before the trash delete — `VectorStore.compact` uses it to
    * rescue tombstone files appended after its snapshot, which ride
    * the old live dir into `.trash` (its tombstone dir lives INSIDE
    * the swapped dir). A crash inside that window still loses them
    * (recovery deletes the trash) — the lease makes that a
    * crash-during-race residual, not a normal-operation loss. */
  private[graft] def stageAndSwap(spark: SparkSession, live: String,
      beforeTrashDelete: () => Unit = null)(
      rewrite: (DataFrame, String) => Unit): Unit = {
    val hLive = new org.apache.hadoop.fs.Path(live)
    val fs = hLive.getFileSystem(spark.sessionState.newHadoopConf())
    SwapCrash.begin()
    recoverSwap(fs, live)
    val staged = live + ".compact"
    rewrite(spark.read.parquet(live), staged)
    SwapCrash.maybe(SwapCrash.AfterStage)
    SwapPause.maybePauseStaged()
    val hStaged = new org.apache.hadoop.fs.Path(staged)
    val hTrash = new org.apache.hadoop.fs.Path(live + ".trash")
    require(fs.rename(hLive, hTrash),
      s"compaction swap failed: move-out $live")
    SwapCrash.maybe(SwapCrash.AfterMoveOut)
    SwapPause.maybePause()
    require(fs.rename(hStaged, hLive),
      s"compaction swap failed: rename $staged -> $live")
    if (beforeTrashDelete != null) beforeTrashDelete()
    SwapCrash.maybe(SwapCrash.AfterSwapIn)
    fs.delete(hTrash, true)
  }

  /** Complete or clean an interrupted [[stageAndSwap]]. Crash-window
    * states and their resolution:
    *  - live + `.compact`: crash during/after staging — the staged dir
    *    is untrusted debris (its write may be partial); drop it.
    *  - no live + `.compact`: crash between the renames — the staged
    *    dir is COMPLETE (the move-out only runs after a successful
    *    rewrite); adopt it as live.
    *  - no live + no `.compact` + `.trash`: defensive — restore trash.
    *  - live + `.trash`: crash before the final delete; drop trash.
    * After this, exactly one committed layout exists at `live`. */
  private[graft] def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
      live: String): Unit = {
    val hLive = new org.apache.hadoop.fs.Path(live)
    val hStaged = new org.apache.hadoop.fs.Path(live + ".compact")
    val hTrash = new org.apache.hadoop.fs.Path(live + ".trash")
    if (!fs.exists(hLive)) {
      if (fs.exists(hStaged))
        require(fs.rename(hStaged, hLive),
          s"swap recovery failed: adopt ${live}.compact")
      else if (fs.exists(hTrash))
        require(fs.rename(hTrash, hLive),
          s"swap recovery failed: restore ${live}.trash")
    } else if (fs.exists(hStaged)) {
      fs.delete(hStaged, true)
    }
    if (fs.exists(hLive)) fs.delete(hTrash, true)
  }

  /** Recover an interrupted [[compact]] without compacting again:
    * completes or cleans any half-finished stage-then-swap on both
    * store surfaces, and clears the crashed compactor's writer lease
    * so appends/deletes stop failing fast. Safe whenever compaction is
    * not running — readers hitting a missing live dir after a crash
    * call this first. */
  def recover(spark: SparkSession, path: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    Seq(path + "/bands", path + "/shingles").foreach { live =>
      val h = new org.apache.hadoop.fs.Path(live)
      recoverSwap(h.getFileSystem(conf), live)
    }
    StoreFs.releaseLease(spark, lockPath(path))
  }
}
