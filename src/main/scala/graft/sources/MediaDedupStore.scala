package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ingest-dedup for MEDIA binaries — the multimodal member
  * of the ST7 family: where [[SignatureStore.ingestDedup]] keeps a
  * document stream near-dup-free against a persisted MinHash corpus,
  * this keeps an image/audio binary stream near-dup-free against a
  * persisted PERCEPTUAL-HASH corpus (dHash for images, envelope bits
  * for audio — [[Multimodal.imageDHash]] / [[Multimodal.audioFingerprint]]).
  *
  * Store layout: `<path>/ingest=<key>/…` parquet rows
  * (doc, sig, band, bucket) — the 64-bit signature exploded into its
  * four 16-bit bands, so a probe equi-joins on (band, bucket) and
  * verifies hamming on the sigs RIDING the join (the r11
  * verify-before-dedup lesson: every duplicate of a candidate pair
  * carries the same two sigs). Candidate recall is pigeonhole-complete
  * at `maxHamming` ≤ 3, the family contract.
  *
  * Crash-replay idempotence is inherited wholesale from the
  * SignatureStore contract (the r8/r9 design): each micro-batch writes
  * BOTH sinks under its own `ingest=b<id>_<checkpoint-hash>` partition
  * with dynamic partition overwrite, and the keep DECISION excludes
  * that partition from the store it reads — a replayed batch re-derives
  * the identical survivor set against exactly the pre-batch store state
  * and overwrites only its own output, whether the crash hit before,
  * between, or after the two writes.
  */
object MediaDedupStore {

  /** Perceptual 64-bit hash of a media binary: images via dHash, then
    * audio via the envelope fingerprint; `None` if neither decodes. */
  def mediaHash(content: Array[Byte]): Option[Long] =
    Multimodal.imageDHash(content)
      .orElse(Multimodal.audioFingerprint(content))

  /** (doc = path, sig) for every decodable media binary. */
  def hashBinaries(spark: SparkSession, binaries: DataFrame): DataFrame = {
    import spark.implicits._
    binaries.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, c) =>
        mediaHash(c).map(h => (p, h))
      })
      .toDF("doc", "sig")
  }

  private def banded(sigs: DataFrame): DataFrame =
    sigs.select(col("doc"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), 16 * b).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "bucket")))

  private def streamKey(checkpoint: String): String =
    Integer.toHexString(checkpoint.hashCode)

  /** Idempotent per-micro-batch store write: this batch's partition is
    * replaced, nothing else is touched. Fails fast while a [[compact]]
    * holds the store lease (writer-vs-compact exclusion — a write
    * landing in the swap's no-live window would recreate the live path
    * and break the rename). */
  private[graft] def appendBatch(sigs: DataFrame, path: String,
      ingest: String): Unit = {
    StoreFs.failIfLeased(sigs.sparkSession, lockPath(path),
      s"MediaDedupStore write (ingest=$ingest)")
    banded(sigs).withColumn("ingest", lit(ingest))
      .write.partitionBy("ingest").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(path)
  }

  /** Near-dup pairs between a batch's signatures and the committed
    * store: band-bucket candidates, hamming verified BEFORE the
    * distinct (sigs ride the join). `excludeIngest` scopes a replay to
    * the pre-batch store state. */
  private[graft] def dedupAgainstStore(sigs: DataFrame, path: String,
      maxHamming: Int, excludeIngest: Option[String]): DataFrame = {
    val spark = sigs.sparkSession
    val stored0 = spark.read.parquet(path)
    val scoped = excludeIngest
      .fold(stored0)(ex => stored0.filter(col("ingest") =!= lit(ex)))
    // logically deleted media never act as dedup evidence — the
    // right-to-be-forgotten contract: a tombstoned image/clip cannot
    // keep suppressing re-ingests of similar content
    val stored = tombstones(spark, path).fold(scoped)(t =>
      scoped.join(broadcast(t.toDF("doc")), Seq("doc"), "left_anti"))
    banded(sigs)
      .select(col("band"), col("bucket"), col("doc").as("id_new"),
        col("sig").as("__sa"))
      .join(stored.select(col("band"), col("bucket"),
        col("doc").as("id_stored"), col("sig").as("__sb")),
        Seq("band", "bucket"))
      .withColumn("hamming", graft.operators.Dedup.hamming(col("__sa"), col("__sb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_new"), col("id_stored"), col("hamming"))
      .distinct()
  }

  /** One micro-batch: hash, collapse exact (same-sig) duplicates
    * within the batch keeping the lowest path, drop near-dups of the
    * already-committed corpus (excluding this batch's own partition),
    * then write survivors to both sinks under the batch's key. */
  private[graft] def processBatch(batch: DataFrame, ingest: String,
      path: String, acceptedPath: String, maxHamming: Int): Unit = {
    val spark = batch.sparkSession
    val sigs = hashBinaries(spark, batch)
    val exact = sigs.groupBy(col("sig")).agg(min(col("doc")).as("doc"))
      .select(col("doc"), col("sig"))
    val keep =
      if (!StoreFs.hasCommittedData(spark, path)) exact
      else {
        val dupIds = dedupAgainstStore(exact, path, maxHamming,
          excludeIngest = Some(ingest))
          .select(col("id_new").as("doc")).distinct()
        exact.join(dupIds, Seq("doc"), "left_anti")
      }
    val kept = keep.localCheckpoint() // both sinks scan it; the second
                                      // must not recompute against a
                                      // store the first just changed
    if (!kept.isEmpty) {
      appendBatch(kept, path, ingest)
      kept.write.mode("overwrite").parquet(acceptedPath + "/ingest=" + ingest)
    }
  }

  /** Drain a binary stream with AvailableNow, keeping only media whose
    * perceptual hash is NOT within `maxHamming` of anything already
    * committed — survivors land in the store and `acceptedPath`. */
  def ingestDedup(stream: DataFrame, path: String, acceptedPath: String,
      checkpoint: String, maxHamming: Int = 3)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val key = streamKey(checkpoint)
    stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, s"b${batchId}_$key", path, acceptedPath,
          maxHamming)
      }
      .start()
  }

  // --- maintenance: delete / compact / retry / recover ------------------
  //
  // The full store-maintenance contract its siblings carry
  // (SignatureStore / VectorStore), inherited verbatim: without it the
  // store accretes one `ingest=b<id>_<hash>` partition per micro-batch
  // FOREVER (probe cost and file counts grow without bound), and media —
  // images of people — could never be forgotten.

  private def lockPath(path: String): String = path + ".compact_lock"
  private def tombstoneDir(path: String): String = path + "/_tombstones"

  /** Logical delete of media (by `doc` path id) — the right-to-be-
    * forgotten path: ids land in `_tombstones/` under the store root
    * (hidden from store scans by the `_` prefix), probes exclude them
    * immediately (a deleted clip never acts as dedup evidence), and
    * [[compact]] removes the rows physically and clears the tombstones.
    * Same contract as `SignatureStore.delete`: single id column (named
    * `doc`, the store's id column — mixed names would append
    * mixed-schema parquet whose read silently NULLs one side); absent
    * ids are harmless; a tombstone wins over later appends of the same
    * doc until compaction. */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    require(ids.columns.length == 1,
      s"delete expects a single id column, got ${ids.columns.mkString(",")}")
    StoreFs.failIfLeased(spark, lockPath(path), "MediaDedupStore delete")
    val dir = tombstoneDir(path)
    if (StoreFs.hasCommittedData(spark, dir)) {
      val existing = spark.read.parquet(dir).columns.head
      require(existing == ids.columns.head,
        s"tombstone id column mismatch: store has '$existing', " +
          s"delete got '${ids.columns.head}'")
    }
    ids.distinct().write.mode("append").parquet(dir)
  }

  private[graft] def tombstones(spark: SparkSession,
      path: String): Option[DataFrame] = {
    val dir = tombstoneDir(path)
    if (StoreFs.hasCommittedData(spark, dir))
      Some(spark.read.parquet(dir).distinct())
    else None
  }

  /** Compact the store in place: collapse every per-batch `ingest=`
    * partition into the single `ingest=base` partition at a bounded
    * file count, applying pending tombstones physically — probe results
    * are BIT-IDENTICAL across the rewrite (spec-asserted). Stage-then-
    * swap via `SignatureStore.stageAndSwap` (two atomic renames, crash
    * windows recovered by [[recover]]); writers are excluded for the
    * duration by the sibling `<path>.compact_lock` lease (outside the
    * store dir — the store dir itself is what the swap renames) and a
    * concurrent compact() is refused at the atomic acquire. Tombstone
    * files are snapshotted at entry; one appended mid-compaction is
    * rescued out of `.trash` by the shared `beforeTrashDelete` hook and
    * stays in force for the next compaction (the delete-vs-compact race
    * contract). Concurrent probes ride [[withReadRetry]]. */
  def compact(spark: SparkSession, path: String): Unit = {
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
          src.join(broadcast(t.toDF("doc")), Seq("doc"), "left_anti"))
        cleaned.select(col("doc"), col("sig"), col("band"), col("bucket"))
          .withColumn("ingest", lit("base"))
          .repartition(spark.sparkContext.defaultParallelism)
          .write.partitionBy("ingest").mode("overwrite").parquet(staged)
    }
    StoreFs.releaseLease(spark, lockPath(path))
  }

  /** Reader contract for probes racing [[compact]] — wrap plan
    * construction AND the action; transient swap-window read errors
    * retry with a file-cache refresh. After a compactor CRASH run
    * [[recover]] instead (the no-live state is then permanent). */
  def withReadRetry[T](spark: SparkSession, path: String,
      attempts: Int = 6)(thunk: => T): T =
    StoreFs.retryingRead(spark, Seq(path), attempts)(thunk)

  /** Recover an interrupted [[compact]]: complete or clean the
    * half-finished swap and clear the crashed compactor's lease. */
  def recover(spark: SparkSession, path: String): Unit = {
    val h = new org.apache.hadoop.fs.Path(path)
    SignatureStore.recoverSwap(
      h.getFileSystem(spark.sessionState.newHadoopConf()), path)
    StoreFs.releaseLease(spark, lockPath(path))
  }
}
