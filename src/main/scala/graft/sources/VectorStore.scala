package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Persisted vector store with a partition-pruned probe path — the
  * disk-layout upgrade of the reference's pgvector table
  * (`src/rag/sqlx.rs:42`, read back whole by `SELECT *`,
  * `src/rag/sqlx.rs:84-92`) for a corpus where "read back whole" is
  * 100 TB. Vectors are written `partitionBy` their hyperplane-LSH
  * bucket, so a probe reads ONLY its own bucket directory plus the
  * `nprobe` hamming-adjacent ones: Catalyst prunes every other
  * partition at planning time (`PartitionFilters` on the scan — the
  * spec asserts it), and the exact-rerank cosine join runs over
  * buckets/2^bits of the data instead of all of it.
  *
  * The bucket function is the same deterministic hyperplane signature
  * the in-memory ANN path uses (`Similarity.annJoin`), so recall
  * behavior is identical; the store only changes WHERE the candidate
  * set lives (directory layout vs a shuffled join side).
  */
object VectorStore {

  /** Bucket id: the `nBits`-bit hyperplane signature packed MSB-first
    * into an int (0 .. 2^nBits-1). One kernel pass per row — the
    * sum-of-element_at formulation re-evaluated the signature kernel
    * nBits times on the full-corpus write path. */
  def bucketOf(vec: Column, nBits: Int): Column =
    graft.expressions.VectorExpressions.hyperplaneBucket(vec, nBits)

  /** Write the corpus partitioned by bucket. At scale each bucket
    * directory holds ~N/2^nBits vectors; `nBits` sizes the pruning
    * ratio (4 bits → 16 directories → a 1-probe read touches ~6% of
    * the store). */
  def write(df: DataFrame, idCol: String, vecCol: String, path: String,
      nBits: Int = 4): Unit = {
    StoreFs.failIfLeased(df.sparkSession, lockPath(path), "VectorStore write")
    df.select(col(idCol), col(vecCol),
        bucketOf(col(vecCol), nBits).as("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)
  }

  /** Incremental index maintenance: append a (micro-)batch of vectors
    * — same layout, same bucket function, new files land inside the
    * existing bucket directories, so probes see them with no
    * reorganization. This is the `foreachBatch` body of a streaming
    * ingest ([[appendStream]]); idempotence across batch replays comes
    * from the streaming checkpoint, as in `Streams.runIngest`. */
  def append(df: DataFrame, idCol: String, vecCol: String, path: String,
      nBits: Int = 4): Unit = {
    StoreFs.failIfLeased(df.sparkSession, lockPath(path), "VectorStore append")
    df.select(col(idCol), col(vecCol),
        bucketOf(col(vecCol), nBits).as("bucket"))
      .write.partitionBy("bucket").mode("append").parquet(path)
  }

  /** Streaming index build: drain `stream` into the store with
    * AvailableNow (the reference's drain-then-stop ingest shape,
    * `src/signal/poll.rs` per SURVEY §2.8). A store built by streaming
    * micro-batches equals a batch-built store — asserted in
    * VectorStoreSpec. */
  def appendStream(stream: DataFrame, idCol: String, vecCol: String,
      path: String, checkpoint: String,
      nBits: Int = 4): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        append(batch, idCol, vecCol, path, nBits)
      }
      .start()

  // --- deletes (tombstones) --------------------------------------------

  /** Logical delete: append the ids to `_tombstones/` under the store
    * root — the `_` prefix hides them from every parquet scan of the
    * store itself, the same visibility rule the write path's
    * `_temporary` debris relies on. Probes ([[topK]],
    * [[topKQuantizedApprox]]/[[topKQuantized]]) anti-join the
    * (bounded, broadcast) tombstone set, so a delete is visible
    * immediately without touching any data file — the
    * right-to-be-forgotten shape at 100 TB, where rewriting a bucket
    * per delete is not an option. [[compact]] applies tombstones
    * PHYSICALLY (the rewrite drops the rows and the swap discards the
    * tombstone dir with the old layout), which is also the reset that
    * allows re-inserting a previously deleted id: until then a
    * tombstone wins over any later [[append]] of the same id.
    * `ids` must be a single column carrying the store's id column
    * name (the natural shape — probe outputs feed deletes). Ids not
    * present in the store are harmless.
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
    StoreFs.failIfLeased(spark, lockPath(path), "VectorStore delete")
    val dir = tombstoneDir(path)
    if (StoreFs.hasCommittedData(spark, dir)) {
      val existing = spark.read.parquet(dir).columns.head
      require(existing == ids.columns.head,
        s"tombstone id column mismatch: store has '$existing', " +
          s"delete got '${ids.columns.head}'")
    }
    ids.distinct().write.mode("append").parquet(dir)
  }

  private def tombstoneDir(path: String): String = path + "/_tombstones"

  /** The pending tombstone set (one column, the store's id column
    * name), or None when no delete is pending. Bounded by deletes
    * since the last compaction — the broadcast in the probes' anti-
    * join is the same bounded-set bet the hot-key caches make. */
  private[graft] def tombstones(spark: SparkSession,
      path: String): Option[DataFrame] = {
    val dir = tombstoneDir(path)
    if (StoreFs.hasCommittedData(spark, dir))
      Some(spark.read.parquet(dir).distinct())
    else None
  }

  /** Filter `df` to rows not logically deleted. The tombstone frame's
    * single column is renamed to `idCol`, so the caller's column
    * naming at probe time always wins. */
  private def withoutDeleted(spark: SparkSession, path: String,
      df: DataFrame, idCol: String): DataFrame =
    tombstones(spark, path).fold(df) { t =>
      df.join(broadcast(t.toDF(idCol)), Seq(idCol), "left_anti")
    }

  /** Compact the store in place: rewrite every bucket directory to ONE
    * file (all rows of a bucket hash to the same task under
    * `repartition(n, bucket)`, and each task writes one file per
    * partition directory it holds). A daily [[appendStream]] accretes
    * one file per (batch, bucket); probe scans degrade linearly with
    * file count even when partition pruning works — compaction restores
    * the bulk-build layout with BIT-IDENTICAL probe results (same rows,
    * same schema; spec-asserted). Works unchanged on the quantized
    * store: every non-partition column is passed through untouched.
    * Stage-then-swap via the Hadoop FileSystem (local FS and HDFS
    * alike). WRITERS are excluded for the duration by the sibling
    * `<path>.compact_lock` lease (outside the store dir — the store
    * dir itself is what the swap renames): a racing
    * [[write]]/[[append]]/[[delete]] fails fast with a clear error; a
    * compactor CRASH leaves the lease until [[recover]] clears it — a
    * fresh compact() REFUSES a held lease (atomic acquire, so two
    * concurrent compactions can never both own the store); recover()
    * is the one gate back. Concurrent PROBES are fine under
    * the [[withReadRetry]] reader contract. */
  def compact(spark: SparkSession, path: String, nBits: Int = 4,
      partCol: String = "bucket"): Unit = {
    StoreFs.acquireLease(spark, lockPath(path))
    // SNAPSHOT the tombstone files now: the staged rewrite applies
    // exactly these, and a delete() that raced past the lease probe
    // appends a NEW file that must be neither partially applied nor
    // discarded — the swap's beforeTrashDelete hook rescues any
    // non-snapshot tombstone file out of the trash into the new live
    // dir, so it stays in force until the next compaction.
    val tsDir = tombstoneDir(path)
    val tsFiles = StoreFs.listDataFiles(spark, tsDir)
    val snapNames =
      tsFiles.map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    val dead =
      if (tsFiles.isEmpty) None
      else Some(spark.read.parquet(tsFiles: _*).distinct())
    val rescueLateTombstones: () => Unit =
      () => StoreFs.rescueLateTombstones(spark, path, snapNames)
    SignatureStore.stageAndSwap(spark, path, rescueLateTombstones) {
      (src, staged) =>
        // apply the snapshot deletes physically: the staged layout drops
        // the tombstoned rows, and the swap discards the snapshot files
        // together with the old live dir — compaction is also the
        // delete-apply
        val cleaned = dead.fold(src) { t =>
          val idc = t.columns.head
          require(src.columns.contains(idc),
            s"tombstone column '$idc' not in store schema " +
              s"${src.columns.mkString(",")}")
          src.join(broadcast(t), Seq(idc), "left_anti")
        }
        cleaned.repartition(1 << nBits, col(partCol))
          .write.partitionBy(partCol).mode("overwrite").parquet(staged)
    }
    StoreFs.releaseLease(spark, lockPath(path))
  }

  private def lockPath(path: String): String = path + ".compact_lock"

  /** Reader contract for probes racing [[compact]]: wrap the whole
    * probe (plan construction + action) here — the swap's no-live
    * window and stale pre-swap file listings both surface as transient
    * read errors, retried with a file-cache refresh
    * ([[StoreFs.retryingRead]]). Probe results are bit-identical
    * before/after compaction. After a compactor CRASH run [[recover]]
    * instead — the no-live state is then permanent. */
  def withReadRetry[T](spark: SparkSession, path: String,
      attempts: Int = 6)(thunk: => T): T =
    StoreFs.retryingRead(spark, Seq(path), attempts)(thunk)

  /** Recover an interrupted [[compact]] without compacting again —
    * completes or cleans a half-finished stage-then-swap (see
    * `SignatureStore.recoverSwap` for the window-by-window states). */
  def recover(spark: SparkSession, path: String): Unit = {
    val h = new org.apache.hadoop.fs.Path(path)
    SignatureStore.recoverSwap(
      h.getFileSystem(spark.sessionState.newHadoopConf()), path)
    StoreFs.releaseLease(spark, lockPath(path))
  }

  /** The probe's bucket plus its `1+nBits` hamming≤1 neighbors —
    * multi-probe compensates for boundary vectors the way the
    * in-memory LSH path's extra bands do. */
  def probeBuckets(spark: SparkSession, probe: Seq[Double], nBits: Int = 4): Seq[Int] = {
    val vec = array(probe.map(lit): _*)
    val b = spark.range(1).select(bucketOf(vec, nBits).as("b")).head().getInt(0)
    b +: (0 until nBits).map(i => b ^ (1 << i))
  }

  /** Read ONLY the probe's bucket directories — the filter on the
    * partition column never touches row data (no bucket column exists
    * inside the files), so the scan's `PartitionFilters` does all the
    * work and pruned directories are never opened. */
  def readCandidates(spark: SparkSession, path: String,
      buckets: Seq[Int]): DataFrame =
    spark.read.parquet(path).filter(col("bucket").isin(buckets: _*))

  /** End-to-end probe: top-k by exact cosine over the pruned candidate
    * set. */
  def topK(spark: SparkSession, path: String, idCol: String, vecCol: String,
      probe: Seq[Double], k: Int, nBits: Int = 4): DataFrame = {
    val probeCol = array(probe.map(lit): _*)
    withoutDeleted(spark, path,
        readCandidates(spark, path, probeBuckets(spark, probe, nBits)), idCol)
      .select(col(idCol),
        VectorOps.cosine6(col(vecCol), probeCol).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  // --- int8-quantized store (4× smaller on disk) ----------------------

  /** Write the corpus int8-quantized: same partitionBy(bucket) layout,
    * but each vector is stored as 1 byte per dimension (packed BINARY
    * codes + per-vector affine vmin/scale — `Int8Encode` kernel, one
    * pass) instead of 4-byte floats. This is the "compress before
    * indexing" step a 100 TB embedding corpus takes: the probe scores
    * candidates from the codes directly and the exact vectors are only
    * fetched per surviving top-M id ([[topKQuantized]]). The bucket is
    * computed from the ORIGINAL vector, so pruning behavior is
    * identical to the full-precision store. */
  def writeQuantized(df: DataFrame, idCol: String, vecCol: String,
      path: String, nBits: Int = 4): Unit = {
    val enc = graft.expressions.VectorExpressions.int8Encode(col(vecCol))
    df.select(col(idCol),
        bucketOf(col(vecCol), nBits).as("bucket"),
        enc.getField("codes").as("codes"),
        enc.getField("vmin").as("vmin"),
        enc.getField("scale").as("scale"))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)
  }

  /** Approximate top-m over the quantized store: partition-pruned read,
    * cosine computed straight from the packed codes (`Int8Cosine`
    * kernel — dequantized values never materialize as an array). */
  def topKQuantizedApprox(spark: SparkSession, path: String, idCol: String,
      probe: Seq[Double], m: Int, nBits: Int = 4): DataFrame =
    withoutDeleted(spark, path,
        readCandidates(spark, path, probeBuckets(spark, probe, nBits)), idCol)
      .select(col(idCol),
        round(graft.expressions.VectorExpressions.int8Cosine(
          col("codes"), col("vmin"), col("scale"), probe), 6).as("qsim"))
      .orderBy(col("qsim").desc, col(idCol))
      .limit(m)

  /** Quantized-store probe with exact rerank: score candidates from the
    * codes, keep the approximate top-`m`, then fetch ONLY those `m`
    * full-precision vectors from `source` (the system of record) for
    * the exact top-`k`. At scale the quantized store is what gets
    * scanned; the exact side is a k-row broadcast-joined fetch. With
    * m ≥ candidate-set size this equals the full-precision [[topK]]
    * (spec-asserted); smaller m trades recall for fetch volume against
    * the quantization error bound (scale/2 per dimension). */
  def topKQuantized(spark: SparkSession, path: String, source: DataFrame,
      idCol: String, vecCol: String, probe: Seq[Double], k: Int,
      m: Int, nBits: Int = 4): DataFrame = {
    val probeCol = array(probe.map(lit): _*)
    val approx = topKQuantizedApprox(spark, path, idCol, probe, m, nBits)
    approx.join(source.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol),
        VectorOps.cosine6(col(vecCol), probeCol).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
