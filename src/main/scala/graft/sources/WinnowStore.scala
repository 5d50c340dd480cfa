package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Streaming winnowing (MOSS) fingerprint store — the incremental
  * continuation of `Dedup.winnowingFingerprints`/`winnowedNearDups`
  * (q170/q171), the ST7 pattern every other dedup family already has
  * (SignatureStore for MinHash, MediaDedupStore for perceptual hashes,
  * ParagraphStore for boilerplate df): each micro-batch's selected
  * fingerprints are matched against the committed store, emitted
  * near-dup PAIRS land beside it, and the batch's selections join the
  * store for future batches.
  *
  * Store layout under `path`: `ingest=<key>/shard=<s>/` parquet rows
  * (fp = selected 32-hex md5 fingerprint, doc = document id), shard =
  * pmod(hash(fp), nShards). Rows are (fp, doc) FACTS, not counts —
  * probes read them DISTINCT, so [[compact]]'s distinct fold into
  * `ingest=base` is probe-identical by construction.
  *
  * Matching semantics, pinned: a batch emits every pair (id_a < id_b,
  * at least one side in the batch) sharing ≥ `minShared` fingerprints
  * whose CUMULATIVE df (visible store + this batch) is ≤ `maxFpDf` —
  * the q171 rule applied to the corpus-so-far. Incremental posture
  * (the ParagraphStore precedent): a fingerprint whose df grows past
  * the cap in a LATER batch keeps the pairs it already produced —
  * early matches survive. [[matchStore]] runs the exact q171 matching
  * over the drained store (it shares `winnowedPairsFromSelections`
  * with the batch operator), so whole-corpus answers are available at
  * any time and are IDENTICAL to `Dedup.winnowedNearDups` on the same
  * documents (spec-asserted).
  *
  * Crash-replay idempotence is the SignatureStore contract verbatim:
  * both sinks write under the batch's own `ingest=b<id>_<ckpt-hash>`
  * partition with dynamic overwrite and the match decision EXCLUDES
  * that partition from the store it reads. Maintenance carries the
  * full store contract from birth: [[compact]] (stage-then-swap,
  * sibling lease), [[delete]] (tombstones by DOC id — a deleted
  * document stops matching immediately, applied physically at
  * compaction), [[withReadRetry]], [[recover]]. */
object WinnowStore {

  /** `k`/`w`/`nShards` MUST match between ingests of one store. */
  final case class Params(k: Int = 8, w: Int = 4, maxFpDf: Int = 64,
      minShared: Int = 30, nShards: Int = 32)

  private def lockPath(path: String): String = path + ".compact_lock"
  private def tombstoneDir(path: String): String = path + "/_tombstones"
  private def shardOf(fp: org.apache.spark.sql.Column, n: Int) =
    pmod(hash(fp), lit(n))
  private def streamKey(checkpoint: String): String =
    Integer.toHexString(checkpoint.hashCode)

  /** This batch's distinct (fp, doc) winnowed selections (q170's
    * selection stage verbatim). */
  private[graft] def batchSelections(batch: DataFrame, idCol: String,
      textCol: String, p: Params): DataFrame =
    Dedup.winnowedSelections(batch, idCol, textCol, p.k, p.w)
      .select(substring(col("__mk"), 1, 32).as("fp"), col("doc"))
      .distinct()

  /** Idempotent per-micro-batch store write; fails fast on the
    * compactor lease. */
  private[graft] def appendBatch(sel: DataFrame, path: String,
      ingest: String, p: Params): Unit = {
    StoreFs.failIfLeased(sel.sparkSession, lockPath(path),
      s"WinnowStore write (ingest=$ingest)")
    sel
      .withColumn("shard", shardOf(col("fp"), p.nShards))
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

  /** The store's visible distinct (fp, doc) rows: shard-pruned to the
    * probe's fingerprints when given, `excludeIngest` scopes a replay
    * to the pre-batch state, tombstoned DOCS never match. */
  private[graft] def visibleSelections(spark: SparkSession, path: String,
      p: Params, probeFps: Option[DataFrame],
      excludeIngest: Option[String]): DataFrame = {
    val stored0 = probeFps match {
      case Some(fps) =>
        val shards = fps
          .select(shardOf(col("fp"), p.nShards).as("s")).distinct()
          .collect().map(_.getInt(0)).toSeq
        spark.read.parquet(path).filter(col("shard").isin(shards: _*))
          .join(fps.select(col("fp")).distinct(), Seq("fp"), "left_semi")
      case None => spark.read.parquet(path)
    }
    val scoped = excludeIngest
      .fold(stored0)(ex => stored0.filter(col("ingest") =!= lit(ex)))
    val visible = tombstones(spark, path).fold(scoped)(t =>
      scoped.join(broadcast(t.toDF("doc")), Seq("doc"), "left_anti"))
    visible.select(col("fp"), col("doc")).distinct()
  }

  /** Cross-batch MOSS matching: pairs (id_a < id_b, n_shared ≥
    * minShared) over the cumulative-df-capped fingerprints, restricted
    * to pairs with at least one side IN THE BATCH (both-old pairs were
    * emitted by their own batches). */
  private[graft] def matchBatch(spark: SparkSession, sel: DataFrame,
      path: String, p: Params, excludeIngest: Option[String]): DataFrame = {
    val stored =
      if (StoreFs.hasCommittedData(spark, path))
        visibleSelections(spark, path, p, Some(sel), excludeIngest)
          .withColumn("__new", lit(false))
      else sel.limit(0).withColumn("__new", lit(false))
    // a doc re-ingested across batches: its stored rows duplicate the
    // batch rows — keep the NEW flag so the pair filter sees it once
    val union = sel.withColumn("__new", lit(true))
      .unionByName(stored.join(sel.select(col("doc")).distinct(),
        Seq("doc"), "left_anti"))
    val dfq = union.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
    val kept = union.join(dfq.hint("merge"), Seq("fp"))
      .filter(col("__df") <= p.maxFpDf)
      .select(col("fp"), col("doc"), col("__new"))
    kept.as("a")
      .join(kept.as("b").hint("shuffle_hash"),
        col("a.fp") === col("b.fp") && col("a.doc") < col("b.doc"))
      .filter(col("a.__new") || col("b.__new"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= p.minShared)
  }

  /** One micro-batch: select fingerprints, match against the committed
    * store (excluding this batch's own partition), write the pair
    * decisions and the batch's selections, each under the batch's
    * ingest key. */
  private[graft] def processBatch(batch: DataFrame, ingest: String,
      idCol: String, textCol: String, path: String, pairsPath: String,
      p: Params): Unit = {
    val spark = batch.sparkSession
    val sel = batchSelections(batch, idCol, textCol, p).localCheckpoint()
    val pairs = matchBatch(spark, sel, path, p, Some(ingest))
      .localCheckpoint() // decide ONCE, before either write
    if (!pairs.isEmpty)
      pairs.write.mode("overwrite").parquet(pairsPath + "/ingest=" + ingest)
    if (!sel.isEmpty) appendBatch(sel, path, ingest, p)
  }

  /** Drain a document stream with AvailableNow: per batch, near-dup
    * pairs against the corpus-so-far land under
    * `pairsPath/ingest=<key>` and the batch's selections join the
    * store. Replay-idempotent per the store contract. */
  def ingestMatch(stream: DataFrame, idCol: String, textCol: String,
      path: String, pairsPath: String, checkpoint: String,
      p: Params = Params())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val key = streamKey(checkpoint)
    stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, s"b${batchId}_$key", idCol, textCol, path,
          pairsPath, p)
      }
      .start()
  }

  /** Whole-store q171 matching — IDENTICAL to
    * `Dedup.winnowedNearDups` over the ingested documents (same
    * shared matching code over the same per-doc selections; the df
    * cap is the store-wide df, not the incremental one). */
  def matchStore(spark: SparkSession, path: String,
      p: Params = Params()): DataFrame =
    Dedup.winnowedPairsFromSelections(
      visibleSelections(spark, path, p, None, None)
        .select(col("doc"), col("fp").as("__fp")),
      p.maxFpDf, p.minShared)

  /** Logical delete by DOC id (single column named `doc`): the
    * document's fingerprints stop matching immediately, are applied
    * physically and cleared by [[compact]], and win over later
    * appends of the same id until then. */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    require(ids.columns.length == 1,
      s"delete expects a single id column, got ${ids.columns.mkString(",")}")
    StoreFs.failIfLeased(spark, lockPath(path), "WinnowStore delete")
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
    * `ingest=base` with DISTINCT (fp, doc) rows — probes read
    * distinct, so results are identical by construction
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
          src.join(broadcast(t.toDF("doc")), Seq("doc"), "left_anti"))
        cleaned.select(col("fp"), col("doc")).distinct()
          .withColumn("shard", shardOf(col("fp"), p.nShards))
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
