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
  *   bands/    (doc, band, bucket, shard)  partitionBy(shard)
  *   shingles/ (doc, sh)
  * where shard = pmod(hash(bucket), nShards). A small batch touches few
  * distinct (band, bucket) pairs, hence few shards — the probe collects
  * its shard set (bounded by nShards, a driver-side constant, never
  * corpus-sized) and Catalyst prunes every other shard directory at
  * planning time (`PartitionFilters`, spec-asserted). The shingle sets
  * — the bulk of the bytes — never ride the candidate join: they rejoin
  * per SURVIVING pair from `shingles/`, the same late-materialization
  * shape as `minhashNearDups` (r2 q48 finding).
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

  /** Build (or extend, with mode=append) the store from a document
    * frame — two linear passes over the input (banded index, then
    * shingle payload). The index write re-exchanges on `shard` so each
    * shard directory gets one file, not one per compute task. */
  def write(df: DataFrame, idCol: String, textCol: String, path: String,
      p: Params = Params(), mode: String = "overwrite"): Unit = {
    banded(df, idCol, textCol, p)
      .repartition(p.nShards, col("shard"))
      .write.partitionBy("shard").mode(mode).parquet(path + "/bands")
    shingleRows(df, idCol, textCol, p)
      .write.mode(mode).parquet(path + "/shingles")
  }

  /** Incremental index maintenance — new files land inside existing
    * shard directories, no reorganization (same posture as
    * `VectorStore.append`). */
  def append(df: DataFrame, idCol: String, textCol: String, path: String,
      p: Params = Params()): Unit =
    write(df, idCol, textCol, path, p, mode = "append")

  /** Streaming ingest into the signature store (AvailableNow drain —
    * the reference's drain-then-stop shape); replay idempotence comes
    * from the streaming checkpoint as in `Streams.runIngest`. */
  def appendStream(stream: DataFrame, idCol: String, textCol: String,
      path: String, checkpoint: String,
      p: Params = Params()): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        append(batch, idCol, textCol, path, p)
      }
      .start()

  /** Near-dup pairs between a NEW batch and the persisted corpus:
    * (id_new, id_stored, jaccard ≥ threshold). The batch's banded rows
    * equi-join the store's banded index on (band, bucket) — restricted,
    * at planning time, to the shards the batch's buckets hash into —
    * then exact Jaccard verifies each surviving DISTINCT pair over
    * shingle sets (batch side recomputed, store side read from
    * `shingles/`). Never compares batch-internal pairs (run
    * `Dedup.minhashNearDups` on the batch for those).
    *
    * 100 TB cost: the candidate join ships only (band, bucket, id)
    * triples from the pruned shards; the driver materializes only the
    * DISTINCT shard list (≤ nShards ints). */
  def dedupAgainstStore(batch: DataFrame, idCol: String, textCol: String,
      path: String, p: Params = Params(),
      jaccardThreshold: Double = 0.8): DataFrame = {
    val spark = batch.sparkSession
    val batchBanded = banded(batch, idCol, textCol, p)
    val shards = batchBanded.select(col("shard")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val stored = spark.read.parquet(path + "/bands")
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
      .join(spark.read.parquet(path + "/shingles")
        .select(col("doc").as("id_stored"), col("sh").as("__shb")), "id_stored")
      .withColumn("jaccard", Dedup.jaccard(col("__sha"), col("__shb")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_new"), col("id_stored"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** The store read a probe performs, exposed for plan inspection
    * (the spec asserts `PartitionFilters` carries the shard filter). */
  def readShards(spark: SparkSession, path: String, shards: Seq[Int]): DataFrame =
    spark.read.parquet(path + "/bands").filter(col("shard").isin(shards: _*))

  /** The daily operation end-to-end, streaming: drain `stream` with
    * AvailableNow, and for each micro-batch KEEP only documents that
    * are NOT near-dups of the already-ingested corpus — survivors are
    * appended to both the signature store and `acceptedPath`, so a
    * re-ingest of the same data inserts nothing (the exact failure the
    * reference ships, `src/rag/sqlx.rs:34-45`: its ingest re-inserts
    * every row). Within-batch duplicates are collapsed by exact text
    * first (deterministic keep-lowest-id) so a batch cannot self-insert
    * two copies the store has never seen. Batch→batch ordering is
    * serial under AvailableNow, and replay idempotence after a crash
    * comes from re-running the same dedup against the store: a replayed
    * batch's rows are near-dups of their own prior insertion, so they
    * drop out. */
  def ingestDedup(stream: DataFrame, idCol: String, textCol: String,
      path: String, acceptedPath: String, checkpoint: String,
      p: Params = Params(), jaccardThreshold: Double = 0.8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val exact = Dedup.exact(batch, idCol, textCol)
        val storeExists =
          new java.io.File(path + "/bands").exists()
        val keep =
          if (!storeExists) exact
          else {
            val dupIds = dedupAgainstStore(exact, idCol, textCol, path, p,
              jaccardThreshold).select(col("id_new").as(idCol)).distinct()
            exact.join(dupIds, Seq(idCol), "left_anti")
          }
        // cache the survivors: both appends scan them, and the second
        // must not recompute against a store the first just changed
        val kept = keep.localCheckpoint()
        append(kept, idCol, textCol, path, p)
        kept.write.mode("append").parquet(acceptedPath)
      }
      .start()
}
