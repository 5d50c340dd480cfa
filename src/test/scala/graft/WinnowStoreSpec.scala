package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.WinnowStore

/** Streaming winnowing/MOSS store (q170/q171's ST7 continuation):
  * whole-drained-store matching IDENTICAL to `Dedup.winnowedNearDups`,
  * incremental pair emission a superset of the whole-corpus answer
  * (df only grows, so the cap can only loosen looking backwards),
  * crash-replay idempotence, compact probe-identity, tombstone
  * delete, lease. */
class WinnowStoreSpec extends SparkSpec {
  import spark.implicits._

  private val sfd = "/root/testdata/sf0.01"
  private val p = WinnowStore.Params(k = 8, w = 4, maxFpDf = 64,
    minShared = 30, nShards = 8)

  private def docs = Tables.documents(spark, sfd)
    .select(col("doc_id"), col("text"))

  private def writeBatch(src: String, n: Int): Unit =
    docs.filter(pmod(col("doc_id"), lit(3)) === n).coalesce(1)
      .write.mode("overwrite").parquet(s"$src/b$n")

  private def drain(src: String, store: String, pairs: String,
      ckpt: String): Unit = {
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("pathGlobFilter", "*.parquet")
      .parquet(src + "/*")
    WinnowStore.ingestMatch(stream, "doc_id", "text", store, pairs,
      ckpt, p).awaitTermination()
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id_a"), col("id_b"), col("n_shared"))
      .as[(Long, Long, Long)].collect().toSet

  test("3-batch drain: matchStore == Dedup.winnowedNearDups on the " +
    "whole corpus; emitted pairs cover the whole-corpus answer; " +
    "replay is bit-identical; compact is probe-identical; delete " +
    "masks immediately and applies physically") {
    val root = Files.createTempDirectory("graft_winnowstore")
    val src = root.resolve("src").toString
    val store = root.resolve("store").toString
    val pairs = root.resolve("pairs").toString
    val ckpt = root.resolve("ckpt").toString

    writeBatch(src, 0)
    drain(src, store, pairs, ckpt)
    writeBatch(src, 1)
    drain(src, store, pairs, ckpt)
    writeBatch(src, 2)
    drain(src, store, pairs, ckpt)

    // whole-drained-store matching == the q171 batch operator
    val whole = pairSet(graft.operators.Dedup.winnowedNearDups(
      docs, "doc_id", "text", p.k, p.w, p.maxFpDf, p.minShared))
    assert(whole.nonEmpty)
    val stored = pairSet(WinnowStore.matchStore(spark, store, p))
    assert(stored === whole)

    // incremental emissions: every whole-corpus pair was emitted by
    // the batch of its later member, with n_shared >= the final count
    // (df-so-far <= final df, so the cap only loosens backwards)
    val emitted = pairSet(spark.read.parquet(pairs))
    val emittedKeys = emitted.map(t => (t._1, t._2))
    assert(whole.forall { case (a, b, n) =>
      emittedKeys.contains((a, b)) &&
        emitted.exists(e => e._1 == a && e._2 == b && e._3 >= n)
    })

    // crash replay: re-run the LAST batch under its own ingest key —
    // both sinks bit-identical (dynamic overwrite + own-key exclusion
    // restore exactly the pre-batch decision state; the contract
    // covers the latest uncommitted batch, which is all Structured
    // Streaming ever replays)
    val ingestKeys = new java.io.File(pairs).listFiles()
      .map(_.getName).filter(_.startsWith("ingest=")).sorted
    assert(ingestKeys.length === 3)
    val b2Key = ingestKeys.last.stripPrefix("ingest=")
    def snapshot() = (
      spark.read.parquet(store).collect().map(_.toString).sorted.toSeq,
      spark.read.parquet(pairs).collect().map(_.toString).sorted.toSeq)
    val before = snapshot()
    WinnowStore.processBatch(
      docs.filter(pmod(col("doc_id"), lit(3)) === 2),
      b2Key, "doc_id", "text", store, pairs, p)
    assert(snapshot() === before)

    // compact: one ingest=base partition, matching identical
    WinnowStore.compact(spark, store, p)
    val dirs = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("ingest=")).toSeq
    assert(dirs === Seq("ingest=base"))
    assert(pairSet(WinnowStore.matchStore(spark, store, p)) === whole)

    // delete: a tombstoned doc stops matching immediately...
    val victim = whole.head._1
    WinnowStore.delete(spark, store, Seq(victim).toDF("doc"))
    val masked = pairSet(WinnowStore.matchStore(spark, store, p))
    assert(!masked.exists(t => t._1 == victim || t._2 == victim))
    // (dropping a doc can only RAISE others' eligibility via the df
    // cap, never remove pairs between surviving docs)
    assert(masked.forall(t => t._1 != victim && t._2 != victim))
    // ...and is applied physically at compaction
    WinnowStore.compact(spark, store, p)
    assert(spark.read.parquet(store)
      .filter(col("doc") === victim).count() === 0L)
    assert(!new java.io.File(store, "_tombstones").exists() ||
      new java.io.File(store, "_tombstones").listFiles().isEmpty)
    assert(pairSet(WinnowStore.matchStore(spark, store, p)) === masked)

    // lease: a held compactor lease fails writers fast
    graft.sources.StoreFs.acquireLease(spark, store + ".compact_lock")
    val sel = WinnowStore.batchSelections(
      docs.filter(col("doc_id") === 0), "doc_id", "text", p)
    val err = intercept[IllegalStateException] {
      WinnowStore.appendBatch(sel, store, "bX_test", p)
    }
    assert(err.getMessage.contains("recover"))
    graft.sources.StoreFs.releaseLease(spark, store + ".compact_lock")
  }
}
