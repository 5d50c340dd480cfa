package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}
import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.{SignatureStore, VectorStore}
import graft.sources.SignatureStore.SwapPause

/** Concurrent READER vs a running `compact()` — the serving-while-
  * maintaining posture at 100 TB, where compaction cannot take the
  * store offline. CompactCrashSpec proves crash recovery; this spec
  * pins the racing-reader contract: the swap's between-renames window
  * (no live dir) is held open deterministically via [[SwapPause]], a
  * bare probe is shown to fail in that window (the hazard is real),
  * and a `withReadRetry`-wrapped probe retries through it and returns
  * the bit-identical pre-compaction result. */
class ConcurrentCompactSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/tmp").getFileSystem(
    spark.sessionState.newHadoopConf())
  private def exists(dir: String) = fs.exists(new Path(dir))

  /** Run `compactOp` on another thread, paused in the between-renames
    * window; execute `inWindow` while the live dir is absent; release
    * and await compaction; return `inWindow`'s result. */
  private def duringSwapWindow[T](compactOp: () => Unit)(inWindow: => T): T = {
    val entered = new CountDownLatch(1)
    val gate = new CountDownLatch(1)
    SwapPause.entered = entered
    SwapPause.gate = gate
    val compaction = Future(compactOp())
    try {
      assert(entered.await(60, TimeUnit.SECONDS), "swap never reached the window")
      inWindow
    } finally {
      gate.countDown()
      SwapPause.reset()
      Await.result(compaction, 120.seconds)
    }
  }

  // ---- vector store ---------------------------------------------------

  private def probeVec: Seq[Double] =
    Tables.embeddings(spark, sf).filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble).toSeq

  private def freshVecStore(): String = {
    val p = Files.createTempDirectory("graft_rc_vec").toString
    val e = Tables.embeddings(spark, sf)
    VectorStore.write(e.filter($"vec_id" % 3 =!= 0), "vec_id", "embedding", p)
    VectorStore.append(e.filter($"vec_id" % 3 === 0), "vec_id", "embedding", p)
    p
  }

  private def vecProbe(path: String): Seq[(Long, Double)] =
    VectorStore.topK(spark, path, "vec_id", "embedding", probeVec, 10)
      .as[(Long, Double)].collect().toSeq

  test("vector store: a probe racing compact() retries through the " +
      "no-live window and returns the bit-identical result") {
    val path = freshVecStore()
    val baseline = vecProbe(path)
    assert(baseline.nonEmpty)
    val raced = duringSwapWindow(() => VectorStore.compact(spark, path)) {
      assert(!exists(path), "window must hold the live dir absent")
      // the hazard is real: an unwrapped probe fails in the window
      intercept[Exception] { vecProbe(path) }
      // the contract: the wrapped probe retries until the swap lands.
      // Run it on another thread so the gate release below can happen
      // while it is mid-retry (the race this spec exists to pin).
      val probing = Future(
        VectorStore.withReadRetry(spark, path) { vecProbe(path) })
      Thread.sleep(250) // let it fail at least once inside the window
      probing
    }
    assert(Await.result(raced, 60.seconds) === baseline)
    assert(vecProbe(path) === baseline) // and the store is compacted+intact
  }

  // ---- signature store ------------------------------------------------

  private val p = SignatureStore.Params(shingleK = 3, nBands = 8,
    rowsPerBand = 2, nShards = 32)

  private lazy val sigDocs = Tables.documents(spark, sf)
  private lazy val sigBatch = sigDocs.filter($"doc_id" % 5 === 0)

  private def freshSigStore(): String = {
    val dir = Files.createTempDirectory("graft_rc_sig").toString
    SignatureStore.write(sigDocs.filter($"doc_id" % 5 =!= 0),
      "doc_id", "text", dir, p)
    dir
  }

  private def sigProbe(path: String): Seq[(Long, Long, Double)] =
    SignatureStore.dedupAgainstStore(sigBatch, "doc_id", "text", path, p, 0.5)
      .as[(Long, Long, Double)].collect().toSeq.sorted

  test("signature store: a probe racing compact() retries through the " +
      "bands swap window and returns the bit-identical result") {
    val path = freshSigStore()
    val baseline = sigProbe(path)
    assert(baseline.nonEmpty)
    // the pause holds the FIRST swap (bands) between its renames
    val raced = duringSwapWindow(() => SignatureStore.compact(spark, path, p)) {
      assert(!exists(path + "/bands"), "bands live dir must be absent")
      intercept[Exception] { sigProbe(path) }
      val probing = Future(
        SignatureStore.withReadRetry(spark, path) { sigProbe(path) })
      Thread.sleep(250)
      probing
    }
    assert(Await.result(raced, 60.seconds) === baseline)
    assert(sigProbe(path) === baseline)
  }

  test("withReadRetry propagates non-recoverable errors unchanged and " +
      "exhausts attempts on a permanently missing store") {
    // non-recoverable: not retried
    val boom = intercept[IllegalStateException] {
      VectorStore.withReadRetry(spark, "/tmp/graft_rc_nonexistent") {
        throw new IllegalStateException("not a read error")
      }
    }
    assert(boom.getMessage === "not a read error")
    // recoverable but permanent (no compactor will ever land the swap):
    // attempts exhaust and the read error propagates — the documented
    // "run recover() after a crash" boundary
    var calls = 0
    intercept[Exception] {
      VectorStore.withReadRetry(spark, "/tmp/graft_rc_nonexistent",
        attempts = 3) {
        calls += 1
        spark.read.parquet("/tmp/graft_rc_nonexistent").count()
      }
    }
    assert(calls === 3)
  }
}
