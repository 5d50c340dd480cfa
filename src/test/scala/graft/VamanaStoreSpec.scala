package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, Vamana}
import graft.sources.VamanaStore

/** Streaming Vamana store (q172's StreamingDiskANN continuation):
  * stream drain == direct batch sequence (bit-identical graph),
  * exhaustive search over the incrementally-built graph == brute
  * force (every inserted node reachable), crash-replay idempotence,
  * probe-frame == single-probe, delete masking + physical compaction,
  * compact == canonical batch build, lease. */
class VamanaStoreSpec extends SparkSpec {
  import spark.implicits._

  private val sfd = "/root/testdata/sf0.01"
  private val p = Vamana.Params(r = 16, l = 32, alphaNum = 12L,
    alphaDen = 10L, nShards = 4)

  private def embs = Tables.embeddings(spark, sfd)
    .select(col("vec_id"), col("embedding"))

  private def slice(n: Int) = n match {
    case 0 => embs.filter(col("vec_id") < 200)
    case 1 => embs.filter(col("vec_id") >= 200 && col("vec_id") < 350)
    case _ => embs.filter(col("vec_id") >= 350)
  }

  private def visible(store: String) =
    VamanaStore.visibleRows(spark, store, None)
      .select(col("shard"), col("id"), col("vec6"), col("nbrs"),
        col("medoid"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toList,
        r.getSeq[Long](3).toList.sorted, r.getBoolean(4)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def probeVec(id: Long): Seq[Double] =
    embs.filter(col("vec_id") === id).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble).toSeq

  test("stream drain == direct processBatch sequence; exhaustive " +
    "search == brute force; crash replay bit-identical; probe-frame " +
    "== single probes; delete masks then compacts physically; " +
    "compact == canonical batch build; lease fails writers fast") {
    val root = Files.createTempDirectory("graft_vamanastore")
    val src = root.resolve("src").toString
    val store = root.resolve("store").toString
    val direct = root.resolve("direct").toString
    val ckpt = root.resolve("ckpt").toString

    // --- stream drain (3 incremental batches) vs direct sequence ---
    def drain(): Unit = {
      val stream = spark.readStream
        .schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .option("pathGlobFilter", "*.parquet")
        .parquet(src + "/*")
      VamanaStore.ingest(stream, "vec_id", "embedding", store, ckpt, p)
        .awaitTermination()
    }
    for (n <- 0 to 2) {
      slice(n).coalesce(1).write.mode("overwrite").parquet(s"$src/b$n")
      drain()
      VamanaStore.processBatch(slice(n), s"b$n", n.toLong, "vec_id",
        "embedding", direct, p)
    }
    val streamed = visible(store)
    assert(streamed.nonEmpty && streamed === visible(direct))

    // --- graph invariants over the incremental graph ---
    streamed.foreach { case (shard, id, _, nbrs, _) =>
      assert(nbrs.length <= p.r + 1, s"degree > R+1 at $id") // the
      // reachability fallback may hold ONE extra edge until compaction
      assert(!nbrs.contains(id), s"self-loop at $id")
      assert(nbrs.forall(n => (n % p.nShards) == shard),
        s"cross-shard edge at $id")
      assert(nbrs.distinct.length === nbrs.length, s"dup edge at $id")
    }
    for ((shard, members) <- streamed.groupBy(_._1))
      assert(members.count(_._5) === 1, s"shard $shard medoid count")

    // --- exhaustive search == brute force (all 500 reachable) ---
    val probe = probeVec(0L)
    val brute = Similarity.topKCosine(embs, "embedding", probe, 20,
        "vec_id")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    val pAll = p.copy(l = 200)
    val exhaustive = VamanaStore.topK(spark, store, embs, "vec_id",
        "embedding", probe, pAll, k = 20, mCand = 500)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(exhaustive === brute)

    // declared budget recall floor (q172's bar on the same fixture)
    val got = VamanaStore.topK(spark, store, embs, "vec_id",
        "embedding", probe, p, k = 20, mCand = 50)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(brute.count(got.contains).toDouble / brute.size >= 0.5)

    // --- crash replay: re-run the last batch under its key ---
    val before = spark.read.parquet(store).collect()
      .map(_.toString).sorted.toSeq
    val keys = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("ingest=")).sorted
    assert(keys.length === 3)
    VamanaStore.processBatch(slice(2), keys.last.stripPrefix("ingest="),
      2L, "vec_id", "embedding", store, p)
    assert(spark.read.parquet(store).collect()
      .map(_.toString).sorted.toSeq === before)

    // --- probe-frame == single-probe calls ---
    val probeIds = Seq(0L, 7L, 13L)
    val frame = VamanaStore.topKFrame(spark, store,
      embs.filter(col("vec_id").isin(probeIds: _*))
        .select(col("vec_id").as("probe_id"), col("embedding")),
      "probe_id", "embedding", embs, "vec_id", "embedding", p,
      k = 10, mCand = 50)
      .as[(Long, Long, Double)].collect().toSeq
    val singles = probeIds.flatMap { pid =>
      VamanaStore.topK(spark, store, embs, "vec_id", "embedding",
        probeVec(pid), p, k = 10, mCand = 50)
        .as[(Long, Double)].collect().map(t => (pid, t._1, t._2))
    }
    assert(frame === singles)

    // --- delete: masked immediately, physical at compaction ---
    val victim = brute(1) // a strong neighbor that isn't the probe
    VamanaStore.delete(spark, store, Seq(victim).toDF("id"))
    val masked = VamanaStore.topK(spark, store, embs, "vec_id",
        "embedding", probe, pAll, k = 20, mCand = 500)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(!masked.contains(victim))
    val bruteNoVictim = Similarity.topKCosine(
        embs.filter(col("vec_id") =!= victim), "embedding", probe, 20,
        "vec_id")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(masked === bruteNoVictim)

    VamanaStore.compact(spark, store, p)
    assert(new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("ingest=")).toSeq ===
      Seq("ingest=base"))
    assert(spark.read.parquet(store)
      .filter(col("id") === victim).count() === 0L)

    // compacted graph == canonical batch build over the survivors
    val canon = Vamana.build(embs.filter(col("vec_id") =!= victim),
        "vec_id", "embedding", p)
      .select(col("shard"), col("id"), col("vec6"), col("nbrs"),
        col("medoid"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toList,
        r.getSeq[Long](3).toList.sorted, r.getBoolean(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(visible(store) === canon)

    // --- churn (FreshDiskANN's claim): tombstone ~20%, probe MASKED
    // (deleted nodes still route), compact, probe again — the result
    // SETS must agree, and no dead id may ever surface (r18 verdict) ---
    val dead = embs
      .filter(col("vec_id") % 5 === 0 && col("vec_id") =!= victim)
      .select(col("vec_id"))
    VamanaStore.delete(spark, store, dead)
    val probesF = embs.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("embedding"))
    def frameNow(): Seq[(Long, Long, Double)] =
      VamanaStore.topKFrame(spark, store, probesF, "probe_id",
          "embedding", embs, "vec_id", "embedding", p, k = 10, mCand = 50)
        .as[(Long, Long, Double)].collect().toSeq
    val maskedFrame = frameNow()
    assert(maskedFrame.nonEmpty &&
      maskedFrame.forall(t => t._2 % 5 != 0 && t._2 != victim),
      "a tombstoned id surfaced in a masked search result")
    VamanaStore.compact(spark, store, p)
    val compactedFrame = frameNow()
    assert(maskedFrame === compactedFrame,
      "masked-probe vs compacted-probe result sets diverged")

    // --- lease: writers fail fast while a compactor holds it ---
    graft.sources.StoreFs.acquireLease(spark, store + ".compact_lock")
    val err = intercept[IllegalStateException] {
      VamanaStore.processBatch(slice(0).limit(1), "bX", 9L, "vec_id",
        "embedding", store, p)
    }
    assert(err.getMessage.contains("recover"))
    graft.sources.StoreFs.releaseLease(spark, store + ".compact_lock")
  }
}
