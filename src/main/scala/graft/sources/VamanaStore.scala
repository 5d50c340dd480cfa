package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Vamana

/** Streaming Vamana graph store — the StreamingDiskANN surface the
  * reference's pgvectorscale extension names (`src/rag/sqlx.rs:26-29`;
  * Singh et al., FreshDiskANN, arXiv:2105.09613): the incremental
  * continuation of the batch index in `operators/Vamana.scala` (q172),
  * completing the pattern every other index family here already has
  * (`VectorStore.appendStream` for IVF, the five ST7 dedup stores).
  *
  * Layout under `path`: `ingest=<key>/shard=<s>/` parquet rows
  * (id, vec6 array<bigint>, nbrs array<bigint> — NEIGHBOR IDS, medoid
  * boolean, seq bigint). A batch writes, under its OWN ingest key:
  * its new nodes (out-edges from RobustPrune) AND replacement
  * adjacency rows for the existing nodes its back-edges rewired. A
  * reader reduces to the LATEST row per id (max `seq`) — so the
  * store's visible graph after any prefix of batches is exactly the
  * sequential FreshDiskANN insertion state. `seq` is the stream's
  * batch id (the compacted base writes seq = -1): adjacency
  * replacement needs a TOTAL writer order, so a store accepts ONE
  * stream (one checkpoint) between compactions — the lease already
  * serializes writers vs maintenance, and foreachBatch is sequential
  * within a stream.
  *
  * Crash-replay idempotence is the SignatureStore contract verbatim:
  * the batch's insertion reads the store EXCLUDING its own ingest
  * partition and rewrites that partition with dynamic overwrite —
  * a replayed batch recomputes bit-identically (the whole build is
  * exact-integer; VamanaStoreSpec replays and compares bytes).
  * Batch rows whose id already exists in the visible store are
  * DROPPED (re-ingest is a no-op; delete-then-reinsert goes through
  * [[compact]], the tombstone re-insert contract all stores share).
  *
  * Deletes follow FreshDiskANN: a tombstoned id is masked from every
  * search RESULT immediately but stays in the graph as a routing node
  * until [[compact]] removes it physically. Compaction rebuilds each
  * shard with the canonical batch [[Vamana.buildShard]] over the
  * surviving vectors — the compacted store is BIT-IDENTICAL to
  * `Vamana.build` over the surviving rows (spec-asserted), which also
  * restores the degree bound the insert path's reachability fallback
  * may exceed by one.
  *
  * Probes: [[topKFrame]] is the batch form the q172 single-probe
  * `topK` lacked — ONE shard materialization amortized across ALL
  * probes in the frame (the scatter-gather beams run in a loop inside
  * the shard task), then per-probe exact-cosine rerank on original
  * vectors (the q81/q163 late-materialization posture). Probes
  * broadcast through the task closure behind `maxProbes` — at 100 TB
  * the shard count scales with the corpus while the probe batch stays
  * workload-sized; a larger workload chunks into several calls. */
object VamanaStore {

  private def lockPath(path: String): String = path + ".compact_lock"
  private def tombstoneDir(path: String): String = path + "/_tombstones"
  private def streamKey(checkpoint: String): String =
    Integer.toHexString(checkpoint.hashCode)
  private def shardOf(id: Column, n: Int): Column =
    pmod(id, lit(n.toLong)).cast("int")

  /** The store's committed rows reduced to the latest per (shard, id)
    * — the visible graph. Tombstones are NOT applied here (deleted
    * nodes keep routing until compaction); result masking is the
    * probe's job. */
  private[graft] def visibleRows(spark: SparkSession, path: String,
      excludeIngest: Option[String]): DataFrame = {
    val all = spark.read.parquet(path)
    val scoped = excludeIngest
      .fold(all)(ex => all.filter(col("ingest") =!= lit(ex)))
    // latest-per-id: max_by over seq; ids are unique per seq so the
    // (seq) ordering is total per id
    scoped
      .groupBy(col("shard"), col("id"))
      .agg(max_by(struct(col("vec6"), col("nbrs"), col("medoid")),
        col("seq")).as("__r"), max(col("seq")).as("seq"))
      .select(col("shard"), col("id"), col("__r.vec6").as("vec6"),
        col("__r.nbrs").as("nbrs"), col("__r.medoid").as("medoid"),
        col("seq"))
  }

  private[graft] def tombstones(spark: SparkSession,
      path: String): Option[DataFrame] = {
    val dir = tombstoneDir(path)
    if (StoreFs.hasCommittedData(spark, dir))
      Some(spark.read.parquet(dir).distinct())
    else None
  }

  /** One micro-batch insertion: per affected shard, either the
    * canonical batch build (shard not in the store yet) or the
    * FreshDiskANN insert pass, all inside one task per shard; writes
    * new + rewired rows under the batch's ingest key. Replay reads
    * the store excluding that key, so a crashed batch reproduces
    * bit-identically. */
  private[graft] def processBatch(batch: DataFrame, ingest: String,
      seq: Long, idCol: String, vecCol: String, path: String,
      p: Vamana.Params): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    StoreFs.failIfLeased(spark, lockPath(path),
      s"VamanaStore write (ingest=$ingest)")
    // lift with Vamana.lift6 (Math.round) — SQL round() is HALF_UP and
    // diverges on negative .5 boundaries (the r10 replica distinction).
    // Null/empty vectors (and null ids) are DROPPED before the lift —
    // the repo's null-drop posture; they would otherwise NPE inside
    // the shard task (r18 ADVICE).
    val fresh = batch
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull &&
        size(col(vecCol)) > 0)
      .select(shardOf(col(idCol), p.nShards).as("shard"),
        col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .as[(Int, Long, Seq[Double])]
      .map { case (s, id, v) =>
        (s, id, true, Vamana.lift6(v).toSeq, Seq.empty[Long], false)
      }
      .toDF("shard", "id", "__new", "vec6", "nbrs", "medoid")
    val stored =
      if (StoreFs.hasCommittedData(spark, path))
        visibleRows(spark, path, Some(ingest))
          // only shards this batch touches participate
          .join(fresh.select(col("shard")).distinct(), Seq("shard"),
            "left_semi")
          .select(col("shard"), col("id"), lit(false).as("__new"),
            col("vec6"), col("nbrs"), col("medoid"))
      else fresh.limit(0)
    val out = fresh.unionByName(stored)
      .as[(Int, Long, Boolean, Seq[Long], Seq[Long], Boolean)]
      .repartition(p.nShards, col("shard"))
      .mapPartitions { it =>
        val byShard = it.toArray.groupBy(_._1)
        byShard.iterator.flatMap { case (shard, withDups) =>
          // a re-ingested id keeps its STORED row (batch copy drops);
          // duplicate ids WITHIN a batch collapse deterministically
          val members = withDups.groupBy(_._2).map { case (_, copies) =>
            copies.find(!_._3)
              .getOrElse(copies.minBy(_._4.mkString(",")))
          }.toArray.sortBy(_._2)
          val ids = members.map(_._2)
          val vecs = members.map(_._4.toArray)
          val isNew = members.map(_._3)
          if (!members.exists(!_._3)) {
            // brand-new shard: canonical batch build
            val (medoid, adj) = Vamana.buildShard(vecs, p)
            ids.indices.iterator.map { i =>
              (shard, ids(i), vecs(i).toSeq, adj(i).map(ids(_)).toSeq,
                i == medoid, seq)
            }
          } else if (!isNew.exists(identity)) Iterator.empty
          else {
            val idx = ids.zipWithIndex.toMap
            val adj: Array[Array[Int]] = members.map(m =>
              m._5.toArray.map(idx))
            val medoidIdx = members.indexWhere(_._6)
            require(medoidIdx >= 0, s"shard $shard has no medoid row")
            val changed = Vamana.insertShard(ids, vecs, isNew, adj,
              medoidIdx, p)
            ids.indices.iterator.filter(changed).map { i =>
              (shard, ids(i), vecs(i).toSeq, adj(i).map(ids(_)).toSeq,
                members(i)._6, seq)
            }
          }
        }
      }
      .toDF("shard", "id", "vec6", "nbrs", "medoid", "seq")
      .withColumn("ingest", lit(ingest))
      .localCheckpoint() // decide fully before touching the store
    if (!out.isEmpty)
      out.repartition(p.nShards, col("shard"))
        .write.partitionBy("ingest", "shard").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
  }

  /** Drain a vector stream with AvailableNow: each micro-batch runs
    * the FreshDiskANN insertion into the store. Replay-idempotent per
    * the store contract; one stream per store between compactions. */
  def ingest(stream: DataFrame, idCol: String, vecCol: String,
      path: String, checkpoint: String, p: Vamana.Params)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val key = streamKey(checkpoint)
    stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, s"b${batchId}_$key", batchId, idCol, vecCol,
          path, p)
      }
      .start()
  }

  /** Batch scatter-gather probe — ONE materialization of each shard's
    * graph amortized over every probe in `probes` (probeIdCol,
    * probeVecCol): per shard, a greedy beam per probe; tombstoned ids
    * masked from the beams; global per-probe top-`mCand` by exact
    * (dist6, id); exact cosine rerank on ORIGINAL `source` vectors;
    * top-`k` per probe by (sim DESC, id). Probes collect + broadcast
    * through the closure behind `maxProbes`. */
  def topKFrame(spark: SparkSession, path: String, probes: DataFrame,
      probeIdCol: String, probeVecCol: String, source: DataFrame,
      idCol: String, vecCol: String, p: Vamana.Params, k: Int,
      mCand: Int, maxProbes: Int = 65536): DataFrame = {
    import spark.implicits._
    val prDf = probes
      .filter(col(probeIdCol).isNotNull && col(probeVecCol).isNotNull &&
        size(col(probeVecCol)) > 0) // null-drop posture (r18 ADVICE)
      .select(col(probeIdCol).cast("long"),
        col(probeVecCol).cast("array<double>"))
      .localCheckpoint()
    // gate BEFORE collecting (the r17-ADVICE ordering)
    val nProbes = prDf.count()
    require(nProbes <= maxProbes,
      s"$nProbes probes exceed maxProbes=$maxProbes — chunk the " +
        "probe frame; shards scale with the corpus, probes must stay " +
        "workload-sized")
    val pr = prDf.as[(Long, Seq[Double])].collect().sortBy(_._1)
    val probeVecs6 = pr.map { case (pid, v) => (pid, Vamana.lift6(v)) }
    require(StoreFs.hasCommittedData(spark, path),
      s"VamanaStore at $path has no committed data — ingest a batch " +
        "before probing")
    val beams = visibleRows(spark, path, None)
      .as[(Int, Long, Seq[Long], Seq[Long], Boolean, Long)]
      .repartition(p.nShards, col("shard"))
      .mapPartitions { it =>
        val byShard = it.toArray.groupBy(_._1)
        byShard.iterator.flatMap { case (_, members0) =>
          val members = members0.sortBy(_._2)
          val idx = members.map(_._2).zipWithIndex.toMap
          val vecs = members.map(_._3.toArray)
          val adj = members.map(m => m._4.toArray.map(idx))
          val medoid = members.indexWhere(_._5)
          require(medoid >= 0,
            s"shard of ${members.length} rows has no medoid row — " +
              "store corruption; rebuild via compact()")
          probeVecs6.iterator.flatMap { case (pid, q6) =>
            val (beam, _) = Vamana.greedySearch(adj, vecs, medoid, q6,
              p.l)
            beam.iterator.map { case (d, i) => (pid, members(i)._2, d) }
          }
        }
      }
      .toDF("__pid", "id", "dist6")
    val masked = tombstones(spark, path).fold(beams)(t =>
      beams.join(broadcast(t.toDF("id")), Seq("id"), "left_anti"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("dist6"), col("id"))
    val cands = masked
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= mCand)
      .select(col("__pid"), col("id").as(idCol))
    val probeDf = broadcast(
      spark.createDataset(pr.toSeq).toDF("__pid", "__pvec"))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"))
      .orderBy(col("sim").desc, col(idCol))
    cands
      .join(source.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(probeDf, Seq("__pid"))
      .select(col("__pid"), col(idCol),
        graft.functions.VectorOps.cosine6(col(vecCol), col("__pvec"))
          .as("sim"))
      .withColumn("__rk", row_number().over(wk))
      .filter(col("__rk") <= k)
      .select(col("__pid").as(probeIdCol), col(idCol), col("sim"))
      .orderBy(col(probeIdCol), col("sim").desc, col(idCol))
  }

  /** Single-probe convenience (the q172 `topK` shape over the store). */
  def topK(spark: SparkSession, path: String, source: DataFrame,
      idCol: String, vecCol: String, probe: Seq[Double],
      p: Vamana.Params, k: Int, mCand: Int): DataFrame = {
    import spark.implicits._
    topKFrame(spark, path,
      spark.createDataset(Seq((0L, probe))).toDF("__probe", "__vec"),
      "__probe", "__vec", source, idCol, vecCol, p, k, mCand)
      .drop("__probe")
  }

  /** Logical delete by id (single column): masked from every search
    * result immediately, removed physically (graph rebuilt) by
    * [[compact]]; wins over later re-appends of the same id until
    * then — the shared re-insert contract. */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    require(ids.columns.length == 1,
      s"delete expects a single id column, got ${ids.columns.mkString(",")}")
    StoreFs.failIfLeased(spark, lockPath(path), "VamanaStore delete")
    ids.select(col(ids.columns.head).cast("long").as("id")).distinct()
      .write.mode("append").parquet(tombstoneDir(path))
  }

  /** Compact: rebuild every shard with the canonical batch
    * [[Vamana.buildShard]] over the surviving (non-tombstoned) latest
    * vectors, folded into `ingest=base` at seq = -1 — bit-identical
    * to `Vamana.build` over the survivors (spec-asserted), restoring
    * the canonical graph and the R degree bound. Stage-then-swap with
    * the sibling lease; tombstones snapshotted at entry, applied
    * physically, late tombstones rescued out of `.trash`. */
  def compact(spark: SparkSession, path: String,
      p: Vamana.Params): Unit = {
    import spark.implicits._
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
        val latest = src
          .groupBy(col("shard"), col("id"))
          .agg(max_by(col("vec6"), col("seq")).as("vec6"))
        val alive = dead.fold(latest)(t =>
          latest.join(broadcast(t.toDF("id")), Seq("id"), "left_anti"))
        alive
          // a using-column join moves `id` first — re-fix the order
          // before the positional tuple encoder binds
          .select(col("shard"), col("id"), col("vec6"))
          .as[(Int, Long, Seq[Long])]
          .repartition(p.nShards, col("shard"))
          .mapPartitions { it =>
            val byShard = it.toArray.groupBy(_._1)
            byShard.iterator.flatMap { case (shard, members) =>
              val sorted = members.sortBy(_._2)
              val ids = sorted.map(_._2)
              val vecs = sorted.map(_._3.toArray)
              val (medoid, adj) = Vamana.buildShard(vecs, p)
              ids.indices.iterator.map { i =>
                (shard, ids(i), vecs(i).toSeq, adj(i).map(ids(_)).toSeq,
                  i == medoid, -1L)
              }
            }
          }
          .toDF("shard", "id", "vec6", "nbrs", "medoid", "seq")
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
