package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Streaming semantics (SURVEY §2.8): AvailableNow drain, foreachBatch
  * ingest, watermarked windows — validated by batch-equivalence (the
  * streaming pipeline over a bounded source must produce exactly the
  * batch transform's result). */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  test("AvailableNow ingest drains the backlog then stops; output = batch transform") {
    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    val q = Streams.runIngest(spark, sf, out, ckpt)
    assert(q.awaitTermination(120000))
    assert(!q.isActive) // AvailableNow terminates (QueueEmpty semantics)

    val streamed = spark.read.parquet(out)
    val batch = Streams.ingestTransform(
      Tables.events(spark, sf).withColumnRenamed("props", "body"))
    assert(streamed.count() === batch.count())
    // row-level equivalence on the deterministic columns
    val a = streamed.select($"event_id", $"chunk_id", $"tokens").as[(Long, Int, Int)]
      .collect().sorted.toSeq
    val b = batch.select($"event_id", $"chunk_id", $"tokens").as[(Long, Int, Int)]
      .collect().sorted.toSeq
    assert(a === b)
  }

  test("windowed streaming counts equal batch windowed counts") {
    val stream = Streams.eventsStream(spark, sf)
    val q = Streams.windowedCounts(stream).writeStream
      .format("memory").queryName("win_out").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("win_out")
      .select($"window.start".as("ws"), $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect().sorted.toSeq
    val batch = Tables.events(spark, sf)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("ws"), $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect().sorted.toSeq
    assert(streamed === batch)
  }

  test("streaming session windows converge with batch gaps-and-islands sessionization") {
    val stream = Streams.eventsStream(spark, sf)
    val q = Streams.sessionWindows(stream).writeStream
      .format("memory").queryName("sess_out").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    // same 30-minute gap rule → same session count and sizes per user
    val streamed = spark.table("sess_out")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val batch = graft.operators.Analytics
      .sessionize(Tables.events(spark, sf), "user_id", "ts", "event_id", 1800L)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(streamed === batch)
  }

  test("ST6: stream-static reaction lookup equals the batch join") {
    // static side: one original message per user (deterministic pick)
    val store = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(min($"event_id").as("orig_id"),
        min_by($"props", $"event_id").as("orig_body"))
    val streamReactions = Streams.eventsStream(spark, sf)
      .filter($"event_type" === "click")
      .select($"event_id", $"user_id")
    val q = Streams.reactionLookup(streamReactions, store, Seq("user_id"), "orig_body")
      .writeStream.format("memory").queryName("react_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("react_out")
      .select($"event_id", $"orig_id", $"formatted")
      .as[(Long, Option[Long], String)].collect().sorted.toSeq
    val batchReactions = Tables.events(spark, sf)
      .filter($"event_type" === "click")
      .select($"event_id", $"user_id")
    val batch = Streams.reactionLookup(batchReactions, store, Seq("user_id"), "orig_body")
      .select($"event_id", $"orig_id", $"formatted")
      .as[(Long, Option[Long], String)].collect().sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("ST6: mapGroupsWithState running counts converge to the batch aggregate") {
    val q = Streams.runStatefulCounts(spark, sf, "stateful_out")
    q.processAllAvailable(); q.stop()
    // update-mode sink: n_events per user is monotone across batches,
    // so the max row per user is the final state
    val streamed = spark.table("stateful_out")
      .groupBy($"user_id")
      .agg(max($"n_events").as("n"), max($"last_seen_ms").as("last_ms"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val batch = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), max(unix_millis($"ts")).as("last_ms"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // the same function over a batch Dataset gives the same totals
    // (batch equivalence by construction)
    val typed = Tables.events(spark, sf)
      .select($"user_id", unix_millis($"ts")).as[(Long, Long)]
    val direct = Streams.statefulUserCounts(typed)
      .select($"user_id", $"n_events", $"last_seen_ms")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(direct === batch)
  }

  test("anomalyStream: equals the batch operator over the ordered stream, " +
      "bounded state, bit-identical batch replay") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    // two keys, 30 ordered points each; key a carries a spike at t=25
    val rows = for {
      key <- Seq("a", "b"); i <- 1 to 30
    } yield (key, i.toLong,
      if (key == "a" && i == 25) 100.0 else 10.0 + (i % 3))
    val df = rows.toDF("k", "t", "x")
    // one file per 10-step slice with ascending mtimes → event order
    val staging = Files.createTempDirectory("graft_an_stage")
    (0 until 3).foreach { b =>
      val tmp = Files.createTempDirectory(s"graft_an_tmp$b")
      rows.filter(r => (r._2 - 1) / 10 == b).toDF("k", "t", "x")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = Paths.get(staging.toString, f"slice_$b%03d.parquet")
      Files.copy(part.toPath, dest)
      Files.setLastModifiedTime(dest,
        FileTime.fromMillis(1700000000000L + b * 60000L))
    }
    val out = "file://" + Files.createTempDirectory("graft_an_out").toString + "/o"
    val state = "file://" + Files.createTempDirectory("graft_an_state").toString + "/s"
    val ck = Files.createTempDirectory("graft_an_ck").toString
    val q = Streams.anomalyStream(
      spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1).parquet(staging.toString),
      "k", Seq("t"), "x", window = 4, k = 3, minPeriods = 2,
      state, out, ck)
    assert(q.awaitTermination(180000))
    val streamed = spark.read.parquet(s"$out/batch=*")
      .select($"k", $"t", $"n_prev", $"roll_mean", $"is_anomaly")
      .orderBy($"k", $"t")
      .as[(String, Long, Int, Option[Double], Int)].collect().toSeq
    val batch = graft.operators.Analytics.rollingAnomaly(
      df, "k", Seq("t"), "x", window = 4, k = 3, minPeriods = 2)
      .select($"k", $"t", $"n_prev", $"roll_mean", $"is_anomaly")
      .orderBy($"k", $"t")
      .as[(String, Long, Int, Option[Double], Int)].collect().toSeq
    assert(streamed === batch)
    assert(streamed.exists(r => r._1 == "a" && r._2 == 25L && r._5 == 1))
    // state bounded: ≤ 2 batch dirs retained, ≤ keys·window rows each
    val stDirs = graft.sources.StoreFs.childNames(spark, state)
      .filter(_.startsWith("batch="))
    assert(stDirs.length <= 2, stDirs.mkString(","))
    val lastState = spark.read.parquet(s"$state/batch=2")
    assert(lastState.count() <= 2 * 4)
    // crash-replay: re-running batch 2 against batch 1's state
    // reproduces output AND state files bit-identically
    val snapOut = spark.read.parquet(s"$out/batch=2")
      .collect().map(_.toString).sorted.toSeq
    val snapSt = lastState.collect().map(_.toString).sorted.toSeq
    Streams.anomalyBatch(
      rows.filter(r => (r._2 - 1) / 10 == 2).toDF("k", "t", "x"), 2L,
      "k", Seq("t"), "x", 4, 3, 2, state, out)
    assert(spark.read.parquet(s"$out/batch=2")
      .collect().map(_.toString).sorted.toSeq === snapOut)
    assert(spark.read.parquet(s"$state/batch=2")
      .collect().map(_.toString).sorted.toSeq === snapSt)
  }

  test("driftStream: each batch's PSI equals distributionDrift(history, batch); " +
      "batch 0 empty; bounded additive state; bit-identical batch replay") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    // three slices: slice 2 shifts group a's values up by 5 → drift
    val slice = (0 until 3).map { b =>
      for {
        g <- Seq("a", "b"); i <- 1 to 40
      } yield (g, (if (g == "a" && b == 2) 15.0 else 10.0) + (i % 5))
    }
    val staging = Files.createTempDirectory("graft_dr_stage")
    slice.zipWithIndex.foreach { case (rows, b) =>
      val tmp = Files.createTempDirectory(s"graft_dr_tmp$b")
      rows.toDF("g", "x").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = Paths.get(staging.toString, f"slice_$b%03d.parquet")
      Files.copy(part.toPath, dest)
      Files.setLastModifiedTime(dest,
        FileTime.fromMillis(1700000000000L + b * 60000L))
    }
    val out = "file://" + Files.createTempDirectory("graft_dr_out").toString + "/o"
    val state = "file://" + Files.createTempDirectory("graft_dr_state").toString + "/s"
    val ck = Files.createTempDirectory("graft_dr_ck").toString
    val schema = slice(0).toDF("g", "x").schema
    val q = Streams.driftStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staging.toString),
      "g", "x", bucketWidth = 2.0, state, out, ck)
    assert(q.awaitTermination(180000))

    // (the r10 lesson: tuple TYPE ALIASES break encoder derivation)
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long, Long, Double)] =
      df.select($"g", $"n_a", $"n_b", $"n_buckets", $"psi")
        .orderBy($"g").as[(String, Long, Long, Long, Double)]
        .collect().toSeq
    // batch 0: no reference yet → empty
    assert(spark.read.parquet(s"$out/batch=0").count() === 0L)
    // batch i ≥ 1 == the batch operator over (history, slice_i)
    for (i <- 1 until 3) {
      val hist = (0 until i).map(b => slice(b).toDF("g", "x"))
        .reduce(_.unionByName(_))
      val expect = rowsOf(graft.operators.Analytics.distributionDrift(
        hist, slice(i).toDF("g", "x"), "g", "x", 2.0))
      assert(rowsOf(spark.read.parquet(s"$out/batch=$i")) === expect,
        s"batch $i drift != batch operator")
    }
    // the shifted batch actually reads as drift for group a only
    val b2 = spark.read.parquet(s"$out/batch=2")
      .select($"g", $"psi").as[(String, Double)].collect().toMap
    assert(b2("a") > 0.25, s"shift not flagged: ${b2("a")}")
    assert(b2("b") < 0.1, s"stable group drifted: ${b2("b")}")
    // bounded state: ≤ 2 batch dirs, ≤ groups × buckets rows
    val stDirs = graft.sources.StoreFs.childNames(spark, state)
      .filter(_.startsWith("batch="))
    assert(stDirs.length <= 2, stDirs.mkString(","))
    assert(spark.read.parquet(s"$state/batch=2").count() <= 2L * 16L)
    // crash-replay: re-running batch 2 against batch 1's state
    // reproduces output and state bit-identically
    val snapOut = spark.read.parquet(s"$out/batch=2")
      .collect().map(_.toString).sorted.toSeq
    val snapSt = spark.read.parquet(s"$state/batch=2")
      .collect().map(_.toString).sorted.toSeq
    Streams.driftBatch(slice(2).toDF("g", "x"), 2L, "g", "x", 2.0,
      state, out)
    assert(spark.read.parquet(s"$out/batch=2")
      .collect().map(_.toString).sorted.toSeq === snapOut)
    assert(spark.read.parquet(s"$state/batch=2")
      .collect().map(_.toString).sorted.toSeq === snapSt)
  }

  test("quantileStream: each batch's quantiles equal the batch operator " +
      "over the concatenation; bounded additive state; bit-identical " +
      "batch replay") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val slice = (0 until 3).map { b =>
      for {
        g <- Seq("a", "b"); i <- 1 to 30
      } yield (g, ((i * 7 + b * 13) % 23).toDouble +
        (if (g == "b") 100.0 else 0.0))
    }
    val staging = Files.createTempDirectory("graft_qs_stage")
    slice.zipWithIndex.foreach { case (rows, b) =>
      val tmp = Files.createTempDirectory(s"graft_qs_tmp$b")
      rows.toDF("g", "x").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = Paths.get(staging.toString, f"slice_$b%03d.parquet")
      Files.copy(part.toPath, dest)
      Files.setLastModifiedTime(dest,
        FileTime.fromMillis(1700000000000L + b * 60000L))
    }
    val out = "file://" + Files.createTempDirectory("graft_qs_out").toString + "/o"
    val state = "file://" + Files.createTempDirectory("graft_qs_state").toString + "/s"
    val ck = Files.createTempDirectory("graft_qs_ck").toString
    val schema = slice(0).toDF("g", "x").schema
    val q = Streams.quantileStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staging.toString),
      "g", "x", state, out, ck)
    assert(q.awaitTermination(180000))
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy($"g").collect().map(_.toString).toSeq
    for (i <- 0 until 3) {
      val hist = (0 to i).map(b => slice(b).toDF("g", "x"))
        .reduce(_.unionByName(_))
      val expect = rowsOf(graft.operators.Analytics.quantiles(hist, "g", "x"))
      assert(rowsOf(spark.read.parquet(s"$out/batch=$i")) === expect,
        s"batch $i quantiles != batch operator over concatenation")
    }
    // bounded state: <= 2 batch dirs, <= groups x distinct values rows
    val stDirs = graft.sources.StoreFs.childNames(spark, state)
      .filter(_.startsWith("batch="))
    assert(stDirs.length <= 2, stDirs.mkString(","))
    assert(spark.read.parquet(s"$state/batch=2").count() <= 2L * 23L)
    // crash-replay: re-running batch 2 against batch 1's state is
    // bit-identical in both output and state
    val snapOut = spark.read.parquet(s"$out/batch=2")
      .collect().map(_.toString).sorted.toSeq
    val snapSt = spark.read.parquet(s"$state/batch=2")
      .collect().map(_.toString).sorted.toSeq
    Streams.quantileBatch(slice(2).toDF("g", "x"), 2L, "g", "x",
      state, out)
    assert(spark.read.parquet(s"$out/batch=2")
      .collect().map(_.toString).sorted.toSeq === snapOut)
    assert(spark.read.parquet(s"$state/batch=2")
      .collect().map(_.toString).sorted.toSeq === snapSt)
  }

  test("kmvStream: each batch's estimates equal the k-min replica over " +
      "the concatenation; k-bounded state; bit-identical batch replay") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val k = 8
    val slice = (0 until 3).map { b =>
      for {
        g <- Seq("a", "b"); i <- 0 until 40
      } yield (g, (b * 25 + i).toLong) // overlapping value windows
    }
    val staging = Files.createTempDirectory("graft_kv_stage")
    slice.zipWithIndex.foreach { case (rows, b) =>
      val tmp = Files.createTempDirectory(s"graft_kv_tmp$b")
      rows.toDF("g", "v").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = Paths.get(staging.toString, f"slice_$b%03d.parquet")
      Files.copy(part.toPath, dest)
      Files.setLastModifiedTime(dest,
        FileTime.fromMillis(1700000000000L + b * 60000L))
    }
    val out = "file://" + Files.createTempDirectory("graft_kv_out").toString + "/o"
    val state = "file://" + Files.createTempDirectory("graft_kv_state").toString + "/s"
    val ck = Files.createTempDirectory("graft_kv_ck").toString
    val schema = slice(0).toDF("g", "v").schema
    val q = Streams.kmvStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staging.toString),
      "g", "v", k, state, out, ck)
    assert(q.awaitTermination(180000))
    // replica: per batch i, the k smallest md5s over batches 0..i
    for (i <- 0 until 3) {
      val vals = (0 to i).flatMap(b => slice(b)).groupBy(_._1).view
        .mapValues(_.map(_._2.toString).distinct.map(md5hex).sorted).toMap
      val expect = vals.toSeq.map { case (g, hs) =>
        val kept = hs.take(k)
        val est =
          if (kept.size < k) kept.size.toLong
          else (k - 1).toLong * (1L << 56) / java.lang.Long.parseLong(
            kept.last.substring(0, 14), 16)
        (g, kept.size.toLong, est)
      }.sortBy(_._1)
      val got = spark.read.parquet(s"$out/batch=$i")
        .orderBy($"g").as[(String, Long, Long)].collect().toSeq
      assert(got === expect, s"batch $i")
    }
    // bounded state: <= 2 batch dirs, <= k rows per group
    val stDirs = graft.sources.StoreFs.childNames(spark, state)
      .filter(_.startsWith("batch="))
    assert(stDirs.length <= 2)
    assert(spark.read.parquet(s"$state/batch=2").count() <= 2L * k)
    // crash-replay bit-identical
    val snapOut = spark.read.parquet(s"$out/batch=2")
      .collect().map(_.toString).sorted.toSeq
    val snapSt = spark.read.parquet(s"$state/batch=2")
      .collect().map(_.toString).sorted.toSeq
    Streams.kmvBatch(slice(2).toDF("g", "v"), 2L, "g", "v", k, state, out)
    assert(spark.read.parquet(s"$out/batch=2")
      .collect().map(_.toString).sorted.toSeq === snapOut)
    assert(spark.read.parquet(s"$state/batch=2")
      .collect().map(_.toString).sorted.toSeq === snapSt)
  }

  test("stratifiedStream: each batch's sample is bit-identical to " +
      "allocateStratified over the concatenation; bounded state; " +
      "bit-identical batch replay") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val budget = 20L
    // three strata with drifting shares so the allocation moves
    val slice = (0 until 3).map { b =>
      for {
        (s, n) <- Seq(("x", 30), ("y", 20 + 10 * b), ("z", 5))
        i <- 0 until n
      } yield (s, (b * 1000 + s.hashCode.abs % 97 * 100 + i).toLong)
    }
    val staging = Files.createTempDirectory("graft_ss_stage")
    slice.zipWithIndex.foreach { case (rows, b) =>
      val tmp = Files.createTempDirectory(s"graft_ss_tmp$b")
      rows.toDF("s", "id").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = Paths.get(staging.toString, f"slice_$b%03d.parquet")
      Files.copy(part.toPath, dest)
      Files.setLastModifiedTime(dest,
        FileTime.fromMillis(1700000000000L + b * 60000L))
    }
    val out = "file://" + Files.createTempDirectory("graft_ss_out").toString + "/o"
    val state = "file://" + Files.createTempDirectory("graft_ss_state").toString + "/s"
    val ck = Files.createTempDirectory("graft_ss_ck").toString
    val schema = slice(0).toDF("s", "id").schema
    val q = Streams.stratifiedStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staging.toString),
      "id", "s", budget, state, out, ck)
    assert(q.awaitTermination(180000))
    for (i <- 0 until 3) {
      val concat = (0 to i).flatMap(b => slice(b)).toDF("s", "id")
      val expect = graft.operators.Curation
        .allocateStratified(concat, "id", "s", budget)
        .as[(String, Long)].collect().toSeq
      assert(expect.length === budget)
      val got = spark.read.parquet(s"$out/batch=$i")
        .orderBy($"s", $"id").as[(String, Long)].collect().toSeq
      assert(got === expect, s"batch $i")
    }
    // bounded state: <= 2 batch dirs; list <= budget per stratum
    val stDirs = graft.sources.StoreFs.childNames(spark, state)
      .filter(_.startsWith("batch="))
    assert(stDirs.length <= 2)
    assert(spark.read.parquet(s"$state/batch=2/list")
      .groupBy($"__s").count().agg(max($"count")).as[Long].head()
      <= budget)
    // crash-replay bit-identical
    def snap(p: String) = spark.read.parquet(p)
      .collect().map(_.toString).sorted.toSeq
    val snapOut = snap(s"$out/batch=2")
    val snapL = snap(s"$state/batch=2/list")
    val snapC = snap(s"$state/batch=2/counts")
    Streams.stratifiedBatch(slice(2).toDF("s", "id"), 2L, "id", "s",
      budget, state, out, 1 << 20)
    assert(snap(s"$out/batch=2") === snapOut)
    assert(snap(s"$state/batch=2/list") === snapL)
    assert(snap(s"$state/batch=2/counts") === snapC)
  }

  test("moversStream: per-batch top-k movers equal the batch operator " +
      "over the concatenation; two-period-bounded state; bit-identical " +
      "batch replay") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import java.sql.Timestamp
    def ts(p: Long, i: Long) = new Timestamp((p * 10000000L + i) / 1000)
    // nondecreasing periods across slices (the drain contract): the
    // active period advances 1 -> 2 -> 3 while keys churn
    val slice = Seq(
      (1 to 4).map(i => ("a", ts(1, i))) ++ Seq(("b", ts(1, 1))),
      Seq(("a", ts(2, 1))) ++ (1 to 3).map(i => ("b", ts(2, i))) ++
        (1 to 2).map(i => ("c", ts(2, i))),
      (1 to 5).map(i => ("c", ts(3, i))) ++ Seq(("d", ts(3, 1))))
    val staging = Files.createTempDirectory("graft_mv_stage")
    slice.zipWithIndex.foreach { case (rows, b) =>
      val tmp = Files.createTempDirectory(s"graft_mv_tmp$b")
      rows.toDF("k", "t").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = Paths.get(staging.toString, f"slice_$b%03d.parquet")
      Files.copy(part.toPath, dest)
      Files.setLastModifiedTime(dest,
        FileTime.fromMillis(1700000000000L + b * 60000L))
    }
    val out = "file://" + Files.createTempDirectory("graft_mv_out").toString + "/o"
    val state = "file://" + Files.createTempDirectory("graft_mv_state").toString + "/s"
    val ck = Files.createTempDirectory("graft_mv_ck").toString
    val schema = slice(0).toDF("k", "t").schema
    val q = Streams.moversStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staging.toString),
      "k", "t", 10000000L, 10, state, out, ck)
    assert(q.awaitTermination(180000))
    for (i <- 0 until 3) {
      val concat = (0 to i).flatMap(b => slice(b)).toDF("k", "t")
      val expect = graft.operators.Analytics
        .topMovers(concat, "k", "t", 10000000L, 10)
        .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
      val got = spark.read.parquet(s"$out/batch=$i")
        .orderBy(abs($"delta").desc, $"k")
        .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
      assert(got === expect, s"batch $i")
    }
    // batch 2's movers see c surge (0 of period 2... c had 2 in p2,
    // 5 in p3) and a/b vanish from the window
    val b2 = spark.read.parquet(s"$out/batch=2")
      .as[(String, Long, Long, Long, Option[Long])].collect().toSet
    assert(b2.contains(("c", 2L, 5L, 3L, Some(1500000L))))
    assert(b2.contains(("b", 3L, 0L, -3L, Some(-1000000L))))
    // state bounded by the last two periods
    val st = spark.read.parquet(s"$state/batch=2")
    assert(st.select($"__p").distinct().as[Long].collect().toSet
      === Set(2L, 3L))
    // crash-replay bit-identical
    def snap(p: String) = spark.read.parquet(p)
      .collect().map(_.toString).sorted.toSeq
    val snapOut = snap(s"$out/batch=2")
    val snapSt = snap(s"$state/batch=2")
    Streams.moversBatch(slice(2).toDF("k", "t"), 2L, "k", "t",
      10000000L, 10, state, out)
    assert(snap(s"$out/batch=2") === snapOut)
    assert(snap(s"$state/batch=2") === snapSt)
  }

  test("transitionStream: cumulative matrix per batch equals the batch " +
      "operator over the concatenation (cross-batch boundary pairs " +
      "counted once); bounded state; bit-identical batch replay") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    // keys span slices so boundary transitions exist at every seam
    val all = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (2L, 3L, "A"),   // slice 0
      (1L, 4L, "A"), (2L, 5L, "A"), (2L, 6L, "C"),   // slice 1
      (1L, 7L, "C"), (3L, 8L, "B"), (2L, 9L, "A"))   // slice 2
    val slice = (0 until 3).map(b => all.slice(b * 3, b * 3 + 3))
    val staging = Files.createTempDirectory("graft_tr_stage")
    slice.zipWithIndex.foreach { case (rows, b) =>
      val tmp = Files.createTempDirectory(s"graft_tr_tmp$b")
      rows.toDF("u", "t", "e").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = Paths.get(staging.toString, f"slice_$b%03d.parquet")
      Files.copy(part.toPath, dest)
      Files.setLastModifiedTime(dest,
        FileTime.fromMillis(1700000000000L + b * 60000L))
    }
    val out = "file://" + Files.createTempDirectory("graft_tr_out").toString + "/o"
    val state = "file://" + Files.createTempDirectory("graft_tr_state").toString + "/s"
    val ck = Files.createTempDirectory("graft_tr_ck").toString
    val q = Streams.transitionStream(
      spark.readStream.schema(slice(0).toDF("u", "t", "e").schema)
        .option("maxFilesPerTrigger", 1).parquet(staging.toString),
      "u", Seq("t"), "e", state, out, ck)
    assert(q.awaitTermination(180000))
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"from_state", $"to_state", $"n", $"n_from", $"prob")
        .orderBy($"from_state", $"to_state")
        .as[(String, String, Long, Long, Double)].collect().toSeq
    for (i <- 0 until 3) {
      val expect = rowsOf(graft.operators.Analytics.transitionMatrix(
        all.take((i + 1) * 3).toDF("u", "t", "e"), "u", Seq("t"), "e"))
      assert(rowsOf(spark.read.parquet(s"$out/batch=$i")) === expect,
        s"batch $i cumulative matrix != batch operator")
    }
    // the final matrix really contains a cross-batch boundary pair:
    // key 1's B (t=2, slice 0) -> A (t=4, slice 1)
    assert(rowsOf(spark.read.parquet(s"$out/batch=2"))
      .exists(r => r._1 == "B" && r._2 == "A" && r._3 >= 1L))
    // bounded state: ≤ 2 batch dirs; last/ ≤ |keys| rows
    val stDirs = graft.sources.StoreFs.childNames(spark, state)
      .filter(_.startsWith("batch="))
    assert(stDirs.length <= 2, stDirs.mkString(","))
    assert(spark.read.parquet(s"$state/batch=2/last").count() <= 3L)
    // crash-replay: re-running batch 2 against batch 1's state is
    // bit-identical in output and both state surfaces
    val snaps = Seq(s"$out/batch=2", s"$state/batch=2/counts",
      s"$state/batch=2/last").map(p =>
      p -> spark.read.parquet(p).collect().map(_.toString).sorted.toSeq)
    Streams.transitionBatch(slice(2).toDF("u", "t", "e"), 2L,
      "u", Seq("t"), "e", state, out)
    snaps.foreach { case (p, snap) =>
      assert(spark.read.parquet(p)
        .collect().map(_.toString).sorted.toSeq === snap, p)
    }
  }

  test("streaming dedup within watermark removes duplicate keys") {
    // duplicate the source rows → dropDuplicatesWithinWatermark must halve
    val out = Files.createTempDirectory("graft_dedup_out").toString
    val ckpt = Files.createTempDirectory("graft_dedup_ckpt").toString
    val stream = Streams.eventsStream(spark, sf)
    val dup = stream.union(stream)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dup.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out).start()
    assert(q.awaitTermination(120000))
    val n = spark.read.parquet(out).select($"event_id").distinct().count()
    val total = spark.read.parquet(out).count()
    assert(n === Tables.events(spark, sf).count())
    assert(total === n) // no duplicates in the sink
  }
}
