package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Funnel}

/** q199 curation-funnel observability: per-stage counts from ONE
  * observed pass must equal independent per-stage counts, the
  * standalone report must cost exactly one materializing action for a
  * pure-predicate funnel, and a self-joining stage (the q56 near-dup
  * shape, checkpointed per the Funnel contract) must neither hang nor
  * double-count the upstream observations. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def docs: DataFrame =
    (1 to 100).map { i =>
      val text =
        if (i % 10 == 0) null
        else if (i % 7 == 0) "the quick brown fox " + i
        else "alpha beta gamma " + (i % 3)
      (i.toLong, text)
    }.toDF("id", "text")

  test("pure-predicate funnel: counts match independent replay, one action") {
    val stages = Seq[(String, DataFrame => DataFrame)](
      "nonnull" -> (df => df.filter(col("text").isNotNull)),
      "fox" -> (df => df.filter(col("text").startsWith("the quick"))))
    val actions = new java.util.concurrent.atomic.AtomicInteger
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = actions.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(ql)
    val rep =
      try Funnel.report(docs, stages).collect()
      finally {
        Thread.sleep(500)
        spark.listenerManager.unregister(ql)
      }
    val d = docs
    val c0 = d.count()
    val c1 = d.filter(col("text").isNotNull).count()
    val c2 = d.filter(col("text").isNotNull)
      .filter(col("text").startsWith("the quick")).count()
    assert(rep.map(r => (r.getInt(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq === Seq(
      (1, "nonnull", c0, c1, c0 - c1),
      (2, "fox", c1, c2, c1 - c2)))
    // ONE count() evaluates the whole observed chain (collect() of the
    // |stages|-row local report is a second, trivial execution)
    assert(actions.get() <= 2, s"${actions.get()} actions for the report")
  }

  test("row-increasing stage reads a negative drop") {
    val stages = Seq[(String, DataFrame => DataFrame)](
      "explode" -> (df => df.filter(col("text").isNotNull)
        .select(col("id"), explode(split(col("text"), " ")).as("w"))))
    val rep = Funnel.report(docs, stages).collect()
    assert(rep.length === 1)
    assert(rep(0).getLong(2) === 100L)
    assert(rep(0).getLong(3) > 100L)
    assert(rep(0).getLong(4) < 0L)
  }

  test("self-joining dedup stage: checkpointed input, no double-count, no hang") {
    val d = (1 to 60).map { i =>
      (i.toLong, if (i % 2 == 0) s"unique text number $i" else "same text")
    }.toDF("id", "text")
    val stages = Seq[(String, DataFrame => DataFrame)](
      "nonempty" -> (df => df.filter(length(col("text")) > 0)),
      "exact" -> (df => Dedup.exact(df, "id", "text")),
      "pair_drop" -> (df => {
        val ck = df.localCheckpoint()
        val drop = ck.as("a").join(ck.as("b"),
            col("a.text") === col("b.text") && col("a.id") < col("b.id"))
          .select(col("b.id").as("id")).distinct()
        ck.join(drop, Seq("id"), "left_anti")
      }))
    val rep = Funnel.report(d, stages).collect()
    // exact dedup keeps 30 evens + 1 odd; pair_drop is a no-op after
    // exact dedup (no duplicate text survives)
    assert(rep.map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      === Seq(("nonempty", 60L, 60L), ("exact", 60L, 31L),
        ("pair_drop", 31L, 31L)))
  }

  test("q199 stage chain: final count equals the q56 curated count") {
    val d = sf
    val docsTable = graft.Tables.documents(spark, d)
    val rep = Funnel.report(SparkEntry.fan(docsTable, "doc_id"),
      SparkEntry.curationFunnelStages)
    val rows = rep.collect()
    assert(rows.length === 5)
    assert(rows.map(_.getString(1)).toSeq ===
      Seq("noise", "lang", "quality", "exact_dedup", "near_dup"))
    // chain consistency: each stage's n_in is the previous n_out
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) === b.getLong(2))
    }
    assert(rows(0).getLong(2) === docsTable.count())
    val q56 = SparkEntry.queries("q56_curate")(spark, d).count()
    assert(rows(4).getLong(3) === q56)
    // observed() production form: attach to a real sink, read after
    val (fin, obs) = Funnel.observed(SparkEntry.fan(docsTable, "doc_id"),
      SparkEntry.curationFunnelStages)
    fin.write.format("noop").mode("overwrite").save()
    assert(obs.last._2.get("n") === q56)
  }

  test("funnelStream: per-batch == batch report, cumulative additive, " +
      "bounded state, bit-identical batch replay") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val slice = (0 until 3).map { b =>
      (1 to 50).map { i =>
        val text =
          if (i % 5 == 0) null
          else if ((i + b) % 3 == 0) "keep me " + i
          else "drop " + i
        ((b * 100 + i).toLong, text)
      }
    }
    val staging = Files.createTempDirectory("graft_fs_stage")
    slice.zipWithIndex.foreach { case (rows, b) =>
      val tmp = Files.createTempDirectory(s"graft_fs_tmp$b")
      rows.toDF("id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = Paths.get(staging.toString, f"slice_$b%03d.parquet")
      Files.copy(part.toPath, dest)
      Files.setLastModifiedTime(dest,
        FileTime.fromMillis(1700000000000L + b * 60000L))
    }
    val stages = Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)](
      "nonnull" -> (df => df.filter(col("text").isNotNull)),
      "keep" -> (df => df.filter(col("text").startsWith("keep"))))
    val out = "file://" + Files.createTempDirectory("graft_fs_out").toString + "/o"
    val state = "file://" + Files.createTempDirectory("graft_fs_state").toString + "/s"
    val ck = Files.createTempDirectory("graft_fs_ck").toString
    val schema = slice(0).toDF("id", "text").schema
    val q = graft.streaming.Streams.funnelStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staging.toString),
      stages, state, out, ck)
    assert(q.awaitTermination(180000))

    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Int, String, Long, Long, Long, Long, Long, Long)] =
      df.select($"stage_idx", $"stage", $"n_in", $"n_out", $"n_dropped",
          $"cum_in", $"cum_out", $"cum_dropped")
        .orderBy($"stage_idx")
        .as[(Int, String, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq
    for (i <- 0 until 3) {
      val got = rowsOf(spark.read.parquet(s"$out/batch=$i"))
      // per-batch halves == the batch operator over this slice alone
      val rep = Funnel.report(slice(i).toDF("id", "text"), stages)
        .as[(Int, String, Long, Long, Long)].collect().toSeq
      assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) === rep)
      // cumulative halves == sums of the per-batch reports so far
      val cums = (0 to i).map(b =>
        Funnel.report(slice(b).toDF("id", "text"), stages)
          .as[(Int, String, Long, Long, Long)].collect().toSeq)
      val expCum = cums.head.indices.map { s =>
        (cums.map(_(s)._3).sum, cums.map(_(s)._4).sum)
      }
      assert(got.map(t => (t._6, t._7)) === expCum)
      assert(got.forall(t => t._8 === t._6 - t._7))
    }
    // bounded state: only the last two batch= dirs survive
    val stateDirs = new java.io.File(state.stripPrefix("file://"))
      .listFiles().map(_.getName).filter(_.startsWith("batch=")).sorted
    assert(stateDirs.toSeq === Seq("batch=1", "batch=2"))
    // crash replay: re-running the LAST batch against its surviving
    // state reads the same input + state → bit-identical output
    val before = rowsOf(spark.read.parquet(s"$out/batch=2"))
    graft.streaming.Streams.funnelBatch(
      slice(2).toDF("id", "text"), 2L, stages, state, out)
    assert(rowsOf(spark.read.parquet(s"$out/batch=2")) === before)
  }
}
