package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen/classloading otherwise lands on
    // whichever query the Map iterates first (~5 s of noise)
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // A failed query must NOT record its (tiny) time-to-exception as a
    // timing — that would report a breakage as a speedup. Failures are
    // reported in an explicit "errors" key and excluded from min().
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      // noop sink forces full evaluation of every declared column —
      // count() would let Catalyst prune the computed columns (the
      // whole cost of projection-shaped queries like hash-embed)
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    // Two timed passes; report BOTH the cold (pass-1) and min-of-2 totals
    // so cross-round comparisons stay apples-to-apples with the r1-r3
    // single-cold-pass artifacts. Per-query numbers are min-of-2: a cold
    // driver run (fresh JVM, contended codegen/JIT) otherwise lands
    // 3-15× phantom regressions on whichever queries compile first
    // (round-2 verdict: the r2 artifact recorded 143.5 s where a warm
    // run measures ~63 s). The min of two runs measures the code, not
    // the JIT.
    // Randomized (seeded) run order, reshuffled INDEPENDENTLY per pass:
    // with a fixed alphabetical order, a transient contention window
    // (VM CPU-steal) lands on the same run-order prefix in both passes,
    // so min-of-2 can't wash it and the artifact reads as a per-query
    // regression (r8 verdict: q01-q16 inflated 1.4-2x with untouched
    // code). Two different orders make a wall-clock window hit
    // DIFFERENT queries in each pass; the seed is logged for replay.
    // Contention forensics (r10 verdict: three rounds of headline
    // numbers distorted by neighbor VM load): snapshot loadavg and
    // cumulative steal ticks around the timed passes so the artifact
    // itself says whether the window was quiet. steal_pct is the
    // hypervisor-stolen share of ALL cpu ticks across the run — the
    // direct signature of the "uniform inflation" failure mode.
    def loadAvg(): Double = scala.util.Try(
      scala.io.Source.fromFile("/proc/loadavg").mkString
        .split("\\s+")(0).toDouble).getOrElse(-1.0)
    def cpuTicks(): (Long, Long) = scala.util.Try {
      val f = scala.io.Source.fromFile("/proc/stat")
      val parts = try f.getLines().next().split("\\s+").drop(1).map(_.toLong)
      finally f.close()
      (parts.sum, if (parts.length > 7) parts(7) else 0L)
    }.getOrElse((0L, 0L))
    val loadPre = loadAvg()
    val (ticksPre, stealPre) = cpuTicks()
    val seed = sys.env.get("SPARK_GRAFT_BENCH_SEED").map(_.toLong)
      .getOrElse(System.nanoTime())
    val rnd = new scala.util.Random(seed)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val passStart = System.nanoTime()
    val pass1 = rnd.shuffle(ordered).map { case (n, f) => n -> runOnce(n, f) }
    val pass2 = rnd.shuffle(ordered).map { case (n, f) => n -> runOnce(n, f) }
    // A single-query contention spike can survive min-of-2 (r11: q41
    // measured 3.09 s in one Bench while BenchOne x3 right after read
    // 1.64-1.87 s). A third independently-shuffled pass makes that need
    // THREE unlucky windows on the same query — but only when the first
    // two passes were fast enough that the extra pass cannot threaten
    // the driver's run budget.
    val twoPassSecs = (System.nanoTime() - passStart) / 1e9
    val pass3 =
      if (twoPassSecs < 240.0)
        rnd.shuffle(ordered).map { case (n, f) => n -> runOnce(n, f) }
      else Seq.empty
    val nPasses = if (pass3.nonEmpty) 3 else 2
    val p2ByName = pass2.toMap
    val p3ByName = pass3.toMap
    val merged = pass1.map { case (n, r1) =>
      val attempts = Seq(Some(r1), Some(p2ByName(n)), p3ByName.get(n)).flatten
      val times = attempts.collect { case Right(t) => t }
      val best =
        if (times.nonEmpty) Right(times.min)
        else attempts.head
      (n, best, r1)
    }.sortBy(_._1)
    val results = merged.collect { case (n, Right(t), _) => n -> t }
    val errors = merged.collect { case (n, Left(e), _) => n -> e }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-query pass-1 times: the honest cold cost of the queries whose
    // warm number excludes a per-(JVM, dataset) cached build (stores,
    // quantizers, curated sets) — cold_total alone lumps them together
    val coldQs = merged.collect { case (n, _, Right(t)) => n -> t }
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, e) =>
      s"\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val coldTotal = merged.collect { case (_, _, Right(t)) => t }.sum
    val loadPost = loadAvg()
    val (ticksPost, stealPost) = cpuTicks()
    val stealPct =
      if (ticksPost > ticksPre)
        100.0 * (stealPost - stealPre) / (ticksPost - ticksPre)
      else -1.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,"n_passes":$nPasses,"n_failed":${errors.size},"errors":$errJson,"order_seed":$seed,"load_pre":$loadPre,"load_post":$loadPost,"steal_pct":$stealPct,"queries":$qs,"cold_queries":$coldQs,"sf":"$sfDir"}"""
    // The driver captures a bounded ~2000-char tail of stdout. The full
    // line (two 110-query maps, ~7 KB) outgrew that in r12 — parsed:null,
    // and the tail happened to show the COLD map, misreporting q93 at
    // 46 s where the warm number is 0.54 s. The full record therefore
    // goes ONLY to BENCH.out, and stdout gets a compact summary line
    // (headline totals + the slowest 10 warm queries, 3 dp) that fits
    // the tail with room for sbt's trailing "[success]" noise.
    // Resolve against an override or the launch CWD and log the absolute
    // path so a runner launched outside the repo root can find the file.
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.out")).toAbsolutePath
    java.nio.file.Files.write(outPath, (json + "\n").getBytes("UTF-8"))
    System.err.println(s"[bench] wrote $outPath")
    val slowest = results.sortBy(-_._2).take(10)
      .map { case (k, v) => f""""$k":${v}%.3f""" }
      .mkString("{", ",", "}")
    // the stdout line must stay inside the driver's ~2000-char tail even
    // in the many-failures case (exactly when the artifact matters most):
    // cap errors to the first 5 query NAMES — full messages are in the
    // errJson that goes to BENCH.out above
    val errNames = errors.take(5).map { case (k, _) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val errCompact =
      if (errors.size > 5) s"""{"failed_first5":$errNames,"note":"messages in $outPath"}"""
      else if (errors.nonEmpty) s"""{"failed":$errNames,"note":"messages in $outPath"}"""
      else "{}"
    val compact = f"""{"metric":"total","value":$total%.3f,"unit":"sec","cold_total":$coldTotal%.3f,"n_queries":${results.size},"n_passes":$nPasses,"n_failed":${errors.size},"errors":$errCompact,"order_seed":$seed,"load_pre":$loadPre,"load_post":$loadPost,"steal_pct":$stealPct%.2f,"queries":$slowest,"queries_note":"slowest 10 of ${results.size}; full per-query + cold maps in $outPath","sf":"$sfDir"}"""
    println(compact)
    spark.stop()
  }
}
