package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query codegen demand probe (r17 verdict #2: the JIT code cache
  * ceiling — 2048 MB is the JVM hard max, reached at ~186 queries —
  * can only be attacked from the DEMAND side now). For every declared
  * query this measures, over one cold run each:
  *   - `classes`: Janino compilations (CodegenMetrics compile-count
  *     delta — each is one generated class; the JIT later compiles its
  *     hot methods into the code cache, so class volume IS the demand
  *     proxy);
  *   - `gen_kb`: generated source size delta (METRIC_SOURCE_CODE_SIZE
  *     is a histogram; its per-query mean × count approximates the
  *     volume — exact enough to rank offenders);
  *   - `loaded`: JVM loaded-class delta;
  *   - `cc_kb`: code-cache pool used-bytes delta (async JIT, noisy —
  *     directional only).
  * Prints per-query rows then the top-15 by `classes`. Run at sf0.01:
  * codegen volume is plan-shaped, not data-shaped.
  *
  * Usage: `runMain graft.tools.CodeCacheProbe <sfDir> [query ...]` */
object CodeCacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import org.apache.spark.metrics.source.CodegenMetrics
    val clm = java.lang.management.ManagementFactory.getClassLoadingMXBean
    import scala.jdk.CollectionConverters._
    def ccUsed(): Long = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
      .map(_.getUsage.getUsed).sum
    def compiles(): Long =
      CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    def srcBytesApprox(): Double = {
      val h = CodegenMetrics.METRIC_SOURCE_CODE_SIZE
      h.getCount.toDouble * h.getSnapshot.getMean
    }

    try graft.SparkEntry.entry(spark)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val rows = scala.collection.mutable.ArrayBuffer[(String, Long, Double, Long, Long, Double)]()
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
    for ((name, fn) <- qs) {
      val c0 = compiles(); val s0 = srcBytesApprox()
      val l0 = clm.getLoadedClassCount; val cc0 = ccUsed()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        println(s"[ccprobe] $name FAILED: ${e.getClass.getSimpleName}") }
      val dt = (System.nanoTime() - t0) / 1e9
      val row = (name, compiles() - c0, (srcBytesApprox() - s0) / 1024.0,
        (clm.getLoadedClassCount - l0).toLong, (ccUsed() - cc0) / 1024L, dt)
      rows += row
      println(f"[ccprobe] ${row._1}%-28s classes=${row._2}%4d " +
        f"gen_kb=${row._3}%9.1f loaded=${row._4}%5d cc_kb=${row._5}%7d " +
        f"t=${row._6}%6.2f")
    }
    println(f"[ccprobe] TOTAL classes=${rows.map(_._2).sum} " +
      f"gen_mb=${rows.map(_._3).sum / 1024.0}%.1f " +
      f"cc_mb_end=${ccUsed() / 1024.0 / 1024.0}%.1f")
    println("[ccprobe] top-15 by generated classes:")
    rows.sortBy(-_._2).take(15).foreach { r =>
      println(f"[ccprobe]   ${r._1}%-28s classes=${r._2}%4d " +
        f"gen_kb=${r._3}%9.1f")
    }
    spark.stop()
  }
}
