package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucketed-table aging curve (r13 verdict task #4): `appendBucketed`
  * accretes files-per-bucket — each append writes its own per-bucket
  * files, within-bucket sort order across files is gone, and the
  * exchange-free join pays a growing scan fan-in plus a Sort. This
  * harness measures that decay directly: the SAME events data lands as
  * 1 / 8 / 64 appends into a bucketed table, and the q111-shaped join +
  * same-key aggregate is timed against each layout (broadcast disabled,
  * so the bucketed path is actually exercised — the q111 plan-guard
  * discipline). The one-shot [[graft.operators.Scale.writeBucketed]]
  * rewrite is timed too, so the "when does rewrite pay for itself"
  * threshold in its scaladoc is a measured number, not a guess.
  *
  * Usage: `runMain graft.tools.BucketAging <sfDir> [appendCounts...]`
  * (defaults 1 8 64). Three timed passes per layout; min of the last
  * two reported. Results recorded in SCALING.md.
  */
object BucketAging {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val appendCounts =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 8, 64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Scale
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("value"))
    val cust = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val base =
      java.nio.file.Files.createTempDirectory("graft_bkt_aging_").toString
    val custT = "graft_aging_cust"
    Scale.writeBucketed(cust, custT, "user_id", buckets = 8,
      path = base + "/cust")
    // broadcast would bypass the bucketed layout entirely — disable it
    // so the measured join IS the co-bucketed sort-merge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    appendCounts.foreach { n =>
      val evT = s"graft_aging_ev_$n"
      // n disjoint hash slices of the SAME rows — layout varies, data
      // does not, so time deltas are pure file-accretion cost
      def slice(i: Int) =
        ev.filter(pmod(hash(col("user_id"), col("value")), lit(n)) === i)
      Scale.writeBucketed(slice(0), evT, "user_id", buckets = 8,
        path = base + s"/ev_$n")
      (1 until n).foreach(i =>
        Scale.appendBucketed(slice(i), evT, "user_id", buckets = 8))
      val files = Option(new java.io.File(base + s"/ev_$n").listFiles())
        .map(_.count(_.getName.startsWith("part-"))).getOrElse(0)
      val joined = spark.table(evT).join(spark.table(custT), Seq("user_id"))
        .groupBy(col("user_id"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(joined.queryExecution.executedPlan.toString).size
      def once(): Double = {
        val t0 = System.nanoTime()
        joined.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t = Seq(once(), once(), once())
      println(f"[aging] appends=$n%-3d files=$files%-5d exchanges=$exchanges " +
        f"join min2=${t.tail.min}%.3f s  all=${t.map(x => f"$x%.2f").mkString("/")}")
      val t0 = System.nanoTime()
      Scale.writeBucketed(spark.table(evT), s"graft_aging_rw_$n", "user_id",
        buckets = 8, path = base + s"/rw_$n")
      println(f"[aging] rewrite(appends=$n) ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
