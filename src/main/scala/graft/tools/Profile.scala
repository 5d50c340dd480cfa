package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // q96 stage breakdown (run twice; read the SECOND block, warm)
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val cur = time("curate+checkpoint") {
        graft.SparkEntry.curatedForProfile(spark, sfDir)
      }
      val mixed = time("mixToBudget") {
        val m = graft.operators.Curation.mixToBudget(
          cur, "doc_id", "source", "tokens", 600L)
        m.write.format("noop").mode("overwrite").save(); m
      }
      val order = time("shuffleShards") {
        val o = graft.operators.Packing.shuffleShards(mixed, "doc_id", 4)
          .select(col("doc_id"),
            (col("shard").cast("long") * lit(1L << 32) + col("pos")).as("ord"))
        o.write.format("noop").mode("overwrite").save(); o
      }
      val toks = time("join+bpe") {
        val t = mixed.join(order, Seq("doc_id"))
          .select(col("ord"),
            graft.functions.TextOps.bpeTokens(col("text")).as("toks"))
        t.write.format("noop").mode("overwrite").save(); t
      }
      time("packSequences") {
        graft.operators.Packing.packSequences(toks, "ord", "toks", 256)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
