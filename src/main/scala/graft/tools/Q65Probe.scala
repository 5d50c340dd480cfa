package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}

/** One-off attribution probe for the SCALING.md q65 study: how much of
  * the full-query time is pair generation vs the CC loop, and how many
  * pair edges actually survive the threshold at each scale. */
object Q65Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, sfDir)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val pairs = graft.operators.Dedup.ngramJaccardPairs(
      docs.withColumn("__g", lit(1)), "doc_id", "text", "__g",
      k = 3, threshold = 0.5)
    val mat = timed("pairs materialize")(pairs.localCheckpoint())
    println(s"[probe] n_pairs = ${mat.count()}")
    timed("cc on materialized") {
      graft.operators.Dedup.connectedComponents(
        docs.select(col("doc_id")), "doc_id", mat, "id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
    }
    timed("cc on lazy pairs") {
      graft.operators.Dedup.connectedComponents(
        docs.select(col("doc_id")), "doc_id", pairs, "id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
