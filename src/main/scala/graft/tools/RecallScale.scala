package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN quality-at-scale harness (SCALING.md): measures recall@k of the
  * IVF paths against the exact top-k as the corpus grows, with the
  * cell count scaled ∝ N (constant expected cell SIZE, fixed nProbe) —
  * the production IVF regime, where the candidate count per probe is
  * held constant while the corpus grows. The question a time-only
  * scaling curve cannot answer: does the ANSWER stay good at 10× data,
  * or does flat latency hide collapsing recall?
  *
  * Usage: `runMain graft.tools.RecallScale <sfDir> <nList> [nProbe] [k]`
  * — e.g. nList 16 at m1 and 160 at m10 keeps ~|corpus|/nList vectors
  * per cell constant across the pair of runs.
  */
object RecallScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nList = args(1).toInt
    val nProbe = if (args.length > 2) args(2).toInt else 4
    val k = if (args.length > 3) args(3).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val e = graft.Tables.embeddings(spark, sfDir)
    val probes = e.filter(col("vec_id") < 64)
    val corpus = e.filter(col("vec_id") >= 64)
    val nCorpus = corpus.count()

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("probe_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().toSet

    val exact = pairs(graft.operators.Similarity.knnJoin(
      probes, corpus, "vec_id", "vec_id", "embedding", k))

    def recall(df: org.apache.spark.sql.DataFrame): Double =
      pairs(df).intersect(exact).size.toDouble / exact.size

    val rIvf = recall(graft.operators.Similarity.ivfJoin(
      probes, corpus, "vec_id", "vec_id", "embedding", k, nList, nProbe))
    val cents = graft.operators.Similarity.kMeans(
      e, "vec_id", "embedding", nList, maxIter = 5).centroids
    val rIvfT = recall(graft.operators.Similarity.ivfJoinTrained(
      probes, corpus, "vec_id", "vec_id", "embedding", k, cents, nProbe))

    println(f"[recall] corpus=$nCorpus nList=$nList nProbe=$nProbe k=$k  " +
      f"candFrac=${nProbe.toDouble / nList}%.3f  " +
      f"ivfJoin=$rIvf%.3f  ivfJoinTrained=$rIvfT%.3f")
    spark.stop()
  }
}
