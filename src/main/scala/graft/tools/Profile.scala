package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextOps

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = graft.Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())
    time("words")(docs.select(TextOps.words(col("text")).as("w")).count())
    time("shingles")(docs.select(Dedup.shingles(col("text"), 3).as("sh")).count())
    time("shingles+size")(docs.select(Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("sz", size(col("sh"))).count())
    val base = docs.select(col("source").as("grp"), col("doc_id").as("doc"),
      Dedup.shingles(col("text"), 3).as("sh")).withColumn("sz", size(col("sh")))
    time("explode")(base.select(col("grp"), col("doc"), col("sz"),
      explode(col("sh")).as("s")).count())
    val cached = base.cache()
    time("cache materialize")(cached.count())
    time("explode from cache")(cached.select(col("grp"), col("doc"), col("sz"),
      explode(col("sh")).as("s")).count())
    val exc = cached.select(col("grp"), col("doc"), col("sz"), explode(col("sh")).as("s"))
    val ac = exc.select(col("grp"), col("s"), col("doc").as("id_a"), col("sz").as("__sza"))
    val bc = exc.select(col("grp"), col("s"), col("doc").as("id_b"), col("sz").as("__szb"))
    time("join from cache")(ac.join(bc, Seq("grp", "s")).filter(col("id_a") < col("id_b")).count())
    val ex = base.select(col("grp"), col("doc"), col("sz"), explode(col("sh")).as("s"))
    val a = ex.select(col("grp"), col("s"), col("doc").as("id_a"), col("sz").as("__sza"))
    val b = ex.select(col("grp"), col("s"), col("doc").as("id_b"), col("sz").as("__szb"))
    time("join")(a.join(b, Seq("grp", "s")).filter(col("id_a") < col("id_b")).count())
    time("full q22")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", 3, 0.5).count())
    time("full q22 again")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", 3, 0.5).count())

    time("simhash sigs")(docs.select(Dedup.simhash(col("text")).as("s")).count())
    time("full q25")(Dedup.simhashNearDups(docs, "doc_id", "text", 3).count())
    val e = graft.Tables.embeddings(spark, sfDir)
    time("hyperplane bits")(e.select(
      graft.functions.VectorOps.hyperplaneBits(col("embedding"), 32).as("b")).count())
    time("full q27")(graft.operators.Similarity.annJoin(
      e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
      "vec_id", "vec_id", "embedding", 5).count())

    // plan audit: count exchanges/sorts in the heavier query plans
    for (q <- Seq("q40_centroid_assign", "q13_sessionize", "q22_ngram_jaccard",
        "q34_set_ops", "q39_asof_join")) {
      val plan = graft.SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(plan).length
      val so = "Sort ".r.findAllIn(plan).length
      println(s"[plan] $q exchanges=$ex sorts=$so")
    }
    spark.stop()
  }
}
