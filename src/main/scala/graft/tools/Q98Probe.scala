package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, min}

/** Cardinality attribution for the q98 cluster form (SCALING.md):
  * distinct-signature count, band-bucket candidate volume, and
  * verified group-pair count at a fixture dir — distinguishes "the
  * signature space collapsed" (q98's win regime) from "the signature
  * cloud is dense" (where group-level pair generation is still
  * quadratic and the cluster form buys nothing over q25).
  *
  * Usage: `runMain graft.tools.Q98Probe <sfDir>`. */
object Q98Probe {
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
    val n = docs.count()
    val sigs = docs.select(col("doc_id").as("doc"), col("text"))
      .repartition(64, col("doc"))
      .select(col("doc"), graft.operators.Dedup.simhash(col("text"), 64).as("sig"))
    val groups = sigs.groupBy(col("sig")).agg(min(col("doc")).as("rep"))
      .localCheckpoint()
    val g = groups.count()
    // candidate volume of the band join over distinct sigs: sum c^2
    // over (band, half) buckets — the join's true output size before
    // the hamming verify
    import org.apache.spark.sql.functions.{array, lit, posexplode, shiftright, sum, count}
    val bandsArr = array((0 until 4).map(b =>
      shiftright(col("sig"), 16 * b).bitwiseAND(lit(0xFFFFL))): _*)
    val buckets = groups.select(col("rep"), posexplode(bandsArr).as(Seq("band", "half")))
      .groupBy(col("band"), col("half")).agg(count(lit(1)).as("c"))
    val cand = buckets.agg(sum(col("c") * col("c"))).head.getLong(0)
    val pairs = graft.operators.Dedup.simhashBandPairs(
      groups.select(col("rep").as("doc"), col("sig")), 3).count()
    println(s"[q98probe] dir=$sfDir docs=$n distinct_sigs=$g cand_sq=$cand group_pairs=$pairs")
    spark.stop()
  }
}
