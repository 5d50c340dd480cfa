package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.sources.VectorStore

/** Persisted partition-pruned vector store (sources/VectorStore.scala):
  * the disk layout must round-trip losslessly, the probe read must
  * prune at the PLAN level (PartitionFilters, not a post-scan filter),
  * and the pruned top-k must equal the brute-force top-k over the same
  * candidate buckets.
  */
class VectorStoreSpec extends SparkSpec {
  import spark.implicits._

  private val nBits = 4

  private lazy val path: String = {
    val p = Files.createTempDirectory("graft_vecstore").toString
    VectorStore.write(Tables.embeddings(spark, sf), "vec_id", "embedding", p, nBits)
    p
  }

  test("write round-trips every vector; directory bucket equals recomputed bucket") {
    val src = Tables.embeddings(spark, sf)
    val back = spark.read.parquet(path)
    assert(back.count() === src.count())
    val mismatched = back
      .withColumn("recomputed", VectorStore.bucketOf($"embedding", nBits))
      .filter($"bucket" =!= $"recomputed").count()
    assert(mismatched === 0L)
    val nBuckets = back.select($"bucket").distinct().count()
    assert(nBuckets > 1 && nBuckets <= (1 << nBits))
  }

  test("probe read prunes partitions at plan time (PartitionFilters carry the bucket filter)") {
    val probe = Tables.embeddings(spark, sf).filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble).toSeq
    val buckets = VectorStore.probeBuckets(spark, probe, nBits)
    assert(buckets.length === nBits + 1 && buckets.distinct.length === buckets.length)
    val plan = VectorStore.readCandidates(spark, path, buckets)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.split("PartitionFilters")(1).contains("bucket"), plan)
  }

  test("streaming AvailableNow index build equals the batch-built store") {
    val src = Tables.embeddings(spark, sf)
    // stage the corpus as parquet so it can be re-read as a file stream
    val staging = Files.createTempDirectory("graft_vs_stage").toString
    src.repartition(4).write.mode("overwrite").parquet(staging)
    val streamed = Files.createTempDirectory("graft_vs_stream").toString
    val checkpoint = Files.createTempDirectory("graft_vs_ckpt").toString
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 2) // force multiple micro-batches
      .parquet(staging)
    val q = VectorStore.appendStream(stream, "vec_id", "embedding",
      streamed, checkpoint, nBits)
    assert(q.awaitTermination(120000))
    val batchBuilt = spark.read.parquet(path)
      .select($"vec_id", $"bucket").as[(Long, Int)].collect().toMap
    val streamBuilt = spark.read.parquet(streamed)
      .select($"vec_id", $"bucket").as[(Long, Int)].collect().toMap
    assert(streamBuilt === batchBuilt)
    // the probe path works identically against the streamed store
    val probe = src.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble).toSeq
    val a = VectorStore.topK(spark, path, "vec_id", "embedding", probe, 10, nBits)
      .as[(Long, Double)].collect().toSeq
    val b = VectorStore.topK(spark, streamed, "vec_id", "embedding", probe, 10, nBits)
      .as[(Long, Double)].collect().toSeq
    assert(a === b)
  }

  test("pruned top-k equals brute-force top-k over the candidate buckets; self ranks first") {
    val probe = Tables.embeddings(spark, sf).filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble).toSeq
    val buckets = VectorStore.probeBuckets(spark, probe, nBits).toSet
    val got = VectorStore.topK(spark, path, "vec_id", "embedding", probe, 10, nBits)
      .as[(Long, Double)].collect().toSeq
    // brute force over the full table, restricted to the same buckets
    val probeCol = array(probe.map(lit): _*)
    val expected = Tables.embeddings(spark, sf)
      .withColumn("bucket", VectorStore.bucketOf($"embedding", nBits))
      .filter($"bucket".isInCollection(buckets))
      .select($"vec_id", VectorOps.cosine6($"embedding", probeCol).as("sim"))
      .orderBy($"sim".desc, $"vec_id")
      .limit(10).as[(Long, Double)].collect().toSeq
    assert(got === expected)
    assert(got.head === ((0L, 1.0))) // the probe's own row is never pruned away
  }
}
