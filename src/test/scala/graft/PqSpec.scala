package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Pq
import graft.sources.VectorStore

/** Product quantization (operators/Pq.scala): trained model shape,
  * valid codes, ADC + exact rerank equals the full-precision probe
  * when every candidate is reranked (the only approximations are the
  * codes, washed out by the rerank, and bucket pruning, identical on
  * both sides), and the PQ store is strictly smaller on disk than the
  * int8 store (m bytes vs dim bytes per vector).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val nBits = 4
  private lazy val src = Tables.embeddings(spark, sf)
  private lazy val model = Pq.train(src, "vec_id", "embedding", 64,
    m = 8, k = 16, maxIter = 5)

  test("model shape and deterministic valid codes") {
    assert(model.m === 8 && model.dsub === 8)
    assert(model.codebooks.forall(b => b.length === 16 && b.forall(_.length === 8)))
    val codes = src.select(Pq.encodeExpr($"embedding", model).as("c"))
      .as[Seq[Byte]].collect()
    assert(codes.forall(c => c.length === 8 && c.forall(b => b >= 0 && b < 16)))
    val again = src.select(Pq.encodeExpr($"embedding", model).as("c"))
      .as[Seq[Byte]].collect()
    assert(codes.toSeq === again.toSeq)
  }

  test("IVF-PQ: exhaustive settings equal brute-force top-k; cell directories prune at plan time") {
    import graft.operators.Similarity
    val cents = Similarity.kMeans(src, "vec_id", "embedding", 16, maxIter = 5).centroids
    val path = Files.createTempDirectory("graft_ivfpq").toString
    Pq.writeStoreIvf(src, "vec_id", "embedding", path, model, cents)
    val probe = src.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble).toSeq
    // nProbe = nList + mCand = corpus: the ONLY approximations (cell
    // pruning, code-ordered candidates) are disabled → exact equality
    val exact = Similarity.topKCosine(src, "embedding", probe, 10, "vec_id")
      .as[(Long, Double)].collect().toSeq
    val full = Pq.topKIvf(spark, path, src, "vec_id", "embedding", probe,
        model, cents, k = 10, mCand = src.count().toInt, nProbe = 16)
      .as[(Long, Double)].collect().toSeq
    assert(full === exact)
    // plan-time pruning: the cell filter reaches PartitionFilters
    val cells = Pq.probeCells(probe, cents, 4)
    assert(cells.length === 4 && cells.distinct.length === 4)
    val plan = spark.read.parquet(path).filter($"cell".isin(cells: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.split("PartitionFilters")(1).contains("cell"), plan)
    // pruned probe: the probe's own cell is its nearest, so self is
    // never pruned and reranks first at sim 1.0
    val pruned = Pq.topKIvf(spark, path, src, "vec_id", "embedding", probe,
        model, cents, k = 10, mCand = 50, nProbe = 4)
      .as[(Long, Double)].collect().toSeq
    assert(pruned.head === ((0L, 1.0)))

    // incremental maintenance: bulk build == append-built store, and
    // cell-store compaction keeps probes bit-identical with fewer files
    val inc = Files.createTempDirectory("graft_ivfpq_inc").toString + "/s"
    Pq.writeStoreIvf(src.filter($"vec_id" % 2 === 0), "vec_id", "embedding",
      inc, model, cents)
    (0 until 3).foreach { i =>
      Pq.appendIvf(src.filter($"vec_id" % 2 === 1 && $"vec_id" % 3 === i),
        "vec_id", "embedding", inc, model, cents)
    }
    def probeInc() = Pq.topKIvf(spark, inc, src, "vec_id", "embedding", probe,
        model, cents, k = 10, mCand = 50, nProbe = 4)
      .as[(Long, Double)].collect().toSeq
    assert(probeInc() === pruned)
    def nFiles(): Int = {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(inc)).iterator().asScala
        .count(f => f.toString.endsWith(".parquet"))
    }
    val before = nFiles()
    VectorStore.compact(spark, inc, nBits = 4, partCol = "cell")
    assert(probeInc() === pruned)
    assert(nFiles() < before, s"$before -> ${nFiles()}")
  }

  test("ADC + exact rerank with full mCand equals the full-precision store probe; " +
      "PQ store smaller on disk than int8 store") {
    val full = Files.createTempDirectory("graft_pq_full").toString
    VectorStore.write(src, "vec_id", "embedding", full, nBits)
    val int8 = Files.createTempDirectory("graft_pq_int8").toString
    VectorStore.writeQuantized(src, "vec_id", "embedding", int8, nBits)
    val pq = Files.createTempDirectory("graft_pq_store").toString
    Pq.writeStore(src, "vec_id", "embedding", pq, model, nBits)

    val probe = src.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble).toSeq
    val exact = VectorStore.topK(spark, full, "vec_id", "embedding", probe, 10, nBits)
      .as[(Long, Double)].collect().toSeq
    val reranked = Pq.topK(spark, pq, src, "vec_id", "embedding", probe, model,
        k = 10, mCand = src.count().toInt, nBits)
      .as[(Long, Double)].collect().toSeq
    assert(reranked === exact)

    // the probe's own row survives the ADC stage well inside top-50:
    // its ADC distance is just its own quantization error, far below
    // inter-point distances
    val approx50 = Pq.topKApprox(spark, pq, "vec_id", probe, model, 50, nBits)
      .as[(Long, Double)].collect()
    assert(approx50.map(_._1).contains(0L))
    assert(approx50.forall(_._2 >= 0.0))

    def parquetBytes(dir: String): Long = {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => Files.size(p)).sum
    }
    val pqB = parquetBytes(pq)
    val int8B = parquetBytes(int8)
    assert(pqB < int8B, s"PQ store not smaller: $pqB vs int8 $int8B")
  }
}
