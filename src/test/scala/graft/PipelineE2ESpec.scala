package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextOps, VectorOps}
import graft.operators.{EmbedPipeline, RagPrompt}
import graft.sources.{SignatureStore, VectorStore}

/** q79 — the north-star production pipeline composed on the persisted
  * stores. The spec rebuilds every stage INDEPENDENTLY (its own
  * signature-store dedup, its own FULL-PRECISION vector store) and
  * asserts the declared query's retrieval equals the full-precision
  * probe bit-for-bit: the only approximations in the pipeline are the
  * int8 codes (washed out by the exact rerank, the q73 property) and
  * bucket pruning (identical buckets on both sides, since the bucket
  * is computed from the original vector in both stores).
  */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  test("q79 equals an independently-built full-precision store probe; prompts faithful") {
    val question = "query filter join aggregate window shuffle"
    val got = SparkEntry.queries("q79_pipeline_store")(spark, sf)
      .select($"rank", $"doc_id", $"sim", $"prompt")
      .as[(Int, Long, Double, String)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) === (1 to 5))
    assert(got.map(_._3).toSeq === got.map(_._3).sortBy(-_).toSeq)

    // independent rebuild of the ingested corpus: same dedup contract,
    // written with this spec's own store paths
    val docs = Tables.documents(spark, sf)
    val p = SignatureStore.Params(shingleK = 3, nBands = 8, rowsPerBand = 2)
    val sig = java.nio.file.Files.createTempDirectory("graft_p79_sig").toString
    SignatureStore.write(docs.filter($"doc_id" % 5 =!= 0), "doc_id", "text", sig, p)
    val batch = docs.filter($"doc_id" % 5 === 0)
    val dup = SignatureStore.dedupAgainstStore(batch, "doc_id", "text", sig, p, 0.5)
      .select($"id_new".as("doc_id")).distinct()
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
      .unionByName(batch.join(dup, Seq("doc_id"), "left_anti"))
    assert(corpus.count() < docs.count(), "dedup stage dropped nothing — fixture split broken")

    // full-precision store over the same embeddings; same probe
    val embedded = corpus.select($"doc_id", $"text",
      VectorOps.hashEmbed(TextOps.words($"text"), 64).as("embedding"))
    val vec = java.nio.file.Files.createTempDirectory("graft_p79_vec").toString
    VectorStore.write(embedded, "doc_id", "embedding", vec)
    val probe = EmbedPipeline.probeVector(spark, question, 64)
    val exact = VectorStore.topK(spark, vec, "doc_id", "embedding", probe, 5)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(r => (r._2, r._3)) === exact)

    // prompt fidelity: llama3 template wrapping question + THIS row's text
    val textById = embedded.select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    got.foreach { case (_, id, _, prompt) =>
      assert(prompt.startsWith("\n<|begin_of_text|>"))
      assert(prompt.contains(RagPrompt.SystemPrompt))
      assert(prompt.contains(question + "\n\nContext:\n" + textById(id)))
    }
  }

  test("streaming pipeline: ingest-with-dedup → embed → vector store equals the batch build") {
    import java.nio.file.Files
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val p = SignatureStore.Params(shingleK = 3, nBands = 16, rowsPerBand = 1)
    val threshold = 0.5

    // stage 1: micro-batched ingest with dedup (AvailableNow, file source)
    val staging = Files.createTempDirectory("graft_sp_stage").toString
    docs.repartition(4).write.mode("overwrite").parquet(staging)
    val sig = Files.createTempDirectory("graft_sp_sig").toString + "/s"
    val accepted = Files.createTempDirectory("graft_sp_acc").toString + "/a"
    val q1 = SignatureStore.ingestDedup(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(staging),
      "doc_id", "text", sig, accepted,
      Files.createTempDirectory("graft_sp_ck1").toString, p, threshold)
    assert(q1.awaitTermination(180000))

    // stage 2: embed survivors AS A STREAM off the accepted sink and
    // appendStream them into the vector store (the streaming half of
    // q79's batch pipeline)
    val accSchema = spark.read.parquet(accepted).schema
    val embStream = spark.readStream.schema(accSchema)
      .option("maxFilesPerTrigger", 4).parquet(accepted)
      .select($"doc_id".as("vec_id"),
        VectorOps.hashEmbed(TextOps.words($"text"), 64).as("embedding"))
    val streamed = Files.createTempDirectory("graft_sp_vs").toString + "/v"
    val q2 = VectorStore.appendStream(embStream, "vec_id", "embedding",
      streamed, Files.createTempDirectory("graft_sp_ck2").toString)
    assert(q2.awaitTermination(180000))

    // batch reference over the SAME survivors
    val survivors = spark.read.parquet(accepted).select($"doc_id", $"text")
    assert(survivors.count() > 0)
    val embBatch = survivors.select($"doc_id".as("vec_id"),
      VectorOps.hashEmbed(TextOps.words($"text"), 64).as("embedding"))
    val batchBuilt = Files.createTempDirectory("graft_sp_vsb").toString + "/v"
    VectorStore.write(embBatch, "vec_id", "embedding", batchBuilt)

    assert(spark.read.parquet(streamed).count() === survivors.count())
    val probeId = survivors.agg(min($"doc_id")).as[Long].head()
    val probe = embBatch.filter($"vec_id" === probeId)
      .select($"embedding").head().getSeq[Double](0).toSeq
    def top(path: String) = VectorStore
      .topK(spark, path, "vec_id", "embedding", probe, 10)
      .as[(Long, Double)].collect().toSeq
    val s = top(streamed)
    val b = top(batchBuilt)
    assert(s === b)
    assert(s.head === ((probeId, 1.0)))
  }
}
