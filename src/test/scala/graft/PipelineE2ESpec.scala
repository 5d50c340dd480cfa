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
}
