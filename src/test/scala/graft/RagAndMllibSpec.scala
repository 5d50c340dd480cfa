package graft

import org.apache.spark.sql.functions._
import graft.operators.{RagPrompt, Similarity}

class RagAndMllibSpec extends SparkSpec {
  import spark.implicits._

  test("llama3 prompt matches the reference template shape") {
    val p = Seq(Tuple1("ctx body")).toDF("text")
      .select(RagPrompt.llama3(
        RagPrompt.contextMessage("Why not load an CSV next time?", $"text")).as("p"))
      .as[String].head()
    assert(p.startsWith("\n<|begin_of_text|>\n<|start_header_id|>system<|end_header_id|>\n"))
    assert(p.contains(RagPrompt.SystemPrompt))
    assert(p.contains("<|start_header_id|>user<|end_header_id|>\nWhy not load an CSV next time?\n\nContext:\nctx body<|eot_id|>"))
    assert(p.endsWith("<|start_header_id|>assistant<|end_header_id|>"))
  }

  test("mllib LSH join: deterministic, dist is true euclidean") {
    val e = Tables.embeddings(spark, sf)
    val probes = e.filter($"vec_id" < 3)
    val corpus = e.filter($"vec_id" >= 3)
    def run() = Similarity.mllibAnnJoin(probes, corpus,
      "vec_id", "vec_id", "embedding", 12.0)
      .as[(Long, Long, Double)].collect().toSet
    val r1 = run(); val r2 = run()
    assert(r1 === r2)
    assert(r1.nonEmpty)
    // spot-check one distance against a manual computation
    val (p0, n0, d0) = r1.head
    val va = e.filter($"vec_id" === p0).select($"embedding").as[Seq[Float]].head()
    val vb = e.filter($"vec_id" === n0).select($"embedding").as[Seq[Float]].head()
    val manual = math.sqrt(va.zip(vb).map { case (x, y) =>
      val dd = x.toDouble - y.toDouble; dd * dd
    }.sum)
    assert(math.abs(manual - d0) < 1e-4)
  }
}
