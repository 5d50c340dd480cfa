package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunker

/** Chunker semantics per reference `src/rag/dataframes.rs:46-111`
  * (intended form — per-chunk text/tokens, SURVEY §2.9): threshold
  * passthrough, ⌈words/chunkWords⌉ splits, dense ordinals, lossless
  * reconstruction. */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("short text passes through as one full chunk") {
    // 400 words <= 512 tokens → single chunk carrying the FULL text
    // (not truncated to chunkWords — the dataframes.rs:55 short-circuit)
    val df = Seq((1L, doc(400))).toDF("id", "text")
    val out = Chunker.chunk(df, "text").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Int]("chunk_id") === 0)
    assert(out.head.getAs[String]("chunk_text") === doc(400))
    assert(out.head.getAs[Int]("chunk_tokens") === 400)
  }

  test("long text splits into ceil(words/384) chunks of <=384 words") {
    val df = Seq((1L, doc(1000))).toDF("id", "text")
    val out = Chunker.chunk(df, "text").orderBy($"chunk_id").collect()
    assert(out.length === 3) // ceil(1000/384)
    assert(out.map(_.getAs[Int]("chunk_id")).toSeq === Seq(0, 1, 2))
    assert(out.map(_.getAs[Int]("chunk_tokens")).toSeq === Seq(384, 384, 232))
    // lossless reconstruction
    val rejoined = out.map(_.getAs[String]("chunk_text")).mkString(" ")
    assert(rejoined === doc(1000))
  }

  test("boundary: exactly threshold+1 tokens splits") {
    val df = Seq((1L, doc(513))).toDF("id", "text")
    val out = Chunker.chunk(df, "text").collect()
    assert(out.length === 2)
  }

  test("custom thresholds + empty chunks dropped") {
    val df = Seq((1L, doc(48))).toDF("id", "text")
    val out = Chunker.chunk(df, "text", idealTokens = 32, chunkWords = 24)
      .orderBy($"chunk_id").collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[Int]("chunk_tokens")).toSeq === Seq(24, 24))
  }

  test("fixture docs reconstruct exactly") {
    val docs = Tables.documents(spark, sf)
    val chunked = Chunker.chunk(docs, "text", idealTokens = 32, chunkWords = 24)
    val rejoined = chunked.groupBy($"doc_id")
      .agg(concat_ws(" ", collect_list($"chunk_text")).as("rejoined"))
    val bad = rejoined.join(docs, "doc_id")
      .filter(trim($"text") =!= $"rejoined").count()
    assert(bad === 0)
  }
}
