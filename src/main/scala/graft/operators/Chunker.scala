package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** One chunk row of the typed chunker path. */
case class DocChunk(doc_id: Long, chunk_id: Int, chunk_text: String, chunk_tokens: Int)

/** The reference's 1→N text chunker (`src/rag/dataframes.rs:46-111`):
  * texts at or under `idealTokens` tokens pass through as one chunk;
  * longer texts split into ⌈words / chunkWords⌉ word-slices
  * (reference constants: ideal_token_size = 512, ideal_size = 384 =
  * 512·3/4, `src/rag/dataframes.rs:48-49`); empty chunks are dropped
  * (`:91`).
  *
  * We implement the reference's INTENDED semantics, not its bugs
  * (SURVEY §2.9): each chunk row carries its own chunk text, its own
  * token count, and a dense ordinal — the reference stores the full
  * original body and whole-message token count per chunk
  * (`src/rag/dataframes.rs:81,101`), a documented divergence.
  *
  * Spark-first shape: no custom Generator — `posexplode` over a
  * `transform(sequence(...))` chunk array keeps the whole pipeline in
  * whole-stage codegen and scales linearly with input rows (each row
  * expands independently; no shuffle introduced).
  */
object Chunker {

  val DefaultIdealTokens = 512
  val DefaultChunkWords  = 384

  /** Adds `chunk_id` (0-based ordinal), `chunk_text`, `chunk_tokens` —
    * one output row per chunk. Token count = whitespace word count
    * (offline cl100k substitute, SURVEY §2.4 A3).
    */
  def chunk(
      df: DataFrame,
      textCol: String,
      idealTokens: Int = DefaultIdealTokens,
      chunkWords: Int = DefaultChunkWords): DataFrame = {
    val ws   = TextOps.words(col(textCol))
    val ntok = TextOps.tokenCount(col(textCol))
    val nchunks = ceil(size(col("__words")).cast("double") / chunkWords.toDouble).cast("int")
    // <=idealTokens → single chunk carrying the FULL text (the short-
    // circuit at dataframes.rs:55); otherwise word-slice chunks.
    val chunks = when(
      col("__ntok") <= idealTokens,
      array(trim(col(textCol)))
    ).otherwise(
      transform(
        sequence(lit(0), nchunks - 1),
        j => array_join(slice(col("__words"), j * chunkWords + 1, lit(chunkWords)), " ")))
    df.withColumn("__words", ws)
      .withColumn("__ntok", ntok)
      .select(col("*"), posexplode(chunks).as(Seq("chunk_id", "chunk_text")))
      .where(length(trim(col("chunk_text"))) > 0) // dataframes.rs:91
      .withColumn("chunk_tokens", TextOps.tokenCount(col("chunk_text")))
      .drop("__words", "__ntok")
  }

  /** Typed `Dataset` variant (SURVEY §1.3: "Dataset[T] only for the
    * chunker's typed flatMap") — same semantics as `chunk`, expressed
    * as a case-class flatMap for callers who prefer compile-time field
    * checks. Tested equal to the column path on the fixtures. */
  def chunkTyped(spark: SparkSession, docs: Dataset[(Long, String)],
      idealTokens: Int = DefaultIdealTokens,
      chunkWords: Int = DefaultChunkWords): Dataset[DocChunk] = {
    import spark.implicits._
    docs.flatMap { case (id, text) =>
      val trimmed = text.trim
      val words = if (trimmed.isEmpty) Array.empty[String] else trimmed.split("\\s+")
      val ntok = words.length
      val chunks =
        if (ntok <= idealTokens) Seq(trimmed)
        else words.grouped(chunkWords).map(_.mkString(" ")).toSeq
      chunks.zipWithIndex
        .filter { case (c, _) => c.trim.nonEmpty }
        .map { case (c, j) =>
          DocChunk(id, j, c, c.trim.split("\\s+").length)
        }
    }
  }
}
