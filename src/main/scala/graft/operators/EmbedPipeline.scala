package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextOps, VectorOps}

/** The flagship §3.1 pipeline composed end-to-end: noise filter →
  * chunk → hash-embed → top-k cosine retrieval against a probe text.
  *
  * Plan discipline (learned from measurement, not guessed): the
  * embedding is an interpreted higher-order-function tree, so it must
  * be materialized behind an exchange BEFORE anything references it —
  * a sort key or a cosine that references the raw expression makes
  * Catalyst re-inline (re-execute) the whole tree per reference, and a
  * single-row-group source runs it all on one core. The probe
  * embedding is a constant: it is evaluated ONCE on the driver (1-row
  * local eval of the same column expression — bit-identical) and
  * inlined as an array literal, so per-row work is one codegen'd dot
  * product over attributes.
  */
object EmbedPipeline {

  private def par(spark: SparkSession): Int =
    spark.sparkContext.defaultParallelism

  /** Evaluate the hash-embedding of a constant text on the driver —
    * same column expression over a 1-row frame, so the result is
    * bit-identical to a per-row evaluation. */
  def probeVector(spark: SparkSession, text: String, dim: Int): Seq[Double] =
    spark.range(1)
      .select(VectorOps.hashEmbed(TextOps.words(lit(text)), dim).as("p"))
      .head().getSeq[Double](0)

  /** documents(textCol) → noise filter → chunk → embed → top-k cosine
    * vs `probeText`. Returns (idCols..., chunk_id, chunk_tokens, sim).
    */
  def topKForProbe(spark: SparkSession, docs: DataFrame, textCol: String,
      probeText: String, dim: Int, k: Int,
      idealTokens: Int = 32, chunkWords: Int = 24): DataFrame = {
    val probe = probeVector(spark, probeText, dim)
    val probeNorm = math.sqrt(probe.map(x => x * x).sum) // == 1.0 (normalized), kept explicit
    val filtered = NoiseFilter(docs, textCol)
    val chunked = Chunker.chunk(filtered, textCol, idealTokens, chunkWords)
      // parallelize-first: single-row-group sources scan as 1 partition
      .repartition(par(spark), col("doc_id"))
      .withColumn("embedding",
        VectorOps.hashEmbed(TextOps.words(col("chunk_text")), dim))
      // compute-once barrier: everything downstream references the
      // embedding attribute, never the HOF tree
      .repartition(par(spark), col("doc_id"), col("chunk_id"))
    val probeCol = array(probe.map(lit): _*)
    chunked
      .withColumn("sim", round(
        VectorOps.dot(col("embedding"), probeCol)
          / (VectorOps.norm2(col("embedding")) * lit(probeNorm)), 6))
      .select(col("doc_id"), col("chunk_id"), col("chunk_tokens"), col("sim"))
      .orderBy(col("sim").desc, col("doc_id"), col("chunk_id"))
      .limit(k)
  }
}
