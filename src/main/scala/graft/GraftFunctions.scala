package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.expressions._

/** SQL exposure of the engine's custom Catalyst kernels, so the whole
  * surface is reachable from `spark.sql(...)` as well as the Column
  * API. Two registration paths:
  *
  *  - `GraftFunctions.register(spark)` — temp-registers into a live
  *    session (tests, notebooks);
  *  - `graft.GraftExtensions` via
  *    `spark.sql.extensions=graft.GraftExtensions` — injected at
  *    session build (cluster deployment).
  */
object GraftFunctions {

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> ((es: Seq[Expression]) => DotProductD(es(0), es(1))),
    "graft_simhash" -> ((es: Seq[Expression]) =>
      SimHashBits(es.head, 64)),
    "graft_minhash" -> ((es: Seq[Expression]) =>
      MinHashSig(es.head, 16)),
    "graft_hash_embed" -> ((es: Seq[Expression]) =>
      HashEmbed(es.head, 64)),
    "graft_shingles3" -> ((es: Seq[Expression]) =>
      WordShingles(es.head, 3)),
    "graft_hyperplane_bits" -> ((es: Seq[Expression]) =>
      HyperplaneBitsExpr(es.head, 32)),
    "graft_hyperplane_bucket" -> ((es: Seq[Expression]) =>
      HyperplaneBucketExpr(es.head, 4)),
    "graft_bpe_tokens" -> ((es: Seq[Expression]) =>
      BpeTokens(es.head, graft.functions.Bpe.DefaultResource)),
    "graft_bpe_chunks" -> ((es: Seq[Expression]) =>
      BpeChunkTexts(es.head, 512, graft.functions.Bpe.DefaultResource)),
    "graft_int8_encode" -> ((es: Seq[Expression]) => Int8Encode(es.head)))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** Session-extensions entry point: inject the kernel functions at
  * session construction (`SparkSessionExtensions.injectFunction`). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder) =>
      e.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft", name),
        builder))
    }
}
