package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's load-bearing noise anti-filter — the predicate that
  * keeps system chatter out of the embedding store
  * (`src/signal/process_incoming_message.rs:106-120`): 9 exact literals
  * and 5 prefixes, matched against the message body BEFORE the
  * chunk/embed stage. Declarative (`isin` + `startswith`) so Catalyst
  * pushes it into the parquet scan and it always runs upstream of any
  * expensive downstream work.
  */
object NoiseFilter {

  /** Exact-match noise literals (process_incoming_message.rs:106-114). */
  val noiseLiterals: Seq[String] = Seq(
    "failed to derive thread from content",
    "Null message (for example deleted)",
    "is calling!",
    "is typing...",
    "got PNI signature message",
    "Empty data message",
    "presage",
    "failed to display desktop notification",
    "Something went wrong!")

  /** Prefix-match noise patterns (process_incoming_message.rs:115-119). */
  val noisePrefixes: Seq[String] = Seq(
    "got Delivery receipt",
    "got Read receipt",
    "new story:",
    "receipt for messages sent at",
    "Reacted with ")

  /** True iff `body` is signal-worthy (not noise). Null bodies are noise
    * (the reference unwraps `None` to `""` which matches no arm, but an
    * empty normalized body embeds nothing useful — we keep the
    * reference's observable behavior: empty string passes, null drops). */
  def keep(body: Column): Column = {
    val notLiteral = !body.isin(noiseLiterals: _*)
    val notPrefix = noisePrefixes
      .map(p => !body.startsWith(p))
      .reduce(_ && _)
    body.isNotNull && notLiteral && notPrefix
  }

  def apply(df: DataFrame, bodyCol: String): DataFrame = df.filter(keep(col(bodyCol)))
}
