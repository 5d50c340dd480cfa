package graft

import org.apache.spark.sql.functions._
import graft.operators.NoiseFilter

/** Noise filter must keep/drop the exact 9 literals + 5 prefixes of
  * reference `src/signal/process_incoming_message.rs:106-120`. */
class NoiseFilterSpec extends SparkSpec {
  import spark.implicits._

  test("drops all 9 exact literals") {
    val df = NoiseFilter.noiseLiterals.toDF("body")
    assert(NoiseFilter(df, "body").count() === 0)
  }

  test("drops all 5 prefixes with arbitrary suffixes") {
    val df = NoiseFilter.noisePrefixes.map(_ + " xyz 123").toDF("body")
    assert(NoiseFilter(df, "body").count() === 0)
  }

  test("keeps real messages, including near-misses") {
    val keep = Seq(
      "hello world",
      "is typing",                 // literal is "is typing..." — not equal
      "Null message",              // prefix of a literal, not equal
      "I Reacted with joy",        // prefix pattern not at start
      "got PNI signature messages extra", // literal+suffix: not an exact match, not a prefix pattern
      "")                          // empty body passes (matches no arm)
    val df = keep.toDF("body")
    assert(NoiseFilter(df, "body").count() === keep.size)
  }

  test("null bodies are dropped") {
    val df = Seq(Some("hi"), None).toDF("body")
    assert(NoiseFilter(df, "body").count() === 1)
  }
}
