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

  test("P4 dropMalformed: kept/rejects partition the input, first-failing reason, one-job observed counts") {
    import graft.operators.MessageOps
    val df = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, None, Some(2.0)),
      (3L, Some("c"), None),
      (4L, None, None)) // both null -> reason is the FIRST required col
      .toDF("id", "s", "v")
    val req = Seq("s", "v")
    assert(MessageOps.dropMalformed(df, req)
      .select($"id").as[Long].collect().toSeq === Seq(1L))
    val rejects = MessageOps.malformedRows(df, req)
      .select($"id", $"__reason").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rejects === Seq((2L, "s"), (3L, "v"), (4L, "s")))
    // kept ∪ rejects == input, disjoint
    assert(rejects.map(_._1).toSet + 1L ===
      df.select($"id").as[Long].collect().toSet)
    val (kept, obs) = MessageOps.dropMalformedObserved(df, req)
    assert(kept.select($"id").as[Long].collect().toSeq === Seq(1L))
    // metrics came from the SAME job that produced the kept rows
    assert(obs.get("n_seen") === 4L)
    assert(obs.get("n_dropped") === 3L)
  }
}
