package graft

import graft.functions.BpeTrain

/** Hand-computed cases for the Spark-native BPE trainer: merge order,
  * count weighting, the reference tie-break (smaller bytes, longer on
  * prefix ties, left before right), early stop at count < 2, and the
  * value-based state replay. Corpus-level equivalence with the
  * independent Python trainer is pinned in BpePinSpec (q86). */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def merges(texts: Seq[String], n: Int): Seq[(Int, String, String)] =
    BpeTrain.trainTable(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "text", n)
      .as[(Int, String, String)].collect().sortBy(_._1).toSeq

  test("merge order follows weighted pair counts; stops when no pair reaches 2") {
    // words: aa x3, ab x2 -> (a,a)=3 first, then (a,b)=2, then nothing
    val got = merges(Seq("aa aa aa", "ab ab"), 10)
    assert(got === Seq((0, "61", "61"), (1, "61", "62")))
  }

  test("count tie-break: smaller left bytes win, then smaller right") {
    // (a,b)=2 and (c,d)=2 tie -> a < c; then (c,d)
    val got = merges(Seq("ab ab cd cd"), 2)
    assert(got === Seq((0, "61", "62"), (1, "63", "64")))
  }

  test("prefix ties prefer the LONGER left (the reference's negated-list max)") {
    // round 1: (a,b)=2,(b,c)=2,(a,d)=2 -> left a ties, right b < d -> (a,b)
    // round 2: (ab,c)=2 vs (a,d)=2 -> left "ab" vs "a" prefix tie -> longer wins
    // round 3: (a,d)=2
    val got = merges(Seq("abc abc ad ad"), 3)
    assert(got === Seq((0, "61", "62"), (1, "6162", "63"), (2, "61", "64")))
  }

  test("applyMerges: value-based left-to-right rewrite, overlapping runs") {
    val aa = Array[Byte](0x61, 0x61)
    val out = BpeTrain.applyMerges("aaa".getBytes("UTF-8"),
      Array((Array[Byte](0x61), Array[Byte](0x61))))
    assert(out.map(new String(_, "UTF-8")).toSeq === Seq("aa", "a"))
    assert(out.head.sameElements(aa))
  }

  test("degenerate corpora: empty input and single-byte words train zero merges") {
    assert(merges(Seq.empty, 10) === Seq.empty)
    assert(merges(Seq(""), 10) === Seq.empty) // no words survive the filter
    assert(merges(Seq("a b c a b c"), 10) === Seq.empty) // no adjacent pairs in 1-byte words
  }

  test("wordHistogram counts occurrences across documents") {
    val h = BpeTrain.wordHistogram(
      Seq((1L, "x y x"), (2L, "x  z"), (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), "text")
      .as[(String, Long)].collect().toMap
    assert(h === Map("x" -> 3L, "y" -> 1L, "z" -> 1L))
  }
}
