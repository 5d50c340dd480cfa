package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Spark-native BPE merge-table TRAINING — the corpus-side counterpart
  * of the [[Bpe]] encoder (which consumes a table trained offline; the
  * reference's cl100k table was likewise trained elsewhere). Classic
  * Sennrich-style byte-level BPE, restated for a 100 TB corpus:
  *
  *  1. ONE corpus-sized pass: whitespace pre-tokenization → distinct
  *     (word, freq) histogram. This is the only shuffle proportional to
  *     the input; every production tokenizer trainer (HuggingFace,
  *     sentencepiece) reduces to the same bounded intermediate, because
  *     pair statistics depend only on word VALUES × frequencies.
  *  2. Per merge round, a distributed pair count over the CACHED
  *     histogram: each partition replays the merges-so-far on its words
  *     (value-based, exactly the reference algorithm) and emits
  *     weighted adjacent-pair counts; one tiny aggregation + a bounded
  *     collect (≤ distinct-adjacent-pairs rows) picks the argmax on the
  *     driver with the deterministic tie-break.
  *
  * Driver state is the merge list + one pair-count table per round —
  * bounded by vocabulary, never by corpus size. Long-sum pair counts
  * make every round partition-count independent (3-vs-8 crosscheck
  * safe). Tie-break (matching `tools/train_bpe.py`, the independent
  * differential-oracle implementation for q86): highest count, then
  * lexicographically smallest left byte sequence — unsigned bytewise,
  * longer preferred when one is a prefix of the other — then smallest
  * right. Tokens are compared by byte VALUE (not id), so two merge
  * paths producing equal bytes collapse, exactly as in the reference.
  */
object BpeTrain {

  final case class Merge(rank: Int, left: Array[Byte], right: Array[Byte]) {
    def leftHex: String = Merge.hex(left)
    def rightHex: String = Merge.hex(right)
  }
  object Merge {
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  }

  /** Corpus → distinct (word, freq) histogram: the single corpus-sized
    * pass (explode + map-side-combined count). */
  def wordHistogram(df: DataFrame, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(TextOps.words(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** Replay `merges` (rank order) over one word — the value-based state
    * evolution of the reference trainer: each merge rewrites every
    * adjacent (left, right) occurrence left-to-right. */
  private[graft] def applyMerges(word: Array[Byte],
      merges: Array[(Array[Byte], Array[Byte])]): Array[Array[Byte]] = {
    var toks: Array[Array[Byte]] = word.map(b => Array(b))
    var r = 0
    while (r < merges.length && toks.length > 1) {
      val (l, rt) = merges(r)
      var found = false
      var i = 0
      while (!found && i < toks.length - 1) {
        found = java.util.Arrays.equals(toks(i), l) &&
          java.util.Arrays.equals(toks(i + 1), rt)
        i += 1
      }
      if (found) {
        val out = new Array[Array[Byte]](toks.length)
        var n = 0
        i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && java.util.Arrays.equals(toks(i), l) &&
              java.util.Arrays.equals(toks(i + 1), rt)) {
            out(n) = l ++ rt; n += 1; i += 2
          } else {
            out(n) = toks(i); n += 1; i += 1
          }
        }
        toks = java.util.Arrays.copyOf(out, n)
      }
      r += 1
    }
    toks
  }

  /** True when byte sequence `a` is preferred over `b` for the
    * tie-break: unsigned bytewise ascending; when one is a prefix of
    * the other the LONGER wins (the reference's negated-list max). */
  private def preferred(a: Array[Byte], b: Array[Byte]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ua = a(i) & 0xff; val ub = b(i) & 0xff
      if (ua != ub) return ua < ub
      i += 1
    }
    a.length > b.length
  }

  /** Train `nMerges` merges over a (word, freq) histogram. Stops early
    * when no adjacent pair reaches count 2 (the reference's floor).
    *
    * Each round is ONE single-stage job: every partition replays the
    * merges-so-far and emits its partial pair-count map; the driver
    * merges the partials with exact long sums (the same bounded-state
    * fan-in the k-means CentroidScaledAggregator uses — pair keys are
    * bounded by the ACTIVE VOCABULARY, never the corpus). A per-round
    * DataFrame groupBy measured 40 merge rounds at 12.3 s (AQE stage
    * materialization × shuffle × collect per round); the partial-map
    * collect runs the same 40 rounds in ~1 s. */
  def train(words: DataFrame, nMerges: Int): Seq[Merge] = {
    val spark = words.sparkSession
    import spark.implicits._
    val cached = words
      .select(col("word").cast("string").as("word"), col("freq").cast("long").as("freq"))
      .as[(String, Long)]
      .rdd
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte])]
      var go = true
      while (go && merges.length < nMerges) {
        val mergesLocal = merges.toArray
        // pair keys travel as "leftHex rightHex" so the driver tie-break
        // sees byte values; counts are exact long sums (order-free)
        val partials: Array[java.util.HashMap[String, Long]] = cached
          .mapPartitions { it =>
            val m = new java.util.HashMap[String, Long]()
            it.foreach { case (w, f) =>
              val toks = applyMerges(w.getBytes("UTF-8"), mergesLocal)
              var i = 0
              while (i < toks.length - 1) {
                val k = Merge.hex(toks(i)) + " " + Merge.hex(toks(i + 1))
                m.merge(k, f, (a, b) => a + b)
                i += 1
              }
            }
            Iterator.single(m)
          }
          .collect()
        val agg = new java.util.HashMap[String, Long]()
        partials.foreach(_.forEach((k, v) => agg.merge(k, v, (a, b) => a + b)))
        def unhex(h: String): Array[Byte] =
          h.sliding(2, 2).map(x => Integer.parseInt(x, 16).toByte).toArray
        var bestL: Array[Byte] = null
        var bestR: Array[Byte] = null
        var bestN = -1L
        agg.forEach { (k, n) =>
          val Array(lh, rh) = k.split(" ")
          val l = unhex(lh); val r = unhex(rh)
          val better = n > bestN || (n == bestN && {
            val lc = !java.util.Arrays.equals(l, bestL)
            if (lc) preferred(l, bestL) else preferred(r, bestR)
          })
          if (better) { bestL = l; bestR = r; bestN = n }
        }
        if (bestN < 2L) go = false
        else merges += ((bestL, bestR))
      }
      merges.toSeq.zipWithIndex.map { case ((l, r), i) => Merge(i, l, r) }
    } finally {
      cached.unpersist()
      ()
    }
  }

  /** Train and return the merge table as a DataFrame of
    * (rank, left_hex, right_hex) — the q86 surface. */
  def trainTable(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(wordHistogram(df, textCol), nMerges)
      .map(m => (m.rank, m.leftHex, m.rightHex))
      .toDF("rank", "left_hex", "right_hex")
  }
}
