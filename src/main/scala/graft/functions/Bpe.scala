package graft.functions

/** Offline byte-level BPE codec — the real merge-table replacement for
  * the `bpeTokenEstimate` heuristic (the reference counts cl100k BPE
  * tokens, `src/rag/dataframes.rs:33-39`; no network here, so the merge
  * table is trained offline on the fixture corpus by
  * `tools/train_bpe.py` and checked in as a classpath resource).
  *
  * Token model: ids 0-255 are the base bytes; merge at 0-based rank r
  * defines id 256+r whose byte sequence is the concatenation of its two
  * sides. Encoding is the standard greedy loop: repeatedly merge the
  * adjacent pair with the lowest rank until none applies — identical in
  * `tools/gen_bpe_expected.py`, the INDEPENDENT Python encoder that
  * produces the DuckDB oracle's expected counts (differential oracle:
  * two implementations of the same deterministic spec).
  *
  * Thread-safe: tables are immutable after load; the per-word memo is a
  * bounded ConcurrentHashMap (corpus vocabularies are tiny relative to
  * corpus size, so the memo turns per-row encoding into a hash lookup).
  */
object Bpe {

  final class Table(
      /** (idL << 32 | idR) -> (rank << 32 | newId). */
      val ranks: java.util.HashMap[java.lang.Long, java.lang.Long]) {
    private[Bpe] val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
  }

  /** The production merge table trained on the fixture corpus. */
  val DefaultResource = "/graft/bpe_merges.txt"

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, Table]()

  private def parseHex(s: String): Array[Byte] =
    s.sliding(2, 2).map(h => Integer.parseInt(h, 16).toByte).toArray

  /** Load (and cache) a merge table from a classpath resource: one merge
    * per line, `<left_hex> <right_hex>`, rank = line number. */
  def table(resource: String): Table =
    tables.computeIfAbsent(resource, _ => {
      val in = getClass.getResourceAsStream(resource)
      require(in != null, s"BPE merge table resource not found: $resource")
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      tableFromMerges(lines.map { line =>
        val Array(lh, rh) = line.trim.split(" ")
        (lh, rh)
      })
    })

  /** Build a table from in-memory (left_hex, right_hex) merges in rank
    * order — the path for FRESHLY TRAINED tables ([[BpeTrain]], the
    * q201 tokenizer-refresh audit), where the merges travel inside the
    * serialized expression instead of on the executor classpath. */
  def tableFromMerges(merges: Seq[(String, String)]): Table = {
    // hex-string -> token id for multi-byte tokens; a merge's sides are
    // always base bytes or earlier merges in a well-formed table.
    val bytesToId = new java.util.HashMap[String, Int]()
    val ranks = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    merges.zipWithIndex.foreach { case ((lh, rh), r) =>
      val lb = parseHex(lh); val rb = parseHex(rh)
      require(lb.length == 1 || bytesToId.containsKey(lh),
        s"merge rank $r references unknown left token $lh")
      require(rb.length == 1 || bytesToId.containsKey(rh),
        s"merge rank $r references unknown right token $rh")
      val idL = if (lb.length == 1) lb(0) & 0xff else bytesToId.get(lh)
      val idR = if (rb.length == 1) rb(0) & 0xff else bytesToId.get(rh)
      val newId = 256 + r
      bytesToId.put(lh + rh, newId)
      ranks.put((idL.toLong << 32) | idR.toLong,
        (r.toLong << 32) | newId.toLong)
    }
    new Table(ranks)
  }

  /** Encode one pre-tokenized word (UTF-8 bytes) to BPE token ids. */
  def encodeWord(bytes: Array[Byte], t: Table): Array[Int] = {
    var ids = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { ids(i) = bytes(i) & 0xff; i += 1 }
    var done = ids.length <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestKey = -1L
      var bestNew = -1
      i = 0
      while (i < ids.length - 1) {
        val key = (ids(i).toLong << 32) | ids(i + 1).toLong
        val v = t.ranks.get(key)
        if (v != null) {
          val rank = (v.longValue() >>> 32).toInt
          if (rank < bestRank) {
            bestRank = rank; bestKey = key; bestNew = v.longValue().toInt
          }
        }
        i += 1
      }
      if (bestKey == -1L) done = true
      else {
        val idL = (bestKey >>> 32).toInt
        val idR = bestKey.toInt
        val out = new Array[Int](ids.length)
        var n = 0
        i = 0
        while (i < ids.length) {
          if (i + 1 < ids.length && ids(i) == idL && ids(i + 1) == idR) {
            out(n) = bestNew; n += 1; i += 2
          } else {
            out(n) = ids(i); n += 1; i += 1
          }
        }
        ids = java.util.Arrays.copyOf(out, n)
        done = ids.length <= 1
      }
    }
    ids
  }

  private val MemoCap = 1 << 16

  /** Memoized word encoding (word as a String). At [[MemoCap]] distinct
    * words the memo evicts ONE arbitrary entry per insert (O(1) via the
    * map's own iterator) instead of clearing wholesale — a full clear on
    * a high-vocabulary corpus made every executor thread rebuild the
    * entire cache from scratch. Never reached on the fixture corpora;
    * at 100 TB the memo is per-executor and vocabulary-bounded. The
    * check-evict-put sequence races benignly (worst case: a duplicate
    * encode or a momentary cap overshoot by #threads). */
  def encodeWordMemo(word: String, t: Table): Array[Int] = {
    val hit = t.memo.get(word)
    if (hit != null) hit
    else {
      val ids = encodeWord(word.getBytes("UTF-8"), t)
      if (t.memo.size() >= MemoCap) {
        val it = t.memo.keySet().iterator()
        if (it.hasNext) { it.next(); it.remove() }
      }
      t.memo.put(word, ids)
      ids
    }
  }
}
