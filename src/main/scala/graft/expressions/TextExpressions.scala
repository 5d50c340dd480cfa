package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-statistics kernels — the round-2 verdict's top
  * finding: the quality/lang-id/token-estimate/fingerprint paths ran
  * interpreted higher-order functions (`filter`/`aggregate` lambdas
  * evaluate per word per row through CodegenFallback ArrayAggregate),
  * which dominated the q17/q15/q28 bench lines. Each kernel below is
  * one compiled traversal of the word array per row, computing the
  * SAME values as the HOF formulations (asserted in TextOpsSpec) so
  * every DuckDB oracle is unchanged.
  */

/** One-pass word-array statistics: word count, alphabetic-word count
  * (per-char loop, no regex — `^[a-z]+$` equivalent: non-empty and
  * every byte in 'a'..'z'; any multi-byte UTF-8 char fails the byte
  * test exactly as it fails the regex), and per-stopword-list hit
  * counts (duplicates counted — hit counts, not distinct counts,
  * matching `size(filter(ws, _.isInCollection(list)))`).
  *
  * Output: struct(n_words INT, alpha_hits INT, hits ARRAY<INT>) with
  * hits(i) = matches against `lists(i)`. One kernel call replaces
  * 2 + |lists| interpreted lambda traversals (q17: 2 lists worth,
  * q18/q56 lang-id: 5) per row.
  */
case class TextStats(child: Expression, lists: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("alpha_hits", IntegerType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false), nullable = false)))

  override def prettyName: String = "text_stats"

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    lists.map { l =>
      val s = new java.util.HashSet[UTF8String](l.size * 2)
      l.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val nLists = sets.length
    val hits = new Array[Int](nLists)
    var alpha = 0
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      val nb = w.numBytes
      if (nb > 0) {
        var ok = true
        var j = 0
        while (ok && j < nb) {
          val b = w.getByte(j)
          if (b < 'a' || b > 'z') ok = false
          j += 1
        }
        if (ok) alpha += 1
      }
      var k = 0
      while (k < nLists) {
        if (sets(k).contains(w)) hits(k) += 1
        k += 1
      }
      i += 1
    }
    InternalRow(n, alpha, new GenericArrayData(hits))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE-ish token estimate: Σ ceil(numChars(word)/4) — identical values
  * to the HOF fold `aggregate(ws, 0, acc + ceil(length(w)/4).int)`
  * ((len+3)/4 in integer arithmetic), one compiled pass per row. */
case class BpeEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_estimate"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0
    var i = 0
    while (i < n) {
      acc += (arr.getUTF8String(i).numChars() + 3) / 4
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared BPE evaluation helpers for the two kernels below: ASCII
  * whitespace pre-tokenization (split on runs of space/\t/\n/\x0b/\f/\r,
  * empty tokens dropped — multi-byte UTF-8 never contains ASCII values,
  * so the byte scan is safe) and per-word memoized byte-pair encoding
  * via [[graft.functions.Bpe]]. */
private[expressions] object BpeEval {
  def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Apply `f(tokenIds)` to each whitespace-delimited word of `text`. */
  def foreachWord(text: UTF8String, t: graft.functions.Bpe.Table)(
      f: Array[Int] => Unit): Unit = {
    val bytes = text.getBytes
    val n = bytes.length
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        val w = new String(bytes, start, i - start, "UTF-8")
        f(graft.functions.Bpe.encodeWordMemo(w, t))
      }
    }
  }
}

/** Real byte-pair-encoded token ids of a text column (whitespace
  * pre-tokenization, then greedy lowest-rank merges over the checked-in
  * table — see [[graft.functions.Bpe]]). The faithful replacement for
  * the reference's cl100k token counting (`src/rag/dataframes.rs:33-39`)
  * under the no-network constraint. */
case class BpeTokens(child: Expression, resource: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  @transient private lazy val table = graft.functions.Bpe.table(resource)

  override def nullSafeEval(v: Any): Any = {
    val buf = new scala.collection.mutable.ArrayBuffer[Int](64)
    BpeEval.foreachWord(v.asInstanceOf[UTF8String], table)(ids => buf ++= ids)
    ArrayData.toArrayData(buf.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Total BPE token count of a text column under an IN-MEMORY merge
  * table that travels WITH the expression ((left_hex, right_hex) pairs
  * in rank order) — the evaluation path for freshly trained tables
  * (q201 tokenizer-refresh audit: retrain on the current snapshot,
  * then count under old + new side by side). Unlike [[BpeTokens]]'s
  * classpath resource, the merges serialize into the task closure, so
  * a just-trained table needs no executor-side file. Count-only: no
  * per-row id array is materialized. */
case class BpeTokenCountTable(child: Expression,
    merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count_table"

  @transient private lazy val table =
    graft.functions.Bpe.tableFromMerges(merges)

  override def nullSafeEval(v: Any): Any = {
    var total = 0
    BpeEval.foreachWord(v.asInstanceOf[UTF8String], table) { ids =>
      total += ids.length
    }
    total
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass BPE document statistics: struct(n_tokens, n_chunks) where
  * n_chunks is the greedy word-boundary chunking at `chunkTokens` BPE
  * tokens per chunk — the 512-token boundary the reference's chunker
  * derives from its token count (`src/rag/dataframes.rs:48-55`). A word
  * longer than `chunkTokens` occupies its own chunk; empty text → (0,0).
  */
case class BpeDocStats(child: Expression, chunkTokens: Int, resource: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_chunks", IntegerType, nullable = false)))
  override def prettyName: String = "bpe_doc_stats"

  @transient private lazy val table = graft.functions.Bpe.table(resource)

  override def nullSafeEval(v: Any): Any = {
    var total = 0
    var cur = 0
    var chunks = 0
    BpeEval.foreachWord(v.asInstanceOf[UTF8String], table) { ids =>
      val c = ids.length
      total += c
      if (cur > 0 && cur + c > chunkTokens) { chunks += 1; cur = 0 }
      cur += c
    }
    if (cur > 0) chunks += 1
    InternalRow(total, chunks)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The V1 chunker upgraded to REAL token boundaries: split the document
  * into word-boundary chunks of at most `chunkTokens` BPE tokens
  * (greedy, same rule as [[BpeDocStats]] — a word longer than the
  * budget occupies its own chunk) and emit each chunk's text (words
  * re-joined with single spaces). One pass; `posexplode` over the
  * result gives the (doc, ordinal, chunk) rows the reference's 512-token
  * chunker produces (`src/rag/dataframes.rs:48-55`). */
case class BpeChunkTexts(child: Expression, chunkTokens: Int, resource: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_chunk_texts"

  @transient private lazy val table = graft.functions.Bpe.table(resource)

  override def nullSafeEval(v: Any): Any = {
    val chunks = new scala.collection.mutable.ArrayBuffer[UTF8String](4)
    val cur = new java.lang.StringBuilder()
    var curTokens = 0
    val text = v.asInstanceOf[UTF8String]
    val bytes = text.getBytes
    val n = bytes.length
    var i = 0
    while (i < n) {
      while (i < n && BpeEval.isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !BpeEval.isWs(bytes(i))) i += 1
      if (i > start) {
        val w = new String(bytes, start, i - start, "UTF-8")
        val c = graft.functions.Bpe.encodeWordMemo(w, table).length
        if (curTokens > 0 && curTokens + c > chunkTokens) {
          chunks += UTF8String.fromString(cur.toString)
          cur.setLength(0)
          curTokens = 0
        }
        if (cur.length() > 0) cur.append(' ')
        cur.append(w)
        curTokens += c
      }
    }
    if (curTokens > 0) chunks += UTF8String.fromString(cur.toString)
    ArrayData.toArrayData(chunks.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Polynomial rolling-hash fingerprint over the word sequence:
  *   fp = fold(words, 0L, (acc, w) -> floorMod(acc*1000003 + murmur3(w, 42), 1e9+7))
  * Bit-identical to the HOF form (`hash(w)` is murmur3 seed 42
  * sign-extended to long; `pmod` == floorMod for a positive modulus);
  * modular so it never overflows (acc < 2^30, acc*1000003 + h < 2^62).
  * Order-sensitive — distinguishes permutations. */
case class FingerprintHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint_hash"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, 42)
        .toLong
      acc = java.lang.Math.floorMod(acc * 1000003L + h, 1000000007L)
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  private def expr(c: Column): Expression = GraftShims.expression(c)

  /** struct(n_words, alpha_hits, hits[i] per `lists(i)`) in one pass. */
  def textStats(words: Column, lists: Seq[Seq[String]]): Column =
    GraftShims.column(TextStats(expr(words), lists))

  def bpeEstimate(words: Column): Column =
    GraftShims.column(BpeEstimate(expr(words)))

  def fingerprintHash(words: Column): Column =
    GraftShims.column(FingerprintHash(expr(words)))

  def bpeTokens(text: Column,
      resource: String = graft.functions.Bpe.DefaultResource): Column =
    GraftShims.column(BpeTokens(expr(text), resource))

  def bpeDocStats(text: Column, chunkTokens: Int,
      resource: String = graft.functions.Bpe.DefaultResource): Column =
    GraftShims.column(BpeDocStats(expr(text), chunkTokens, resource))

  def bpeChunkTexts(text: Column, chunkTokens: Int,
      resource: String = graft.functions.Bpe.DefaultResource): Column =
    GraftShims.column(BpeChunkTexts(expr(text), chunkTokens, resource))

  def bpeTokenCountTable(text: Column,
      merges: Seq[(String, String)]): Column =
    GraftShims.column(BpeTokenCountTable(expr(text), merges))
}
