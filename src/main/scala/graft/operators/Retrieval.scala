package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Lexical (BM25) retrieval and reciprocal-rank fusion — the keyword
  * complement to the vector-similarity core (`Similarity.scala`). The
  * reference retrieves by embedding cosine only
  * (`src/rag/dataframes.rs:153-170`); hybrid keyword+vector ranking is
  * the standard production upgrade for a RAG corpus, so it ships as a
  * first-class operator here.
  *
  * Determinism discipline (matches the repo's oracle contract):
  * per-(doc, term) BM25 partials are rounded to 6 dp and summed as
  * DECIMAL(18,6) — order-independent, so the shuffle layout cannot
  * perturb the score. All divisions are double-typed on both engines
  * (a bare DuckDB numeric literal divides as DECIMAL, which does NOT
  * match IEEE doubles — the oracle casts explicitly).
  *
  * Scale posture: tokenize → (doc, term) tf is one explode + hash agg;
  * df is computed ONLY for the query's terms (a handful of rows —
  * broadcast); corpus stats (N, avgdl) are a 1-row aggregate broadcast
  * via crossJoin. Nothing quadratic, no window over the corpus.
  */
object Retrieval {

  private def par(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** BM25 score of every document matching at least one query term.
    * Returns (`idCol`, score). k1/b are the classic Robertson
    * defaults; idf is the Lucene non-negative variant
    * ln(1 + (N - df + 0.5)/(df + 0.5)). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // parallelize-first: fixture tables scan as one partition
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc"), col(textCol))
      .repartition(par(docs), col("doc"))
      .select(col("doc"), TextOps.words(col(textCol)).as("ws"))
    val dl = base.select(col("doc"), size(col("ws")).as("dl"))
    // 1-row corpus stats; avgdl as exact long sum / count, then double
    val stats = dl.agg(
      count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val tf = base.select(col("doc"), explode(col("ws")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))
    // df only over the query terms — at most |terms| rows, broadcast
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      ((col("n") - col("df")).cast("double") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)))
    val norm = lit(k1) * (lit(1 - b) +
      lit(b) * col("dl").cast("double") / col("avgdl"))
    val partial = round(
      idf * (col("tf").cast("double") * lit(k1 + 1))
        / (col("tf").cast("double") + norm), 6).cast("decimal(18,6)")
    tf.join(broadcast(df), "term")
      .join(dl, "doc")
      .crossJoin(broadcast(stats))
      .withColumn("__s", partial)
      .groupBy(col("doc"))
      .agg(sum(col("__s")).cast("decimal(18,6)").cast("double").as("score"))
      .select(col("doc").as(idCol), col("score"))
  }

  /** Top-k by (`scoreCol` desc, `idCol` asc) with a dense 1-based rank
    * — WITHOUT a WindowExec: orderBy+limit plans as
    * TakeOrderedAndProject (per-partition heaps), and the rank is
    * derived after the limit by a k×k broadcast self-join peer count
    * (a no-partition window would drag the corpus to one task). */
  def rankTopK(scored: DataFrame, idCol: String, scoreCol: String,
      k: Int): DataFrame = {
    // r20: localCheckpoint the k-row slice — `sel` feeds BOTH the rank
    // join's left side and the broadcast peers, and without the
    // boundary each consumer re-executed the WHOLE upstream scoring
    // plan (q164's before-plan instantiated the bm25 subtree four
    // times / 32 parquet scans; the q144 multi-branch recompute class).
    // Checkpointing k ≤ tens of rows is free; downstream consumers
    // (rrfFuse, truth prefixes) reuse it too. Result unchanged.
    val sel = scored.select(col(idCol), col(scoreCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .limit(k)
      .localCheckpoint()
    val peers = sel.select(col(idCol).as("__pid"), col(scoreCol).as("__ps"))
    sel.join(broadcast(peers),
        col("__ps") > col(scoreCol) ||
          (col("__ps") === col(scoreCol) && col("__pid") <= col(idCol)))
      .groupBy(col(idCol), col(scoreCol))
      .agg(count(lit(1)).cast("int").as("rank"))
  }

  /** Reciprocal-rank fusion of two ranked lists (each (`idCol`, rank)):
    * rrf = Σ 1/(kRrf + rank) over the lists containing the id. A
    * fixed-order two-term double sum — deterministic. Absent ranks
    * surface as 0. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
      kRrf: Int = 60): DataFrame = {
    val l = a.select(col(idCol), col("rank").as("__ra"))
    val r = b.select(col(idCol), col("rank").as("__rb"))
    l.join(r, Seq(idCol), "full_outer")
      .select(col(idCol),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("__ra")), lit(0.0))
            + coalesce(lit(1.0) / (lit(kRrf) + col("__rb")), lit(0.0)),
          6).as("rrf"),
        coalesce(col("__ra"), lit(0)).as("rank_a"),
        coalesce(col("__rb"), lit(0)).as("rank_b"))
  }

  /** DCG rank discounts round(1/log2(rank+1), 6)·1e6 for ranks 1..20,
    * INLINED as integers on both engines (the q161 Benford-constants
    * discipline — no libm call exists anywhere in the nDCG
    * comparison). */
  private[graft] val discount6: IndexedSeq[Long] = IndexedSeq(
    1000000L, 630930L, 500000L, 430677L, 386853L, 356207L, 333333L,
    315465L, 301030L, 289065L, 278943L, 270238L, 262650L, 255958L,
    250000L, 244651L, 239812L, 235409L, 231378L, 227670L)

  /** Retrieval-quality audit: exact nDCG@k and MRR of a system ranking
    * against a graded ground-truth ranking — the answer-quality number
    * for a retrieval pipeline, the way RecallScale's recall@k is for
    * ANN. Both inputs are (`idCol`, rank) frames (from [[rankTopK]] —
    * rank 1..k, integer-exact on both engines). Relevance of a system
    * hit is graded by its GROUND-TRUTH position: rel = k+1−truthRank
    * (top truth hit worth k, … , kth worth 1; misses 0). Exact-integer
    * arithmetic end to end: gain = 2^rel−1 in BIGINT, discounts are
    * the inlined [[discount6]] constants, DCG and the ideal DCG are
    * BIGINT sums, and nDCG/MRR are each ONE IEEE division — pure-ANSI
    * oracle, no float fold anywhere. Output is one bounded row
    * (k, n_truth, n_rel_ret, dcg6, idcg6, ndcg, mrr); MRR is NULL when
    * no truth doc is retrieved. Both inputs are ≤ k rows, so every
    * join is broadcast-sized by construction. */
  def rankingQuality(system: DataFrame, truth: DataFrame, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= discount6.length,
      s"k $k out of range 1..${discount6.length}")
    val w6 = typedlit(discount6.take(k))
    val t = truth.select(col(idCol), col("rank").as("__tr"))
      .filter(col("__tr") <= k)
    val j = system.select(col(idCol), col("rank").as("__sr"))
      .filter(col("__sr") <= k)
      .join(broadcast(t), Seq(idCol), "left")
      .select(col("__sr"),
        coalesce(lit(k + 1) - col("__tr"), lit(0)).as("__rel"))
    val d = j.agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), __rel) - 1")
        * element_at(w6, col("__sr"))).as("dcg6"),
      sum(when(col("__rel") > 0, 1L).otherwise(0L)).as("n_rel_ret"),
      min(when(col("__rel") > 0, col("__sr"))).as("__fr"))
    val ideal = t.agg(count(lit(1)).as("n_truth"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${k + 1} - __tr) - 1")
        * element_at(w6, col("__tr"))).as("idcg6"))
    d.crossJoin(broadcast(ideal))
      .select(lit(k).as("k"), col("n_truth"), col("n_rel_ret"),
        col("dcg6"), col("idcg6"),
        round(col("dcg6").cast("double") / col("idcg6").cast("double"), 6)
          .as("ndcg"),
        round(lit(1.0) / col("__fr").cast("double"), 6).as("mrr"))
  }
}
