package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** BM25 + reciprocal-rank fusion (Retrieval.scala). Scores are checked
  * against hand-computed constants on a planted 5-doc corpus (computed
  * independently from the closed-form BM25 formula, not by re-running
  * the operator); the q66/q67 oracles prove engine-equivalence on the
  * fixtures. Plan guards mirror the scale posture the scaladoc claims:
  * the df side broadcasts and no WindowExec appears anywhere.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple"),
    (4L, "durian durian durian durian"),
    (5L, "cherry apple banana")).toDF("doc_id", "text")

  test("bm25 matches hand-computed Lucene-idf scores on a planted corpus") {
    // N=5, avgdl=2.6, df(apple)=3, df(cherry)=2, k1=1.2, b=0.75;
    // per-term partials rounded to 6 dp then summed (doc 4 matches
    // nothing and must be absent)
    val got = Retrieval.bm25(corpus, "doc_id", "text", Seq("apple", "cherry"))
      .as[(Long, Double)].collect().toMap
    assert(got.keySet === Set(1L, 2L, 3L, 5L))
    assert(got(1L) === 0.710382) // apple tf=2, dl=3
    assert(got(2L) === 0.966734) // cherry tf=1, dl=2
    assert(got(3L) === 0.720341) // apple tf=1, dl=1
    assert(got(5L) === 1.330714) // apple+cherry, dl=3
  }

  test("bm25 ignores null text and terms absent from the corpus") {
    val withNull = corpus.union(Seq((6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))
    val got = Retrieval.bm25(withNull, "doc_id", "text", Seq("apple", "zzz"))
      .as[(Long, Double)].collect().toMap
    // null row contributes nothing; zzz matches nothing; apple-only
    // scores shift because N/avgdl exclude only the NULL row
    assert(got.keySet === Set(1L, 3L, 5L))
  }

  test("rankTopK assigns row_number-equivalent ranks with (score desc, id asc) ties") {
    val scored = Seq((1L, 5.0), (2L, 3.0), (3L, 3.0), (4L, 1.0), (5L, 0.5))
      .toDF("doc_id", "score")
    val got = Retrieval.rankTopK(scored, "doc_id", "score", 4)
      .as[(Long, Double, Int)].collect().map(r => r._1 -> r._3).toMap
    assert(got === Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4)) // 5 cut by k
  }

  test("rrfFuse handles ids present in only one list (rank 0, one-sided sum)") {
    val a = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(a, b, "doc_id")
      .as[(Long, Double, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 0.016393, 1, 0))) // 1/61 only
    assert(got(2L) === ((2L, 0.032522, 2, 1))) // 1/62 + 1/61
    assert(got(3L) === ((3L, 0.016129, 0, 2))) // 1/62 only
  }

  test("bm25 broadcasts the per-term df side; rankTopK plans TakeOrdered, no Window") {
    val bm = Retrieval.bm25(corpus, "doc_id", "text", Seq("apple"))
    val bmPlan = bm.queryExecution.executedPlan.toString
    assert(bmPlan.contains("BroadcastHashJoin"), bmPlan)
    // r20: the k-row slice is localCheckpointed inside rankTopK (so
    // its two consumers stop re-executing the scoring plan). The
    // TakeOrdered shape therefore lives in the SLICE's own plan; the
    // downstream rank join reads the checkpoint (ExistingRDD) and
    // must still never plan a Window.
    val slice = bm.select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(10)
    val sPlan = slice.queryExecution.executedPlan.toString
    assert(sPlan.contains("TakeOrderedAndProject"), sPlan)
    val ranked = Retrieval.rankTopK(bm, "doc_id", "score", 10)
    val rPlan = ranked.queryExecution.executedPlan.toString
    assert(rPlan.contains("ExistingRDD"), rPlan)
    assert(!rPlan.contains("Window"), rPlan)
  }

  test("q67 end-to-end plan contains no WindowExec") {
    val q = SparkEntry.queries("q67_hybrid_rrf")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    assert(q.count() > 0)
  }

  test("rankingQuality: hand-exact nDCG/MRR on a planted ranking; " +
    "perfect ranking reads exactly 1.0; zero overlap reads 0 with NULL MRR") {
    import spark.implicits._
    // truth top-3: docs 1,2,3 (rel 3,2,1). system@3: (5, 2, 1) →
    // rels (0, 2, 3): dcg6 = 0·w1 + 3·w2 + 7·w3 = 3·630930 + 7·500000
    // idcg6 = 7·w1 + 3·w2 + 1·w3 = 7000000 + 1892790 + 500000
    val sys = Seq((5L, 1), (2L, 2), (1L, 3)).toDF("doc_id", "rank")
    val truth = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val r = Retrieval.rankingQuality(sys, truth, "doc_id", 3)
      .as[(Int, Long, Long, Long, Long, Double, Double)].head()
    val dcg6 = 3L * 630930L + 7L * 500000L
    val idcg6 = 7L * 1000000L + 3L * 630930L + 1L * 500000L
    assert(r === ((3, 3L, 2L, dcg6, idcg6,
      BigDecimal(dcg6.toDouble / idcg6.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, 0.5)))
    // perfect: system == truth → ndcg exactly 1.0, mrr 1.0
    val perfect = Retrieval.rankingQuality(truth, truth, "doc_id", 3)
      .select($"ndcg", $"mrr").as[(Double, Double)].head()
    assert(perfect === ((1.0, 1.0)))
    // disjoint: ndcg 0, mrr NULL, n_rel_ret 0
    val none = Seq((8L, 1), (9L, 2)).toDF("doc_id", "rank")
    val z = Retrieval.rankingQuality(none, truth, "doc_id", 3)
      .select($"n_rel_ret", $"ndcg", $"mrr".isNull)
      .as[(Long, Double, Boolean)].head()
    assert(z === ((0L, 0.0, true)))
  }
}
