package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Similarity}

/** centroidDrift (embedding-space drift) and vocabDivergence
  * (token-distribution drift): hand-exact cases, null/edge contracts,
  * partition independence (all sums are exact decimal/integer). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("centroidDrift: hand-exact orthogonal centroids") {
    // label 1: A = {(1,0),(1,0)} -> centroid (1,0); B = {(0,1)}
    // cos = 0 exactly, l2 = sqrt(2e12)/1e6
    val df = Seq(
      (0L, 1, Seq(1f, 0f)), (2L, 1, Seq(1f, 0f)), (1L, 1, Seq(0f, 1f)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidDrift(df, "label", "embedding",
      pmod(col("vec_id"), lit(2)) === 0).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == BigDecimal(math.sqrt(2e12) / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("centroidDrift: identical snapshots -> cos 1, l2 0") {
    val df = Seq(
      (0L, 7, Seq(0.25f, -0.5f, 0.125f)), (1L, 7, Seq(0.25f, -0.5f, 0.125f)),
      (2L, 7, Seq(0.25f, -0.5f, 0.125f)), (3L, 7, Seq(0.25f, -0.5f, 0.125f)))
      .toDF("vec_id", "label", "embedding")
    val r = Similarity.centroidDrift(df, "label", "embedding",
      pmod(col("vec_id"), lit(2)) === 0).collect().head
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 0.0)
  }

  test("centroidDrift: one-sided groups drop; zero centroid -> null cos") {
    val df = Seq(
      (0L, 1, Seq(1f, 0f)),                      // label 1: A only -> drop
      (0L, 2, Seq(0f, 0f)), (1L, 2, Seq(1f, 1f)) // label 2: zero A centroid
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidDrift(df, "label", "embedding",
      pmod(col("vec_id"), lit(2)) === 0).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(2))
    assert(got.head.isNullAt(3)) // cos null, not NaN
    assert(!got.head.isNullAt(4)) // l2 still defined
  }

  test("centroidDrift: partition-count independence") {
    val base = Tables.embeddings(spark, sf)
    val split = pmod(col("vec_id"), lit(2)) === 0
    val a = Similarity.centroidDrift(base.repartition(1), "label",
      "embedding", split).collect().toSeq
    val b = Similarity.centroidDrift(base.repartition(7), "label",
      "embedding", split).collect().toSeq
    assert(a == b)
  }

  test("vocabDivergence: identical sources -> kl exactly 0") {
    val df = Seq(
      (1L, "alpha beta beta gamma", "s1"),
      (2L, "alpha beta beta gamma", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Curation.vocabDivergence(df, "text", "source").collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getLong(1) == 4L && r.getLong(2) == 3L)
      assert(r.getDouble(3) == 0.0)
    }
  }

  test("vocabDivergence: divergent source has kl > 0; kl is never negative") {
    val df = Seq(
      (1L, "a a a a a a a a b", "skewed"),
      (2L, "a b b b b b b b b", "other"))
      .toDF("doc_id", "text", "source")
    val got = Curation.vocabDivergence(df, "text", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("skewed") > 0.0 && got("other") > 0.0)
  }

  test("vocabDivergence: empty tokens and null text are dropped") {
    val df = Seq(
      (1L, "alpha\tbeta  gamma", "s1"), // tab + double space -> "" tokens
      (2L, null.asInstanceOf[String], "s1"),
      (3L, "alpha beta gamma", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Curation.vocabDivergence(df, "text", "source").collect()
    got.foreach { r =>
      assert(r.getLong(1) == 3L, s"empty tokens leaked into ${r.getString(0)}")
      assert(r.getLong(2) == 3L)
    }
  }

  test("vocabDivergence: partition-count independence") {
    val docs = Tables.documents(spark, sf)
    val a = Curation.vocabDivergence(docs.repartition(1), "text", "source")
      .collect().toSeq
    val b = Curation.vocabDivergence(docs.repartition(7), "text", "source")
      .collect().toSeq
    assert(a == b)
  }

  // --- q200 quantizer-refresh trigger --------------------------------

  /** Two well-separated clouds in 4-d; ids interleave so even/odd
    * halves see the same distribution. */
  private def clouds(shift: Double = 0.0): Seq[(Long, Seq[Float])] =
    (0 until 200).map { i =>
      val base = if (i % 4 < 2) 1.0 else -1.0
      val v = Seq(base + 0.01 * (i % 5), base - 0.01 * (i % 3),
        base + 0.005 * (i % 7), base)
        .map(x => (x + shift).toFloat)
      (i.toLong, v)
    }

  test("quantizerDriftAudit: identical-distribution halves decide keep") {
    val df = clouds().toDF("vec_id", "embedding")
    val audit = Similarity.quantizerDriftAudit(
      df.filter(pmod($"vec_id", lit(2)) === 0),
      df.filter(pmod($"vec_id", lit(2)) === 1),
      "vec_id", "embedding", dim = 4, k = 2, maxIter = 10).collect()
    assert(audit.length == 1)
    val r = audit.head
    assert(r.getAs[Long]("n_train") == 100L)
    assert(r.getAs[Long]("n_current") == 100L)
    assert(r.getAs[String]("decision") == "keep")
    assert(r.getAs[Double]("psi") < 0.05)
    assert(r.getAs[Double]("min_cos_drift") > 0.99)
  }

  test("quantizerDriftAudit: planted drift decides retrain; refresh recovers") {
    val train = clouds().toDF("vec_id", "embedding")
    // current = the whole corpus shifted far off the trained cells
    val current = clouds(shift = 10.0).toDF("vec_id", "embedding")
    val audit = Similarity.quantizerDriftAudit(train, current,
      "vec_id", "embedding", dim = 4, k = 2, maxIter = 10).collect().head
    assert(audit.getAs[String]("decision") == "retrain")

    val (stale, retrainedFlagA) = Similarity.refreshQuantizerIfDrifted(
      train, train, "vec_id", "embedding", 4, 2, 10)
    assert(!retrainedFlagA) // identical snapshots keep the stale set
    val (fresh, retrainedFlagB) = Similarity.refreshQuantizerIfDrifted(
      train, current, "vec_id", "embedding", 4, 2, 10)
    assert(retrainedFlagB)
    // keep branch returns the audit's own trained set (no re-fit drift)
    assert(stale.map(_.toSeq) ==
      Similarity.kMeans(train, "vec_id", "embedding", 2, 10)
        .centroids.map(_.toSeq))
    // retrain branch == a fresh fit on current
    assert(fresh.map(_.toSeq) ==
      Similarity.kMeans(current, "vec_id", "embedding", 2, 10)
        .centroids.map(_.toSeq))

    // BOTH branches are result-preserving for exact probes: exhaustive
    // IVF (nProbe = k) under either centroid set == brute-force top-k
    val probes = current.filter($"vec_id" < 3)
    val brute = Similarity.knnJoin(probes, current, "vec_id", "vec_id",
      "embedding", 5)
      .select($"probe_id", $"neighbor_id").collect().map(_.toSeq).toSet
    for (cents <- Seq(stale, fresh)) {
      val ivf = Similarity.ivfJoinTrained(probes, current, "vec_id",
        "vec_id", "embedding", 5, cents, nProbe = cents.size)
        .select($"probe_id", $"neighbor_id").collect().map(_.toSeq).toSet
      assert(ivf == brute,
        s"exhaustive IVF diverged from brute force under ${cents.size} cells")
    }
  }

  test("quantizerDriftAudit: partition-count independence") {
    val e = Tables.embeddings(spark, sf)
    def run(parts: Int) = Similarity.quantizerDriftAudit(
      e.filter(pmod($"vec_id", lit(2)) === 0).repartition(parts),
      e.filter(pmod($"vec_id", lit(2)) === 1).repartition(parts),
      "vec_id", "embedding", dim = 64, k = 4, maxIter = 5)
      .collect().toSeq
    assert(run(1) == run(7))
  }
}
