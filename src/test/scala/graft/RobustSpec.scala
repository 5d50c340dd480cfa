package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Curation}

/** mergeIntervals (range consolidation), robustOutliers (MAD fence),
  * pmiCollocations: hand-exact cases, edge contracts, partition
  * independence (folds are exact integer/decimal throughout). */
class RobustSpec extends SparkSpec {
  import spark.implicits._

  // ---- mergeIntervals -------------------------------------------------

  test("mergeIntervals: overlap and touch merge, gaps split") {
    // (1,5)+(4,10) overlap; (10,12) touches 10 -> same island;
    // (20,25) after a gap -> second island
    val df = Seq(
      ("a", 1L, 5L), ("a", 4L, 10L), ("a", 10L, 12L), ("a", 20L, 25L),
      ("b", 0L, 1L))
      .toDF("k", "s", "e")
    val got = Analytics.mergeIntervals(df, "k", "s", "e")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 12L, 3L), ("a", 20L, 25L, 1L), ("b", 0L, 1L, 1L)))
  }

  test("mergeIntervals: contained and duplicate intervals count rows") {
    val df = Seq(
      ("k", 0L, 100L), ("k", 10L, 20L), ("k", 10L, 20L), ("k", 50L, 60L))
      .toDF("k", "s", "e")
    val got = Analytics.mergeIntervals(df, "k", "s", "e")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("k", 0L, 100L, 4L)))
  }

  test("mergeIntervals: null bounds and inverted intervals drop") {
    val df = Seq(
      ("k", Some(1L), Some(2L)), ("k", None, Some(5L)),
      ("k", Some(9L), None), ("k", Some(8L), Some(3L)))
      .toDF("k", "s", "e")
    val got = Analytics.mergeIntervals(df, "k", "s", "e")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("k", 1L, 2L, 1L)))
  }

  test("mergeIntervals: partition independence") {
    val rows = (0 until 500).map { i =>
      (s"k${i % 7}", (i * 37L) % 1000L, (i * 37L) % 1000L + (i % 50L))
    }
    val a = Analytics.mergeIntervals(
      rows.toDF("k", "s", "e").repartition(3), "k", "s", "e").collect().toSeq
    val b = Analytics.mergeIntervals(
      rows.toDF("k", "s", "e").repartition(11), "k", "s", "e").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  // ---- robustOutliers -------------------------------------------------

  test("robustOutliers: hand-exact fence, median and MAD") {
    // group g: 1..9 plus 1000 -> med 5.5, MAD 2.5 (devs' median),
    // fence 3.5*1.4826*2.5 = 12.97... -> only 1000 flags
    val df = ((1 to 9).map(i => ("g", i.toLong, i.toDouble)) :+
      ("g", 10L, 1000.0)).toDF("grp", "id", "v")
    val got = Analytics.robustOutliers(df, "grp", "id", "v").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 10L && r.getDouble(2) == 1000.0)
    assert(r.getDouble(3) == 5.5 && r.getDouble(4) == 2.5)
    // robust_z = devl*10000/(madl*14826), devl=994.5e6, madl=2.5e6
    val exp = BigDecimal(994500000.0 * 10000.0 / (2500000.0 * 14826.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) == exp)
  }

  test("robustOutliers: zero MAD flags any deviation, null robust_z") {
    val df = Seq(("g", 1L, 7.0), ("g", 2L, 7.0), ("g", 3L, 7.0),
      ("g", 4L, 7.0), ("g", 5L, 7.1)).toDF("grp", "id", "v")
    val got = Analytics.robustOutliers(df, "grp", "id", "v").collect()
    assert(got.length == 1)
    assert(got.head.getLong(1) == 5L && got.head.isNullAt(5))
  }

  test("robustOutliers: inliers-only group emits nothing; nulls drop") {
    val df = Seq(("g", 1L, Some(1.0)), ("g", 2L, Some(2.0)),
      ("g", 3L, Some(3.0)), ("g", 4L, None)).toDF("grp", "id", "v")
    assert(Analytics.robustOutliers(df, "grp", "id", "v").count() == 0L)
    intercept[IllegalArgumentException] {
      Analytics.robustOutliers(df, "grp", "id", "v", kMilli = 0)
    }
  }

  test("robustOutliers: partition independence") {
    val rows = (0 until 400).map { i =>
      (s"t${i % 3}", i.toLong, ((i * 7919) % 997).toDouble / 10.0 +
        (if (i % 97 == 0) 500.0 else 0.0))
    }
    val a = Analytics.robustOutliers(
      rows.toDF("grp", "id", "v").repartition(3), "grp", "id", "v")
      .collect().toSeq
    val b = Analytics.robustOutliers(
      rows.toDF("grp", "id", "v").repartition(13), "grp", "id", "v")
      .collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  // ---- pmiCollocations ------------------------------------------------

  private def l6(n: Double): Long =
    (BigDecimal(math.log(n)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      * 1000000).toLongExact

  // ---- snapshotDiff ---------------------------------------------------

  test("snapshotDiff: hand-exact churn and per-column counts, null-safe cells") {
    val a = Seq((1L, "x", Some(1.0)), (2L, "y", None),
      (3L, "z", Some(3.0))).toDF("id", "t", "v")
    val b = Seq((2L, "y", None), (3L, "z", Some(9.9)),
      (4L, "w", Some(4.0))).toDF("id", "t", "v")
    val got = Analytics.snapshotDiff(a.repartition(3), b, Seq("id"))
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(
      ("added", 1L), ("changed", 1L), ("changed:t", 0L),
      ("changed:v", 1L), ("removed", 1L), ("unchanged", 1L)))
    // schema mismatch rejected
    intercept[IllegalArgumentException] {
      Analytics.snapshotDiff(a, b.drop("v"), Seq("id"))
    }
    // identical snapshots: everything unchanged
    val same = Analytics.snapshotDiff(a, a, Seq("id"))
      .as[(String, Long)].collect().toMap
    assert(same("unchanged") === 3L && same("added") === 0L
      && same("changed") === 0L && same("removed") === 0L)
  }

  // ---- rollingAnomaly -------------------------------------------------

  test("rollingAnomaly: hand-exact flags, trailing frame excludes self, minPeriods gate") {
    // key a: constant 10s then a spike of 100 at t=5, back to 10 at t=6.
    // Trailing window of 4 with minPeriods 2: the spike at t=5 flags
    // (zero-variance predecessors, any departure => LHS > RHS = 0);
    // the return to 10 at t=6 ALSO flags against the spike-polluted
    // window? mean of {10,10,10,100} = 32.5, var > 0 — check via replay.
    val rows = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0), ("a", 4L, 10.0),
      ("a", 5L, 100.0), ("a", 6L, 10.0),
      ("b", 1L, 5.0), ("b", 2L, 7.0)) // below minPeriods: never flags
    val df = rows.toDF("k", "t", "x")
    val out = Analytics.rollingAnomaly(df, "k", Seq("t"), "x",
      window = 4, k = 3, minPeriods = 2)
      .select($"k", $"t", $"n_prev", $"roll_mean", $"is_anomaly")
      .as[(String, Long, Int, Option[Double], Int)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // integer replay of the same comparison
    def flag(prev: Seq[Double], x: Double): Int = {
      if (prev.size < 2) return 0
      val v = (BigDecimal.decimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP) * 1000000).toLong
      val vs = prev.map(p => (BigDecimal.decimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP) * 1000000).toLong)
      val n = BigInt(vs.size); val s = BigInt(vs.sum)
      val q = vs.map(l => BigInt(l) * BigInt(l)).sum
      val a = n * BigInt(v) - s
      if (a * a > BigInt(9) * (n * q - s * s)) 1 else 0
    }
    val byKey = rows.groupBy(_._1)
    for ((k, rs) <- byKey; (i, r) <- rs.sortBy(_._2).zipWithIndex.map(_.swap)) {
      val prev = rs.sortBy(_._2).slice(math.max(0, i - 4), i).map(_._3)
      val got = out((k, r._2))
      assert(got._5 === flag(prev, r._3), s"($k, ${r._2})")
      assert(got._3 === prev.size)
    }
    // the spike itself flags; the recovery row flags iff the replay says so
    assert(out(("a", 5L))._5 === 1)
    assert(out(("b", 1L))._5 === 0 && out(("b", 2L))._5 === 0)
    // roll_mean of the zero-prev row is null
    assert(out(("a", 1L))._4.isEmpty && out(("b", 1L))._4.isEmpty)
  }

  test("rollingAnomaly: partition independence and single-window plan") {
    val df = (1L to 200L).map(i => (i % 5, i, (i * 37 % 11).toDouble))
      .toDF("k", "t", "x")
    val a = Analytics.rollingAnomaly(df.repartition(1), "k", Seq("t"), "x")
      .orderBy($"k", $"t").collect().toSeq
    val b = Analytics.rollingAnomaly(df.repartition(13), "k", Seq("t"), "x")
      .orderBy($"k", $"t").collect().toSeq
    assert(a === b)
    val plan = Analytics.rollingAnomaly(df, "k", Seq("t"), "x")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 === 1, plan)
  }

  test("pmiCollocations: hand-exact counts and pmi") {
    val df = (Seq.fill(5)("a b") :+ "c d").toDF("text")
    val got = Curation.pmiCollocations(df, "text", minCount = 5).collect()
    assert(got.length == 1) // "c d" count 1 pruned by minCount
    val r = got.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 5L && r.getLong(3) == 5L && r.getLong(4) == 5L)
    // tu = 12 unigrams, tb = 6 bigrams
    val exp = (l6(5) + 2 * l6(12) - l6(6) - l6(5) - l6(5)).toDouble / 1e6
    assert(r.getDouble(5) == exp)
  }

  test("pmiCollocations: null text drops; single-word docs add no bigrams") {
    val df = Seq(Some("x y"), Some("x y"), Some("x y"), Some("x y"),
      Some("x y"), Some("z"), None).toDF("text")
    val got = Curation.pmiCollocations(df, "text", minCount = 5).collect()
    assert(got.length == 1 && got.head.getString(0) == "x")
    intercept[IllegalArgumentException] {
      Curation.pmiCollocations(df, "text", minCount = 0)
    }
  }

  // ---- distinctiveTerms -------------------------------------------------

  test("distinctiveTerms: hand-exact log-odds and ranks") {
    // A: x,x,x,y (n_s 4); B: y,y,y,z (n_s 4); c_w: x 3, y 4, z 1; n_t 8
    val df = Seq(("A", "x x x y"), ("B", "y y y z")).toDF("source", "text")
    val got = Curation.distinctiveTerms(df, "text", "source", k = 2)
      .as[(String, Int, String, Long, Double)].collect().toSeq
    def sc(a: Double, b: Double): Double = {
      def l(x: Double) =
        (BigDecimal(math.log(x)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          * 1000000).toLongExact
      (l(a) - l(b)).toDouble / 1e6
    }
    // A: x = ln(4/2) - ln(1/5); y = ln(2/4) - ln(4/2)
    // B: y = ln(4/2) - ln(2/4); z = ln(2/4) - ln(1/5)
    assert(got == Seq(
      ("A", 1, "x", 3L, sc(2.0, 0.2)), ("A", 2, "y", 1L, sc(0.5, 2.0)),
      ("B", 1, "y", 3L, sc(2.0, 0.5)), ("B", 2, "z", 1L, sc(0.5, 0.2))))
  }

  test("distinctiveTerms: null text drops, k guard, partition independence") {
    val rows = (0 until 300).map(i =>
      (s"s${i % 4}", if (i % 29 == 0) null else s"w${i % 11} w${(i * 7) % 11} common"))
    val a = Curation.distinctiveTerms(
      rows.toDF("source", "text").repartition(3), "text", "source", k = 3)
      .collect().toSeq
    val b = Curation.distinctiveTerms(
      rows.toDF("source", "text").repartition(13), "text", "source", k = 3)
      .collect().toSeq
    assert(a == b && a.nonEmpty)
    intercept[IllegalArgumentException] {
      Curation.distinctiveTerms(rows.toDF("source", "text"), "text",
        "source", k = 0)
    }
  }

  // ---- contaminationScore -----------------------------------------------

  test("contaminationScore: hand-exact fractions incl. short-doc collapse") {
    val eval = Seq((1L, "a b c d"), (2L, "z z z q"), (3L, "a b"))
      .toDF("doc_id", "text")
    val train = Seq((100L, "b c d e"), (101L, "a b")).toDF("doc_id", "text")
    val got = Curation.contaminationScore(eval, train, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc 1: {"a b c","b c d"} -> 1 hit of 2; doc 2: 0 of 2;
    // doc 3 (short): {"a b"} whole-text == train 101's -> 1 of 1
    assert(got == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 0L, 0.0),
      (3L, 1L, 1L, 1.0)))
  }

  test("contaminationScore: null text drops, k guard, partition independence") {
    val eval = (0 until 120).map(i =>
      (i.toLong, if (i % 17 == 0) null else s"e${i % 7} e${(i + 1) % 7} e${(i + 2) % 7} tail${i % 3}"))
    val train = (200 until 320).map(i =>
      (i.toLong, s"e${i % 7} e${(i + 1) % 7} e${(i + 2) % 7} other"))
    def run(p1: Int, p2: Int) = Curation.contaminationScore(
      eval.toDF("doc_id", "text").repartition(p1),
      train.toDF("doc_id", "text").repartition(p2), "doc_id", "text")
      .collect().toSeq
    val a = run(2, 3)
    assert(a == run(7, 11) && a.nonEmpty)
    assert(a.forall(_.getLong(0) % 17 != 0)) // null-text eval docs dropped
    intercept[IllegalArgumentException] {
      Curation.contaminationScore(eval.toDF("doc_id", "text"),
        train.toDF("doc_id", "text"), "doc_id", "text", k = 0)
    }
  }

  test("pmiCollocations: partition independence and ordering") {
    val rows = (0 until 300).map(i => s"w${i % 5} w${(i + 1) % 5} w${i % 3}")
    val a = Curation.pmiCollocations(rows.toDF("text").repartition(2),
      "text", minCount = 3).collect().toSeq
    val b = Curation.pmiCollocations(rows.toDF("text").repartition(9),
      "text", minCount = 3).collect().toSeq
    assert(a == b && a.nonEmpty)
    // total order: pmi desc, then (w1, w2)
    val pmis = a.map(_.getDouble(5))
    assert(pmis == pmis.sorted.reverse)
  }

  // ---- columnProfile --------------------------------------------------

  test("columnProfile: hand-exact counts, nulls, distincts, native min/max") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "b"), (2L, "a"), (2L, null), (null, "a"), (10L, "c"))
      .toDF("id", "s")
    val got = Analytics.columnProfile(df.repartition(3), Seq("id", "s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toSeq
    // min/max compare on the NATIVE long type: 2 < 10 (a stringified
    // lexicographic compare would call "10" < "2")
    assert(got == Seq(
      ("id", 5L, 1L, 3L, Some("1"), Some("10")),
      ("s", 5L, 1L, 3L, Some("a"), Some("c"))))
    // all-null column: zero distincts, null min/max
    val gotNull = Analytics.columnProfile(
      Seq[(java.lang.Long, String)]((null, "x")).toDF("id", "s"), Seq("id"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toSeq
    assert(gotNull == Seq(("id", 1L, 1L, 0L, None, None)))
    // partition independence
    val a = Analytics.columnProfile(df.repartition(1), Seq("id", "s"))
      .collect().toSeq
    val b = Analytics.columnProfile(df.repartition(7), Seq("id", "s"))
      .collect().toSeq
    assert(a == b)
    // missing column rejected
    intercept[IllegalArgumentException] {
      Analytics.columnProfile(df, Seq("nope"))
    }
  }

  // ---- topMovers ------------------------------------------------------

  test("topMovers: hand-exact deltas over the last two periods, new and " +
    "vanished keys, ppm math, |delta| ordering, single-period edge, " +
    "partition independence") {
    import java.sql.Timestamp
    def ts(p: Long, i: Long) = new Timestamp((p * 10000000L + i) / 1000)
    // period 10s; max period = 5. Counts: key a 4->1 (delta -3),
    // key b 1->4 (+3), key c 2->0 (vanished, -2), key d 0->2 (new, +2,
    // ppm NULL), key e 1->1 (0). Period 3 noise must not count.
    val rows =
      (1 to 4).map(i => ("a", ts(4, i))) ++ Seq(("a", ts(5, 1))) ++
      Seq(("b", ts(4, 1))) ++ (1 to 4).map(i => ("b", ts(5, i))) ++
      (1 to 2).map(i => ("c", ts(4, i))) ++
      (1 to 2).map(i => ("d", ts(5, i))) ++
      Seq(("e", ts(4, 1)), ("e", ts(5, 1))) ++
      (1 to 9).map(i => ("a", ts(3, i))) // older period: ignored
    val df = rows.toDF("k", "t")
    val got = Analytics.topMovers(df, "k", "t", periodUs = 10000000L,
        k = 10)
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got === Seq(
      ("a", 4L, 1L, -3L, Some(-750000L)),
      ("b", 1L, 4L, 3L, Some(3000000L)),
      ("c", 2L, 0L, -2L, Some(-1000000L)),
      ("d", 0L, 2L, 2L, None),
      ("e", 1L, 1L, 0L, Some(0L))))
    // k caps the output at the |delta| boundary
    assert(Analytics.topMovers(df, "k", "t", 10000000L, 2)
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
      === got.take(2))
    // single-period corpus: everything is "new"
    val one = (1 to 3).map(i => ("x", ts(7, i))).toDF("k", "t")
    assert(Analytics.topMovers(one, "k", "t", 10000000L, 5)
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
      === Seq(("x", 0L, 3L, 3L, None)))
    // partition independence
    assert(Analytics.topMovers(df.repartition(7), "k", "t", 10000000L, 10)
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
      === got)
  }

  // ---- downsample -----------------------------------------------------

  test("downsample: hand-exact OHLC per bucket, negative ts, partition independence") {
    import java.sql.Timestamp
    def ts(us: Long) = new Timestamp(us / 1000) // micros -> millis (whole ms here)
    // key a, bucket 0 (period 10_000_000 us): open/close are BY SEQ
    // (open = v at min seq = 9.0, close = v at max seq = 5.0 — NOT by
    // ts), low/high over values; bucket 1: one row; key b: a NEGATIVE
    // timestamp truncates toward zero (-3s DIV 10s = 0, the same
    // truncation DuckDB's // applies — engines agree bit-for-bit)
    val df = Seq(
      ("a", 2000000L, 3L, 5.0),
      ("a", 1000000L, 1L, 9.0),
      ("a", 3000000L, 2L, 1.0),
      ("a", 12000000L, 4L, 7.0),
      ("b", -3000000L, 5L, 2.0))
      .map { case (k, us, q, v) => (k, ts(us), q, v) }
      .toDF("k", "t", "q", "v")
    val got = Analytics.downsample(df.repartition(3), "k", "t", "q", "v",
      periodUs = 10000000L)
      .as[(String, Long, Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq(
      ("a", 0L, 0L, 3L, 9.0, 5.0, 1.0, 9.0, 15.0),
      ("a", 1L, 10000000L, 1L, 7.0, 7.0, 7.0, 7.0, 7.0),
      ("b", 0L, 0L, 1L, 2.0, 2.0, 2.0, 2.0, 2.0)))
    val a = Analytics.downsample(df.repartition(1), "k", "t", "q", "v", 10000000L).collect().toSeq
    val b = Analytics.downsample(df.repartition(7), "k", "t", "q", "v", 10000000L).collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Analytics.downsample(df, "k", "t", "q", "v", 0L)
    }
  }

  // ---- distributionDrift ----------------------------------------------

  test("distributionDrift: identical snapshots -> 0, shift -> positive, " +
      "one-sided groups finite, null drop, partition independence") {
    // onlyA is NON-uniform over two buckets: against an absent B side
    // the smoothed pB is uniform (1/K), so only a non-uniform A reads
    // a positive PSI — a single-bucket group always reads 0 (PSI
    // measures SHAPE; the n_a/n_b columns carry the mass signal)
    val a = Seq[(String, java.lang.Double)](
      ("g", 10.0), ("g", 10.0), ("g", 30.0),
      ("h", 100.0), ("h", 110.0),
      ("onlyA", 5.0), ("onlyA", 5.0), ("onlyA", 30.0),
      (null, 1.0))
      .toDF("t", "v")
    // identical snapshots: every bucket has pA == pB, so both the
    // lifted share difference AND ln(1)=0 zero every term
    val same = Analytics.distributionDrift(a, a, "t", "v", 25.0)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(same.map(_._1) == Seq("g", "h", "onlyA"))
    assert(same.forall(_._5 == 0.0))
    assert(same.find(_._1 == "g").get == (("g", 3L, 3L, 2L, 0.0)))
    // a shifted g + a group only in A: psi positive and FINITE for
    // both (add-one smoothing over the union support)
    val b = Seq[(String, java.lang.Double)](
      ("g", 60.0), ("g", 60.0), ("g", 30.0), ("h", 100.0),
      ("h", 110.0), ("g", null))
      .toDF("t", "v")
    val drift = Analytics.distributionDrift(a, b, "t", "v", 25.0)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    val g = drift.find(_._1 == "g").get
    assert(g._2 == 3L && g._3 == 3L && g._4 == 3L && g._5 > 0.0)
    val onlyA = drift.find(_._1 == "onlyA").get
    assert(onlyA._2 == 3L && onlyA._3 == 0L && onlyA._4 == 2L
      && !onlyA._5.isNaN && !onlyA._5.isInfinite && onlyA._5 > 0.0)
    assert(drift.find(_._1 == "h").get._5 == 0.0)
    // partition independence
    val p1 = Analytics.distributionDrift(a.repartition(1), b.repartition(1),
      "t", "v", 25.0).collect().toSeq
    val p7 = Analytics.distributionDrift(a.repartition(7), b.repartition(5),
      "t", "v", 25.0).collect().toSeq
    assert(p1 == p7)
    intercept[IllegalArgumentException] {
      Analytics.distributionDrift(a, b, "t", "v", 0.0)
    }
  }

  // ---- correlationMatrix ------------------------------------------------

  test("correlationMatrix: perfect +/-1, zero variance null, pairwise " +
      "null deletion, partition independence") {
    val df = Seq[(java.lang.Double, java.lang.Double, java.lang.Double, java.lang.Double)](
      (1.0, 2.0, 9.0, 7.0),
      (2.0, 4.0, 8.0, 7.0),
      (3.0, 6.0, 7.0, 7.0),
      (4.0, null, 6.0, 7.0))
      .toDF("x", "y2", "neg", "const")
    val got = graft.operators.Analytics.correlationMatrix(
      df.repartition(3), Seq("x", "y2", "neg", "const"))
      .as[(String, String, Long, Option[Double])].collect().toSeq
    val m = got.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // y2 = 2x on the 3 shared rows -> +1; neg = 10-x on all 4 -> -1
    assert(m(("x", "y2")) == ((3L, Some(1.0))))
    assert(m(("x", "neg")) == ((4L, Some(-1.0))))
    // const has zero variance -> corr null, n still counted
    assert(m(("x", "const")) == ((4L, None)))
    assert(m(("y2", "const")) == ((3L, None)))
    // pairwise deletion: the y2-null row drops only y2 pairs
    assert(m(("y2", "neg")) == ((3L, Some(-1.0))))
    // ordered output, all C(4,2) pairs present
    assert(got.map(r => (r._1, r._2)) == got.map(r => (r._1, r._2)).sorted)
    assert(got.size == 6)
    // partition independence
    val p1 = graft.operators.Analytics.correlationMatrix(
      df.repartition(1), Seq("x", "y2")).collect().toSeq
    val p7 = graft.operators.Analytics.correlationMatrix(
      df.repartition(7), Seq("x", "y2")).collect().toSeq
    assert(p1 == p7)
    intercept[IllegalArgumentException] {
      graft.operators.Analytics.correlationMatrix(df, Seq("x"))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Analytics.correlationMatrix(df, Seq("x", "x"))
    }
  }

  // ---- frequentPairs ----------------------------------------------------

  test("frequentPairs: hand-exact counts, duplicate rows collapse, basket " +
      "cap, partition independence") {
    // baskets: b1 {x,y,z} (y twice -> distinct), b2 {x,y}, b3 {x,y},
    // b4 {q} singleton, null rows dropped
    val df = Seq[(java.lang.Long, String)](
      (1L, "x"), (1L, "y"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "y"),
      (4L, "q"),
      (null, "x"), (5L, null))
      .toDF("b", "i")
    val got = Analytics.frequentPairs(df.repartition(3), "b", "i", k = 10)
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(
      ("x", "y", 3L), ("x", "z", 1L), ("y", "z", 1L)))
    // k truncates under the total order
    assert(Analytics.frequentPairs(df, "b", "i", k = 1)
      .as[(String, String, Long)].collect().toSeq == got.take(1))
    // maxBasketSize drops the 3-item basket ENTIRELY (documented
    // semantics): only the two 2-item baskets contribute
    val capped = Analytics.frequentPairs(df, "b", "i", k = 10,
      maxBasketSize = 2).as[(String, String, Long)].collect().toSeq
    assert(capped == Seq(("x", "y", 2L)))
    // partition independence
    val p1 = Analytics.frequentPairs(df.repartition(1), "b", "i", 10)
      .collect().toSeq
    val p7 = Analytics.frequentPairs(df.repartition(7), "b", "i", 10)
      .collect().toSeq
    assert(p1 == p7)
    intercept[IllegalArgumentException] {
      Analytics.frequentPairs(df, "b", "i", 0)
    }
  }

  // ---- concentration ----------------------------------------------------

  test("concentration: hand-exact gini and top-decile share, uniform -> 0, " +
      "all-zero -> null, partition independence") {
    // g: values 1,1,2,6 -> sorted desc 6,2,1,1; gnum = 3*6 + 1*2 - 1 - 3
    // = 16 (1e6-lifted), den = 4*10 -> gini 0.4; top ceil(4/10)=1 row
    // -> 6/10 = 0.6
    val df = Seq[(String, java.lang.Double)](
      ("g", 1.0), ("g", 1.0), ("g", 2.0), ("g", 6.0),
      ("u", 3.0), ("u", 3.0), ("u", 3.0), ("u", 3.0),
      ("z", 0.0), ("z", 0.0),
      (null, 9.0), ("g", null))
      .toDF("t", "v")
    val got = Analytics.concentration(df.repartition(3), "t", "v")
      .as[(String, Long, Option[Double], Option[Double])].collect().toSeq
    assert(got == Seq(
      ("g", 4L, Some(0.4), Some(0.6)),
      ("u", 4L, Some(0.0), Some(0.25)),
      ("z", 2L, None, None)))
    // partition independence (tie-invariance exercised by u's equal values)
    val p1 = Analytics.concentration(df.repartition(1), "t", "v")
      .collect().toSeq
    val p7 = Analytics.concentration(df.repartition(7), "t", "v")
      .collect().toSeq
    assert(p1 == p7)
  }

  // ---- sequenceMotifs -----------------------------------------------------

  test("sequenceMotifs: hand-exact DP counts, strict ordering, " +
      "partition independence") {
    // user a stream: V C V P C P
    //   ABC occurrences (V<C<P): V1C2P4, V1C2P6, V1C5P6, V3C5P6 = 4
    // user b: C P V -> 0 (order matters); user c: V C -> 0 (incomplete)
    val rows = Seq(
      ("a", 1L, 1L, "view"), ("a", 2L, 2L, "click"), ("a", 3L, 3L, "view"),
      ("a", 4L, 4L, "purchase"), ("a", 5L, 5L, "click"),
      ("a", 6L, 6L, "purchase"),
      ("b", 1L, 7L, "click"), ("b", 2L, 8L, "purchase"), ("b", 3L, 9L, "view"),
      ("c", 1L, 10L, "view"), ("c", 2L, 11L, "click"))
      .toDF("u", "t", "id", "et")
    val got = Analytics.sequenceMotifs(rows.repartition(3), "u", "t", "id",
      "et", Seq("view", "click", "purchase"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 4L), ("b", 0L), ("c", 0L)))
    // two-stage motif: count of (view, click) ordered pairs for a:
    //   V1C2, V1C5, V3C5 = 3
    val two = Analytics.sequenceMotifs(rows, "u", "t", "id", "et",
      Seq("view", "click")).as[(String, Long)].collect().toMap
    assert(two("a") == 3L && two("b") == 0L && two("c") == 1L)
    // same-position rows never self-match: a single event is not a pair
    val one = Seq(("x", 1L, 1L, "view")).toDF("u", "t", "id", "et")
    assert(Analytics.sequenceMotifs(one, "u", "t", "id", "et",
      Seq("view", "view")).as[(String, Long)].collect().toSeq
      == Seq(("x", 0L)))
    // partition independence
    val p1 = Analytics.sequenceMotifs(rows.repartition(1), "u", "t", "id",
      "et", Seq("view", "click", "purchase")).collect().toSeq
    val p7 = Analytics.sequenceMotifs(rows.repartition(7), "u", "t", "id",
      "et", Seq("view", "click", "purchase")).collect().toSeq
    assert(p1 == p7)
    intercept[IllegalArgumentException] {
      Analytics.sequenceMotifs(rows, "u", "t", "id", "et", Seq("view"))
    }
  }

  // ---- functionalDependency ----------------------------------------------

  test("functionalDependency: hand-exact violations, perfect FD, null drop") {
    // a -> {x,x,x,y}: 1 violation; b -> {z,z}: 0; n=6, keys=2
    val df = Seq[(String, String)](
      ("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "z"), ("b", "z"), (null, "x"), ("a", null))
      .toDF("k", "v")
    val got = Analytics.functionalDependency(df.repartition(3), "k", "v")
      .as[(Long, Long, Long, Double)].collect().head
    assert(got == ((6L, 2L, 1L, 0.833333)))
    // a perfect mapping scores 1.0
    val perfect = Analytics.functionalDependency(
      Seq(("a", "x"), ("a", "x"), ("b", "y")).toDF("k", "v"), "k", "v")
      .as[(Long, Long, Long, Double)].collect().head
    assert(perfect == ((3L, 2L, 0L, 1.0)))
    // partition independence
    val p1 = Analytics.functionalDependency(df.repartition(1), "k", "v")
      .collect().toSeq
    val p7 = Analytics.functionalDependency(df.repartition(7), "k", "v")
      .collect().toSeq
    assert(p1 == p7)
  }

  // ---- changePoint ----------------------------------------------------

  test("changePoint: planted mean shift found exactly; ties break to " +
      "the earliest t; single-row key drops; null values excluded; " +
      "partition independence") {
    // key A: 4 rows at 1.0 then 4 rows at 5.0 — the CUSUM argmax is
    // exactly t=4 (the last low row); shift = 4.0
    val rows =
      (1 to 4).map(i => ("A", i.toLong, i.toLong, Some(1.0))) ++
      (5 to 8).map(i => ("A", i.toLong, i.toLong, Some(5.0))) ++
      // key B: constant series — every |D_t| = 0, tie → t = 1
      (1 to 5).map(i => ("B", i.toLong, i.toLong, Some(2.0))) ++
      // key C: one row → no split point → dropped
      Seq(("C", 1L, 1L, Some(9.0))) ++
      // key D: a null value is excluded (3 effective rows, shift at 2)
      Seq(("D", 1L, 1L, Some(1.0)), ("D", 2L, 2L, None),
        ("D", 3L, 3L, Some(1.0)), ("D", 4L, 4L, Some(7.0)))
    val df = rows.toDF("k", "us", "seq", "v")
      .select($"k", timestamp_micros($"us").as("ts"), $"seq", $"v")
    def run(parts: Int) =
      Analytics.changePoint(df.repartition(parts), "k", "ts", "seq", "v")
        .select($"k", $"n", $"t_star", unix_micros($"ts_star"),
          $"mean_before", $"mean_after", $"shift")
        .as[(String, Long, Long, Long, Double, Double, Double)]
        .collect().toSeq
    val got = run(3)
    assert(got === Seq(
      ("A", 8L, 4L, 4L, 1.0, 5.0, 4.0),
      ("B", 5L, 1L, 1L, 2.0, 2.0, 0.0),
      ("D", 3L, 2L, 3L, 1.0, 7.0, 6.0)))
    assert(run(1) === got && run(8) === got)
  }

  // ---- cohortMatrix ---------------------------------------------------

  test("cohortMatrix: hand-exact cohort x age counts and retention; " +
      "within-period dedup; partition independence") {
    val week = 604800000000L
    // users 1,2 join week 0 (1 retained at week 1, both at week 2);
    // user 3 joins week 1 only; duplicate activity within a week
    // counts once
    val rows = Seq(
      (1L, 0L), (1L, 1L), (1L, 2L), (1L, 2L + 0L), // dup in week 2
      (2L, 0L), (2L, 2L),
      (3L, 1L))
    val df = rows.toDF("u", "w")
      .select($"u", timestamp_micros($"w" * week + lit(5L)).as("ts"))
    def run(parts: Int) =
      Analytics.cohortMatrix(df.repartition(parts), "u", "ts", week)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val got = run(4)
    assert(got === Seq(
      (0L, 0L, 0L, 2L, 1.0),
      (0L, 0L, 1L, 1L, 0.5),
      (0L, 0L, 2L, 2L, 1.0),
      (1L, week, 0L, 1L, 1.0)))
    assert(run(1) === got && run(7) === got)
  }

  // ---- conversionLag --------------------------------------------------

  test("conversionLag: first-from to first-to-at-or-after, same instant " +
      "counts, pre-from purchases gated out, missing stage drops; " +
      "partition independence") {
    val rows = Seq(
      // user 1: purchase BEFORE first view gated out; next one matches
      (1L, 5L, "purchase"), (1L, 10L, "view"), (1L, 40L, "purchase"),
      (1L, 50L, "purchase"),
      // user 2: same-instant conversion counts (lag 0)
      (2L, 7L, "view"), (2L, 7L, "purchase"),
      // user 3: view only — drops; user 4: purchase only — drops
      (3L, 1L, "view"), (4L, 2L, "purchase"))
    val df = rows.toDF("user_id", "us", "event_type")
      .select($"user_id", timestamp_micros($"us").as("ts"), $"event_type")
    def run(parts: Int) =
      graft.operators.Analytics.conversionLag(df.repartition(parts),
        "user_id", "ts", "event_type", "view", "purchase")
        .select($"user_id", unix_micros($"from_ts"), unix_micros($"to_ts"),
          $"lag_us")
        .as[(Long, Long, Long, Long)].collect().toSeq
    val got = run(3)
    assert(got === Seq((1L, 10L, 40L, 30L), (2L, 7L, 7L, 0L)))
    assert(run(1) === got && run(7) === got)
  }

  // ---- benfordProfile -------------------------------------------------

  test("benfordProfile: hand-exact shares and deviations, absent digits " +
      "read zero, non-positive and null values drop; partition " +
      "independence") {
    // 4× leading-1 (1, 19, 123, 1000), 1× leading-9 (900); zero,
    // negative and null drop
    val vals: Seq[java.lang.Long] =
      Seq(1L, 19L, 123L, 1000L, 900L, 0L, -5L, null)
    val df = vals.toDF("v")
    def run(parts: Int) =
      graft.operators.Analytics.benfordProfile(df.repartition(parts), "v")
        .as[(Int, Long, Option[Double], Double, Option[Double])]
        .collect().toSeq
    val got = run(3)
    assert(got.size === 9)
    val m = got.map(r => r._1 -> r).toMap
    assert(m(1) === ((1, 4L, Some(0.8), 0.301030, Some(0.498970))))
    assert(m(9) === ((9, 1L, Some(0.2), 0.045757, Some(0.154243))))
    assert(m(2) === ((2, 0L, Some(0.0), 0.176091, Some(0.176091))))
    assert(run(1) === got && run(6) === got)
  }

  // ---- dowProfile -----------------------------------------------------

  test("dowProfile: exact uniform week reads chi2 0.0; planted skew is " +
      "hand-exact incl. absent days; dow anchoring (1970-01-01 = " +
      "Thursday = 3); partition independence") {
    val day = 86400000000L
    // key U: one event on each of 7 consecutive days → chi2 exactly 0,
    // peak ties to the earliest dow (epoch day 0 = Thursday = 3, so
    // days 0..6 cover dows 3,4,5,6,0,1,2 → earliest dow 0)
    val uni = (0 until 7).map(i => ("U", i.toLong * day))
    // key S: 3 events on epoch day 0 (dow 3), 1 on day 1 (dow 4) →
    // N=4, present d: (7·3−4)²=289, (7·1−4)²=9; absent 5 days: 5·16=80
    // → chi2 = 378/28 = 13.5; peak_dow 3, share 0.75
    val skew = Seq(("S", 0L), ("S", 1L), ("S", 2L), ("S", day))
    val df = (uni ++ skew).toDF("k", "us")
      .select($"k", timestamp_micros($"us").as("ts"))
    def run(parts: Int) =
      Analytics.dowProfile(df.repartition(parts), "k", "ts")
        .as[(String, Long, Double, Long, Double)].collect().toSeq
    val got = run(3)
    assert(got === Seq(
      ("S", 4L, 13.5, 3L, 0.75),
      ("U", 7L, 0.0, 0L, 0.142857)))
    assert(run(1) === got && run(6) === got)
  }

  test("cohenKappa: hand-exact planted contingency; single-category NULL; " +
    "partition independence") {
    // 40 (1,1) + 40 (0,0) + 10 (1,0) + 10 (0,1): po .8, pe .5, kappa .6
    val rows = Seq.fill(40)((1, 1)) ++ Seq.fill(40)((0, 0)) ++
      Seq.fill(10)((1, 0)) ++ Seq.fill(10)((0, 1))
    def run(parts: Int) =
      Analytics.cohenKappa(rows.toDF("a", "b").repartition(parts), "a", "b")
        .as[(Long, Long, Double, Double, Option[Double])].head()
    val got = run(4)
    assert(got === ((100L, 80L, 0.8, 0.5, Some(0.6))))
    assert(run(1) === got && run(7) === got)
    // one category on both sides: pe = 1 → kappa NULL
    val const = Seq.fill(5)((1, 1)).toDF("a", "b")
    val k = Analytics.cohenKappa(const, "a", "b")
      .select($"kappa").as[Option[Double]].head()
    assert(k.isEmpty)
    // null rows drop
    val withNulls = Seq((Some(1), Some(1)), (None, Some(1)), (Some(0), None))
      .toDF("a", "b")
    assert(Analytics.cohenKappa(withNulls, "a", "b")
      .select($"n").as[Long].head() === 1L)
  }

  test("transitionMatrix: hand-exact adjacent pairs under the total order; " +
    "partition independence") {
    val rows = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (2L, 1L, "A"), (2L, 2L, "A"))
    def run(parts: Int) =
      Analytics.transitionMatrix(
        rows.toDF("u", "t", "e").repartition(parts), "u", Seq("t"), "e")
        .as[(String, String, Long, Long, Double)].collect().toSeq
    val got = run(3)
    assert(got === Seq(
      ("A", "A", 1L, 3L, 0.333333),
      ("A", "B", 2L, 3L, 0.666667),
      ("B", "A", 1L, 1L, 1.0)))
    assert(run(1) === got && run(5) === got)
  }

  test("autocorrelation: hand-exact lag-1 Pearson; anti-correlated reads " +
    "-1; constant reads NULL; partition independence") {
    // a = [1,2,4,3]: pairs (1,2)(2,4)(4,3) → acf = 3/sqrt(14*6) = 0.327327
    val rows = Seq((1L, 1.0), (2L, 2.0), (3L, 4.0), (4L, 3.0))
      .map { case (t, v) => ("k", t, v) }
    def run(parts: Int) =
      Analytics.autocorrelation(rows.toDF("g", "t", "x").repartition(parts),
        "g", Seq("t"), "x", lag = 1)
        .as[(String, Long, Option[Double])].collect().toSeq
    val got = run(3)
    assert(got === Seq(("k", 3L, Some(0.327327))))
    assert(run(1) === got && run(5) === got)
    // b = -a exactly → acf −1.0 (after the 6-dp round)
    val anti = (1 to 6).map(i => ("k", i.toLong,
      if (i % 2 == 0) -1.0 else 1.0))
    assert(Analytics.autocorrelation(anti.toDF("g", "t", "x"),
      "g", Seq("t"), "x", 1)
      .as[(String, Long, Option[Double])].head()._3 === Some(-1.0))
    // constant series: zero variance → NULL
    val const = (1 to 5).map(i => ("k", i.toLong, 7.0))
    assert(Analytics.autocorrelation(const.toDF("g", "t", "x"),
      "g", Seq("t"), "x", 1)
      .as[(String, Long, Option[Double])].head()._3.isEmpty)
  }

  test("proportionTest: hand-exact 2x2 chi-square; zero margin NULL; " +
    "rejects non-two group counts") {
    val rows = (Seq.fill(4)(("v0", 1)) ++ Seq.fill(6)(("v0", 0)) ++
      Seq.fill(2)(("v1", 1)) ++ Seq.fill(8)(("v1", 0)))
    val got = Analytics.proportionTest(rows.toDF("g", "f"), "g", "f")
      .as[(String, String, Long, Long, Long, Long, Double, Double,
        Double, Option[Double])].head()
    assert(got === (("v0", "v1", 10L, 4L, 10L, 2L, 0.4, 0.2, 0.2,
      Some(0.952381))))
    // all-converted: a zero margin → chi2 NULL
    val allOne = Seq(("v0", 1), ("v1", 1)).toDF("g", "f")
    assert(Analytics.proportionTest(allOne, "g", "f")
      .select($"chi2").as[Option[Double]].head().isEmpty)
    intercept[IllegalArgumentException] {
      Analytics.proportionTest(Seq(("v0", 1)).toDF("g", "f"), "g", "f")
    }
  }

  // ---- weightedQuantiles (q174) ----------------------------------------

  test("weightedQuantiles: hand-exact lower-rule picks, zero weights " +
    "can't shift the pick, null drops, partition independence") {
    // group g: values 1..4 with weights 1,1,2,4 -> W=8
    //   thresholds: p25 ceil(8/4)=2, p50 ceil(8/2)=4, p75 ceil(24/4)=6
    //   cumw: 1->1, 2->2 (2.5 adds 0), 3->4, 4->8 => p25=2, p50=3, p75=4
    val df = Seq(
      ("g", java.lang.Double.valueOf(1.0), java.lang.Long.valueOf(1L)),
      ("g", java.lang.Double.valueOf(2.0), java.lang.Long.valueOf(1L)),
      ("g", java.lang.Double.valueOf(3.0), java.lang.Long.valueOf(2L)),
      ("g", java.lang.Double.valueOf(4.0), java.lang.Long.valueOf(4L)),
      ("g", java.lang.Double.valueOf(2.5), java.lang.Long.valueOf(0L)),
      ("h", java.lang.Double.valueOf(7.0), java.lang.Long.valueOf(5L)),
      ("h", java.lang.Double.valueOf(9.0), java.lang.Long.valueOf(0L)),
      ("g", null, java.lang.Long.valueOf(1L)),
      // duplicate (group, value) rows — the r21 raw-stream shape must
      // treat copies as one histogram bucket (RANGE-frame peers):
      // t: W=4, thresholds 1/2/3; cum(5)=2, cum(6)=4 => p25=5 p50=5 p75=6
      ("t", java.lang.Double.valueOf(5.0), java.lang.Long.valueOf(1L)),
      ("t", java.lang.Double.valueOf(5.0), java.lang.Long.valueOf(1L)),
      ("t", java.lang.Double.valueOf(6.0), java.lang.Long.valueOf(2L)))
      .toDF("grp", "v", "w")
    val got = Analytics.weightedQuantiles(df, "grp", "v", "w")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("g") === ((2.0, 3.0, 4.0)))
    assert(got("h") === ((7.0, 7.0, 7.0)))
    assert(got("t") === ((5.0, 5.0, 6.0)))
    val p1 = Analytics.weightedQuantiles(df.repartition(1), "grp", "v", "w")
      .collect().map(_.toString).toSeq
    val p7 = Analytics.weightedQuantiles(df.repartition(7), "grp", "v", "w")
      .collect().map(_.toString).toSeq
    assert(p1 === p7)
  }

  // ---- integrityAudit -------------------------------------------------

  test("integrityAudit: exact rows/nulls/orphans/ppm per edge; " +
      "duplicate parent keys don't double-count; partition independent") {
    val child = Seq(
      Some(1L), Some(1L), Some(2L), Some(3L), Some(9L), Some(9L), None,
      None)
      .toDF("fkcol")
    // parent has 1,2,3 (2 twice — dup keys must not double-count) but
    // not 9: the two key-9 rows orphan, 2 of 6 non-null = 333333 ppm
    val parent = Seq(1L, 2L, 2L, 3L).toDF("pk")
    val got = Analytics.integrityAudit(Seq(
      ("c->p", child, "fkcol", parent, "pk")))
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(("c->p", 8L, 2L, 2L, Some(333333L))))
    // all-null child: ppm is NULL, never a divide-by-zero
    val allNull = Seq[Option[Long]](None, None).toDF("fkcol")
    val gn = Analytics.integrityAudit(Seq(
      ("n->p", allNull, "fkcol", parent, "pk")))
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    assert(gn == Seq(("n->p", 2L, 2L, 0L, None)))
    // multiple edges order by fk; partition independence
    val two = Analytics.integrityAudit(Seq(
      ("z", child, "fkcol", parent, "pk"),
      ("a", child.repartition(5), "fkcol", parent.repartition(3), "pk")))
      .collect().map(_.toString).toSeq
    assert(two.head.startsWith("[a,") && two.last.startsWith("[z,"))
    val p1 = Analytics.integrityAudit(Seq(
      ("e", child.repartition(1), "fkcol", parent.repartition(1), "pk")))
      .collect().map(_.toString).toSeq
    val p7 = Analytics.integrityAudit(Seq(
      ("e", child.repartition(7), "fkcol", parent.repartition(4), "pk")))
      .collect().map(_.toString).toSeq
    assert(p1 === p7)
  }

  // ---- kaplanMeier ----------------------------------------------------

  test("kaplanMeier: hand-exact survival with censoring, all-dead time " +
      "reads exact 0.0, null rows drop, partition independent") {
    // group g: durations 10,10 (censored at horizon), 5,3,0 (deaths);
    // group z: two users both dying at t=3 -> S drops to exact 0.0
    val rows = Seq(
      ("g", 1L, 0L), ("g", 1L, 10L), ("g", 2L, 0L), ("g", 2L, 10L),
      ("g", 3L, 0L), ("g", 3L, 5L), ("g", 4L, 2L), ("g", 4L, 5L),
      ("g", 5L, 0L),
      ("z", 6L, 0L), ("z", 6L, 3L), ("z", 7L, 0L), ("z", 7L, 3L))
    val df = rows.toDF("grp", "uid", "day")
      .withColumn("ts", expr("timestamp_micros(day * 86400000000)"))
    val got = Analytics.kaplanMeier(df, "grp", "uid", "ts", censorDays = 2)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("g", 0L, 5L, 1L, 0L, 0.8),
      ("g", 3L, 4L, 1L, 0L, 0.6),
      ("g", 5L, 3L, 1L, 0L, 0.4),
      ("g", 10L, 2L, 0L, 2L, 0.4),
      ("z", 3L, 2L, 2L, 0L, 0.0)))
    // null user/ts/group rows drop without shifting anything
    val withNull = df.select($"grp", $"uid", $"ts").unionByName(
      Seq((Option.empty[String], Option(9L)), (Option("g"), Option.empty[Long]))
        .toDF("grp", "uid")
        .withColumn("ts", expr("timestamp_micros(86400000000)")))
      .unionByName(Seq(("g", 9L)).toDF("grp", "uid")
        .withColumn("ts", expr("CAST(NULL AS TIMESTAMP)")))
    val gn = Analytics.kaplanMeier(withNull, "grp", "uid", "ts", 2)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(gn === got)
    val p1 = Analytics.kaplanMeier(df.repartition(1), "grp", "uid", "ts", 2)
      .collect().map(_.toString).toSeq
    val p7 = Analytics.kaplanMeier(df.repartition(7), "grp", "uid", "ts", 2)
      .collect().map(_.toString).toSeq
    assert(p1 === p7)
  }

  // ---- scd2Build ------------------------------------------------------

  test("scd2Build: runs collapse with exclusive valid_to, same-ts ties " +
      "break by tie column, null value is a legal state, partition " +
      "independent") {
    val rows = Seq(
      // u1: A A B A  (B run in the middle; last run open)
      ("u1", 1L, 10L, Some("A")), ("u1", 2L, 20L, Some("A")),
      ("u1", 3L, 30L, Some("B")), ("u1", 4L, 40L, Some("A")),
      // u2: same-ts tie ordered by event_id: A (id5), B (id6)
      ("u2", 5L, 100L, Some("A")), ("u2", 6L, 100L, Some("B")),
      // u3: null-valued run between A runs
      ("u3", 7L, 1L, Some("A")), ("u3", 8L, 2L, None),
      ("u3", 9L, 3L, None), ("u3", 10L, 4L, Some("A")))
    val df = rows.toDF("u", "eid", "day", "v")
      .withColumn("ts", expr("timestamp_micros(day * 1000000)"))
    val got = Analytics.scd2Build(df, "u", "ts", "eid", "v")
      .selectExpr("u", "run_seq", "v", "unix_micros(valid_from) DIV 1000000",
        "unix_micros(valid_to) DIV 1000000", "n_rows")
      .as[(String, Long, Option[String], Long, Option[Long], Long)]
      .collect().toSeq
    assert(got === Seq(
      ("u1", 1L, Some("A"), 10L, Some(30L), 2L),
      ("u1", 2L, Some("B"), 30L, Some(40L), 1L),
      ("u1", 3L, Some("A"), 40L, None, 1L),
      ("u2", 1L, Some("A"), 100L, Some(100L), 1L),
      ("u2", 2L, Some("B"), 100L, None, 1L),
      ("u3", 1L, Some("A"), 1L, Some(2L), 1L),
      ("u3", 2L, None, 2L, Some(4L), 2L),
      ("u3", 3L, Some("A"), 4L, None, 1L)))
    val p1 = Analytics.scd2Build(df.repartition(1), "u", "ts", "eid", "v")
      .collect().map(_.toString).toSeq
    val p7 = Analytics.scd2Build(df.repartition(7), "u", "ts", "eid", "v")
      .collect().map(_.toString).toSeq
    assert(p1 === p7)
  }

  // ---- spearman -------------------------------------------------------

  test("spearman: hand-exact monotone=1 and inverse=-1, tie-exact " +
      "fractional ranks, outlier immunity vs pearson, all-tied NULL, " +
      "partition independent") {
    // perfectly monotone (nonlinear): spearman exactly 1
    val mono = (1 to 8).map(i => ("g", i.toDouble, (i * i).toDouble))
      .toDF("g", "x", "y")
    val g1 = Analytics.spearman(mono, "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().head
    assert(g1 === (("g", 8L, Some(1.0))))
    // inverse: exactly -1
    val inv = (1 to 8).map(i => ("g", i.toDouble, -i.toDouble))
      .toDF("g", "x", "y")
    assert(Analytics.spearman(inv, "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().head._3 === Some(-1.0))
    // tie-exact: x = (1,1,2), y = (1,2,3) -> r2x = (3,3,6)/2, r2y ranks
    // distinct; hand value: ranks x (1.5,1.5,3), y (1,2,3)
    // pearson(ranks): mean rx=2, ry=2; cov terms: (-.5,-1)+(-.5,0)+(1,1)
    // num = .5 + 0 + 1 = 1.5; varx = .25+.25+1=1.5; vary = 2
    // rho = 1.5/sqrt(3) = 0.866025
    val tie = Seq(("g", 1.0, 1.0), ("g", 1.0, 2.0), ("g", 2.0, 3.0))
      .toDF("g", "x", "y")
    val gt = Analytics.spearman(tie, "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().head
    assert(gt._3 === Some(0.866025))
    // a wild outlier barely moves spearman (rank-bounded)
    val out = ((1 to 9).map(i => ("g", i.toDouble, i.toDouble)) :+
      (("g", 10.0, 1e9))).toDF("g", "x", "y")
    assert(Analytics.spearman(out, "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().head._3 === Some(1.0))
    // all-tied x: zero rank variance -> NULL
    val flat = Seq(("g", 5.0, 1.0), ("g", 5.0, 2.0)).toDF("g", "x", "y")
    assert(Analytics.spearman(flat, "g", "x", "y")
      .as[(String, Long, Option[Double])].collect().head._3 === None)
    val big = (0 until 400).map(i =>
      (s"k${i % 3}", ((i * 37) % 101).toDouble, ((i * 53) % 97).toDouble))
      .toDF("g", "x", "y")
    val p1 = Analytics.spearman(big.repartition(1), "g", "x", "y")
      .collect().map(_.toString).toSeq
    val p7 = Analytics.spearman(big.repartition(7), "g", "x", "y")
      .collect().map(_.toString).toSeq
    assert(p1 === p7)
  }

  // ---- associationRules -----------------------------------------------

  test("associationRules: hand-exact confidence/lift both directions, " +
      "minPairCount gate, intra-basket duplicates collapse, partition " +
      "independent") {
    // baskets: u1 {x,y}, u2 {x,y}, u3 {x}, u4 {y,z} -> N=4
    // n_x=3, n_y=3, n_z=1; pair (x,y): 2; (y,z): 1
    val rows = Seq(
      ("u1", "x"), ("u1", "y"), ("u1", "y"), // dup y collapses
      ("u2", "x"), ("u2", "y"),
      ("u3", "x"),
      ("u4", "y"), ("u4", "z"))
    val df = rows.toDF("b", "i")
    val got = Analytics.associationRules(df, "b", "i", minPairCount = 2L)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // only (x,y) survives minPairCount=2; conf x->y = 2e6 DIV 3 =
    // 666666; y->x same; lift = 2*4/(3*3) = 0.888889
    assert(got === Seq(
      ("x", "y", 2L, 3L, 666666L, 0.888889),
      ("y", "x", 2L, 3L, 666666L, 0.888889)))
    val all = Analytics.associationRules(df, "b", "i", 1L)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // (y,z) appears both ways at min 1: conf y->z = 1e6 DIV 3, z->y = 1e6
    assert(all.size === 4)
    assert(all.contains(("z", "y", 1L, 1L, 1000000L, 1.333333)))
    assert(all.contains(("y", "z", 1L, 3L, 333333L, 1.333333)))
    val p1 = Analytics.associationRules(df.repartition(1), "b", "i", 1L)
      .collect().map(_.toString).toSeq
    val p7 = Analytics.associationRules(df.repartition(7), "b", "i", 1L)
      .collect().map(_.toString).toSeq
    assert(p1 === p7)
  }

  // ---- tailIndex ------------------------------------------------------

  test("tailIndex: hand-exact Hill alpha at k=2, short groups drop, " +
      "non-positive values drop, boundary ties value-invariant, " +
      "partition independent") {
    def r6(x: Double): java.math.BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).bigDecimal
    val df = Seq(
      ("g", 100.0), ("g", 50.0), ("g", 10.0), ("g", 1.0),
      ("h", 5.0), ("h", 4.0),           // only 2 values: drops at k=2
      ("z", 9.0), ("z", 9.0), ("z", 9.0), ("z", -3.0)) // ties; neg drops
      .toDF("grp", "v")
    val got = Analytics.tailIndex(df, "grp", "v", k = 2)
      .as[(String, Int, Double)].collect().toSeq
    // g: x_(3)=10, terms ln(10)+ln(5) lifted; alpha = 2e6/sum
    val sum = (r6(math.log(10.0)).movePointRight(6).longValueExact
      + r6(math.log(5.0)).movePointRight(6).longValueExact)
    val alphaG = BigDecimal(2000000.0 / sum.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // z: all-equal top values -> ln terms 0 -> s=0 -> dropped
    assert(got === Seq(("g", 2, alphaG)))
    val p1 = Analytics.tailIndex(df.repartition(1), "grp", "v", 2)
      .collect().map(_.toString).toSeq
    val p7 = Analytics.tailIndex(df.repartition(7), "grp", "v", 2)
      .collect().map(_.toString).toSeq
    assert(p1 === p7)
  }
}
