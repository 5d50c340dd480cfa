package graft

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Analytics, Curation, Scale}

/** The r14 sketch/profile family: quantilesHdr (mergeable log-linear
  * quantile sketch), drift (PSI), profileCard, and the count-min
  * sketch. Pins the properties the oracles cannot see: error bounds,
  * partition-layout independence (mergeability in action), the CMS
  * never-underestimate guarantee, and the negative-value guard. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def li = Tables.lineitem(spark, sf)

  test("quantilesHdr: bucket lower bound brackets the exact nearest-rank value") {
    val m = 5
    val got = Analytics.quantilesHdr(li, "l_returnflag", "l_extendedprice", m)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val vals = li.select(col("l_returnflag"), col("l_extendedprice"))
      .filter(col("l_extendedprice").isNotNull)
      .as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(v => math.round(v._2 * 100)).sorted).toMap
    assert(got.keySet == vals.keySet)
    for ((g, sorted) <- vals) {
      val (n, p50, p90, p99) = got(g)
      assert(n == sorted.length)
      for ((est, num) <- Seq(p50 -> 50, p90 -> 90, p99 -> 99)) {
        val rank = (n * num + 99) / 100 // ceil(p·n), 1-based
        val x = sorted((rank - 1).toInt).toDouble
        val lb = est * 100
        // x lies in the reported bucket: [lb, lb + width), width ≤
        // max(1, lb·2^-m) — the documented relative-error bound
        assert(lb <= x + 1e-6, s"$g p$num: lb=$lb > exact=$x")
        assert(x < lb + math.max(1.0, lb / (1 << m)) + 1e-6,
          s"$g p$num: exact=$x outside bucket at lb=$lb")
      }
    }
  }

  test("quantilesHdr: partition-layout independent (mergeable histogram)") {
    val a = Analytics.quantilesHdr(li.repartition(3), "l_returnflag",
      "l_extendedprice").collect().toSeq
    val b = Analytics.quantilesHdr(li.repartition(16, col("l_partkey")),
      "l_returnflag", "l_extendedprice").collect().toSeq
    assert(a == b)
  }

  test("quantilesHdr: tighter subBits shrinks the bucket, never crosses the exact value") {
    val coarse = Analytics.quantilesHdr(li, "l_returnflag", "l_extendedprice", 5)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val fine = Analytics.quantilesHdr(li, "l_returnflag", "l_extendedprice", 10)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    for ((g, c) <- coarse) assert(fine(g) >= c - 1e-9,
      s"$g: finer sketch p50 ${fine(g)} below coarser lower bound $c")
  }

  test("quantilesHdr: negative values raise the named error") {
    val df = Seq(("a", 1.0), ("a", -2.0)).toDF("g", "v")
    val e = intercept[Exception] {
      Analytics.quantilesHdr(df, "g", "v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("quantilesHdr")), e.toString)
  }

  test("drift: identical distributions read PSI = 0, a shift reads > 0") {
    val base = (0 until 200).map(i => ("k", (i % 10).toLong))
    val same = (base.map { case (k, b) => (k, b, true) } ++
      base.map { case (k, b) => (k, b, false) }).toDF("k", "bin", "a")
    val r0 = Analytics.drift(same, "k", col("bin"), col("a")).collect()
    assert(r0.length == 1 && r0(0).getDouble(4) == 0.0)
    val shifted = (base.map { case (k, b) => (k, b, true) } ++
      base.map { case (k, b) => (k, b + 3, false) }).toDF("k", "bin", "a")
    val r1 = Analytics.drift(shifted, "k", col("bin"), col("a")).collect()
    assert(r1(0).getDouble(4) > 0.01)
    // joint support: 10 A-bins ∪ 10 B-bins shifted by 3 = 13
    assert(r1(0).getLong(3) == 13L)
  }

  test("drift: partition-layout independent (decimal-exact PSI fold)") {
    val ev = Tables.events(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame) =
      Analytics.drift(df, "event_type",
        floor(col("value") / lit(20.0)).cast("long"),
        col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
        .collect().toSeq
    assert(run(ev.repartition(3)) == run(ev.repartition(16, col("event_id"))))
  }

  test("profileCard: exact counts on a known frame") {
    val df = Seq(
      ("s1", "one two three", "en", 13L),
      ("s1", null.asInstanceOf[String], "en", 0L),
      ("s1", "x", "de", 1L),
      ("s2", "a b", "en", 3L)).toDF("source", "text", "lang", "n_chars")
    val got = Curation.profileCard(df).collect()
    assert(got.length == 2)
    val s1 = got(0)
    assert(s1.getString(0) == "s1" && s1.getLong(1) == 3 &&
      s1.getLong(2) == 1 && s1.getLong(3) == 2 && s1.getLong(4) == 14)
    // total_tokens skips the null text: 3 + 1
    assert(s1.getLong(8) == 4)
    // all three docs are short (< 50 chars)
    assert(s1.getLong(9) == 3 && s1.getDouble(10) == 1.0)
  }

  test("cms: never underestimates, exact for uncollided keys, grid-bounded") {
    val ev = Tables.events(spark, sf)
    val sketch = Scale.countMinSketch(ev, "user_id")
    assert(sketch.count() <= 4L * 256)
    val truth = ev.filter(col("user_id").isNotNull)
      .groupBy(col("user_id")).agg(count(lit(1)).as("t"))
    val est = Scale.cmsEstimates(sketch, truth, "user_id")
    val j = truth.join(est, "user_id")
      .select(col("t"), col("cms_est")).as[(Long, Long)].collect()
    assert(j.nonEmpty)
    assert(j.forall { case (t, e) => e >= t },
      "CMS underestimated a key - the one guarantee it must never break")
  }

  test("cms: counters are additive (sketch of union == sum of sketches)") {
    val ev = Tables.events(spark, sf).filter(col("user_id").isNotNull)
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 =!= 0)
    val merged = Scale.countMinSketch(a, "user_id")
      .union(Scale.countMinSketch(b, "user_id"))
      .groupBy(col("r"), col("c")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val whole = Scale.countMinSketch(ev, "user_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == whole)
  }

  test("cms: partition-layout independent") {
    val ev = Tables.events(spark, sf)
    val a = Scale.countMinSketch(ev.repartition(3), "user_id")
      .orderBy("r", "c").collect().toSeq
    val b = Scale.countMinSketch(ev.repartition(16, col("event_id")), "user_id")
      .orderBy("r", "c").collect().toSeq
    assert(a == b)
  }
}
