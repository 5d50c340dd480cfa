package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join (inner and left)") {
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey".as("k"), $"l_partkey", $"l_quantity")
    val o = Tables.orders(spark, sf)
      .select($"o_orderkey".as("k"), $"o_totalprice")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"l_partkey", $"o_totalprice")
        .as[(Long, Long, Double)].collect().sorted.toSeq
    val plainInner = sorted(li.join(o, Seq("k"), "inner"))
    val saltedInner = sorted(Scale.saltedJoin(li, o, "k",
      hash($"l_partkey"), buckets = 8, "inner"))
    assert(saltedInner === plainInner)
    val plainLeft = sorted(li.join(o, Seq("k"), "left"))
    val saltedLeft = sorted(Scale.saltedJoin(li, o, "k",
      hash($"l_partkey"), buckets = 8, "left"))
    assert(saltedLeft === plainLeft)
  }

  test("co-bucketed join plans without an exchange") {
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")
    Scale.writeBucketed(
      Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity"),
      "li_bkt", "l_orderkey", buckets = 4)
    Scale.writeBucketed(
      Tables.orders(spark, sf).select($"o_orderkey".as("l_orderkey"), $"o_totalprice"),
      "o_bkt", "l_orderkey", buckets = 4)
    val joined = spark.table("li_bkt").join(spark.table("o_bkt"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    // and it still computes the right thing
    val expect = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() === expect)
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")
  }

  test("appendBucketed: appended rows land in the right buckets and the " +
      "co-bucketed join still plans without an exchange") {
    spark.sql("DROP TABLE IF EXISTS li_app_bkt")
    spark.sql("DROP TABLE IF EXISTS o_app_bkt")
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
    Scale.writeBucketed(li.filter($"l_orderkey" % 2 === 0),
      "li_app_bkt", "l_orderkey", buckets = 4)
    Scale.appendBucketed(li.filter($"l_orderkey" % 2 === 1),
      "li_app_bkt", "l_orderkey", buckets = 4)
    Scale.writeBucketed(
      Tables.orders(spark, sf).select($"o_orderkey".as("l_orderkey"), $"o_totalprice"),
      "o_app_bkt", "l_orderkey", buckets = 4)
    val joined = spark.table("li_app_bkt")
      .join(spark.table("o_app_bkt"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
    // appended data is VISIBLE and correct: counts match the plain join
    val expect = li.join(Tables.orders(spark, sf),
      $"l_orderkey" === $"o_orderkey").count()
    assert(joined.count() === expect)
    // a mismatched bucket spec is rejected, not silently accepted
    intercept[Exception] {
      Scale.appendBucketed(li.limit(1), "li_app_bkt", "l_orderkey",
        buckets = 8)
    }
    spark.sql("DROP TABLE IF EXISTS li_app_bkt")
    spark.sql("DROP TABLE IF EXISTS o_app_bkt")
  }

  test("q111 declared query: the co-bucketed join AND the user_id " +
    "aggregate after it plan with zero hash exchanges") {
    // force the sort-merge path: a broadcast join would make the
    // no-exchange assertion trivially true without exercising bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q111_bucketed_join")(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(3000))
      assert(plan.contains("SortMergeJoin"), plan.take(3000))
      assert(df.limit(1).count() === 1)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("custom kernels are callable from SQL after registration") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf).limit(10).createOrReplaceTempView("emb_v")
    val viaSql = spark.sql(
      """SELECT vec_id, graft_dot(embedding, embedding) AS selfdot,
        |  graft_hash_embed(array('a','b','a')) AS he,
        |  graft_simhash(array('x','y')) AS sh,
        |  graft_hyperplane_bucket(embedding) AS bkt,
        |  size(graft_bpe_tokens('join hash row')) AS nbpe,
        |  graft_int8_encode(embedding).scale AS qscale
        |FROM emb_v ORDER BY vec_id""".stripMargin).collect()
    assert(viaSql.length === 10)
    viaSql.foreach { r =>
      assert(r.getInt(4) >= 0 && r.getInt(4) < 16) // 4-bit bucket
      assert(r.getInt(5) === 3) // corpus words are whole-word merges
      assert(r.getDouble(6) > 0.0)
    }
    // selfdot equals the Column-API dot
    val viaCol = Tables.embeddings(spark, sf).limit(10)
      .select($"vec_id", graft.functions.VectorOps.dot($"embedding", $"embedding").as("d"))
      .as[(Long, Double)].collect().toMap
    viaSql.foreach { r =>
      assert(r.getDouble(1) === viaCol(r.getLong(0)))
    }
  }

  test("as-of join: <= semantics, deterministic ties, null when nothing precedes") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val left = Seq(
      (1L, ts(100), 10L),  // right rows at 50 and 100 precede → match 100's max id
      (1L, ts(40), 11L),   // nothing at or before 40 → null
      (2L, ts(500), 12L))  // other key
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(50), 20L),
      (1L, ts(100), 21L), (1L, ts(100), 22L), // tie at 100 → max id 22
      (1L, ts(200), 23L),                      // after → never matched by 100
      (2L, ts(499), 24L))
      .toDF("user_id", "ts", "event_id")
    val out = graft.operators.AsOfJoin.join(left, right, "user_id", "ts",
      "event_id", "event_id")
      .select($"event_id", $"matched").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(10L) === Some(22L)) // equal-ts rows match, tie → greatest id
    assert(out(11L) === None)
    assert(out(12L) === Some(24L))
  }

  test("as-of forward and nearest: >= semantics, tie contracts, one-sided fallbacks") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val left = Seq(
      (1L, ts(100), 10L),  // right at 100 (tie 21/22) and 200 follow → 22
      (1L, ts(240), 11L),  // nothing at or after → forward null
      (2L, ts(500), 12L),  // exactly between 499 and 501 → nearest ties backward
      (3L, ts(10), 13L))   // only a later right row → nearest takes forward
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(50), 20L),
      (1L, ts(100), 21L), (1L, ts(100), 22L),
      (1L, ts(200), 23L),
      (2L, ts(499), 24L), (2L, ts(501), 25L),
      (3L, ts(90), 26L))
      .toDF("user_id", "ts", "event_id")
    val fwd = graft.operators.AsOfJoin.joinForward(left, right, "user_id",
      "ts", "event_id", "event_id")
      .select($"event_id", $"matched").as[(Long, Option[Long])]
      .collect().toMap
    assert(fwd(10L) === Some(22L)) // equal-ts matches, tie → greatest id
    assert(fwd(11L) === None)      // nothing follows
    assert(fwd(12L) === Some(25L)) // 499 is before → earliest after is 501
    assert(fwd(13L) === Some(26L))
    val near = graft.operators.AsOfJoin.joinNearest(left, right, "user_id",
      "ts", "event_id", "event_id")
      .select($"event_id", $"matched").as[(Long, Option[Long])]
      .collect().toMap
    assert(near(10L) === Some(22L)) // distance 0 both ways → backward tie rule
    assert(near(11L) === Some(23L)) // forward empty → backward
    assert(near(12L) === Some(24L)) // |1| == |1| → backward wins
    assert(near(13L) === Some(26L)) // backward empty → forward
    // partition independence
    val a = graft.operators.AsOfJoin.joinNearest(left.repartition(7), right,
      "user_id", "ts", "event_id", "event_id")
      .orderBy($"event_id").collect().toSeq
    val b = graft.operators.AsOfJoin.joinNearest(left.repartition(1), right,
      "user_id", "ts", "event_id", "event_id")
      .orderBy($"event_id").collect().toSeq
    assert(a === b)
  }

  test("approx quantiles land within the exact interpolated neighborhood") {
    // approx_percentile returns actual data values with bounded rank
    // error; at fixture scale (accuracy 10000 >> group size) each
    // sketch value must sit within 1% of the exact interpolated
    // quantile — the contract the rows-only q58 leans on.
    val exact = SparkEntry.queries("q41_quantiles")(spark, sf)
      .as[(String, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    val approx = SparkEntry.queries("q58_quantiles_approx")(spark, sf)
      .as[(String, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (g, (_, p50, p90, p99)) =>
      val (_, a50, a90, a99) = approx(g)
      assert(math.abs(a50 - p50) / p50 < 0.01, s"$g p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 < 0.01, s"$g p90: $a90 vs $p90")
      assert(math.abs(a99 - p99) / p99 < 0.01, s"$g p99: $a99 vs $p99")
    }
  }

  test("histogram-plan exact quantiles == the buffered percentile built-in") {
    import graft.operators.Analytics
    // the scalable histogram+window plan must reproduce Spark's
    // Percentile interpolation BIT-identically — fixture differential
    // over a high-cardinality decimal column...
    val li = Tables.lineitem(spark, sf)
    def viaBuiltin(df: org.apache.spark.sql.DataFrame, g: String, v: String) =
      df.groupBy(col(g))
        .agg(percentile(col(v), array(lit(0.5), lit(0.9), lit(0.99))).as("__q"))
        .select(col(g), round(element_at(col("__q"), 1), 6).as("p50"),
          round(element_at(col("__q"), 2), 6).as("p90"),
          round(element_at(col("__q"), 3), 6).as("p99"))
        .orderBy(col(g))
    assert(Analytics.quantiles(li, "l_returnflag", "l_extendedprice").collect().toSeq
      === viaBuiltin(li, "l_returnflag", "l_extendedprice").collect().toSeq)
    // ...and over hand-built edges: single-row group (position 0 ==
    // floor == ceil), heavy duplication (one histogram row spans many
    // ranks), integral positions (n = 11 puts p50 exactly on rank 5),
    // and fractional interpolation between adjacent distinct values
    val edges = (Seq((1, 42.0)) ++                   // singleton group
      (1 to 10).map(_ => (2, 7.0)) ++                // all-duplicate group
      (0 until 11).map(i => (3, i.toDouble)) ++      // integral positions
      Seq((4, 1.0), (4, 2.0), (4, 4.0), (4, 8.0)))   // fractional interp
      .toDF("g", "v")
    assert(Analytics.quantiles(edges, "g", "v").collect().toSeq
      === viaBuiltin(edges, "g", "v").collect().toSeq)
  }

  test("z-order: interleave round-trips, files cover disjoint z-ranges") {
    import graft.operators.Scale
    // zValue == a reference driver-side interleave on every (x, y) pair
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    def ref(x: Long, y: Long): Long =
      (0 until 4).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Scale.zValue($"x", $"y", 4).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === ref(x, y), s"($x,$y)") }
    // de-interleave sanity: z is a bijection on the 16x16 grid
    assert(got.map(_._3).toSet.size === pts.size)

    // layout: z-ordered write produces files with pairwise-disjoint
    // z-ranges (range partition + in-file sort), rows preserved
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    val orders = Tables.orders(spark, sf)
      .select($"o_orderkey", ($"o_custkey" % 256).cast("long").as("x"),
        (floor($"o_totalprice").cast("long") % 256).as("y"))
    Scale.writeZOrdered(orders, dir, $"x", $"y", bits = 8, files = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() === orders.count())
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min($"__z").as("lo"), max($"__z").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("heavy hitters: exact across partition layouts, MG superset holds " +
      "under adversarial churn, capacity clamps, nulls excluded") {
    // planted mix: one hot key (300), one warm key (120), 100 singletons
    val rows = Seq.fill(300)("hot") ++ Seq.fill(120)("warm") ++
      (1 to 100).map(i => s"k$i")
    def brute(df: org.apache.spark.sql.DataFrame, minShare: Double) = {
      val n = df.filter($"k".isNotNull).count()
      df.filter($"k".isNotNull).groupBy($"k").count()
        .filter($"count".cast("double") > minShare * n)
        .select($"k", $"count".as("cnt"),
          round($"count".cast("double") / n, 6).as("share"))
        .as[(String, Long, Double)].collect().sorted.toSeq
    }
    // exactness must be independent of partition layout (the MG
    // candidate sets differ per layout; the verify pass must not)
    for (parts <- Seq(1, 3, 8)) {
      val df = spark.sparkContext
        // interleave deterministically so every partition sees a mix
        .parallelize(rows.zipWithIndex.sortBy(_._2 % 7).map(_._1), parts)
        .toDF("k")
      val got = Scale.heavyHitters(df, "k", 0.1)
        .as[(String, Long, Double)].collect().sorted.toSeq
      assert(got === brute(df, 0.1), s"parts=$parts")
      assert(got.map(_._1) === Seq("hot", "warm"))
    }
    // a tiny explicit capacity is clamped to ceil(1/minShare) — still exact
    val one = spark.sparkContext.parallelize(rows, 4).toDF("k")
    val clamped = Scale.heavyHitters(one, "k", 0.25, capacity = 2)
      .as[(String, Long, Double)].collect().toSeq
    assert(clamped.map(_._1) === Seq("hot"))
    // adversarial churn: 1000 distinct singletons force constant MG
    // decrements; the 5.7% hitter must still survive (count 60 >
    // n/(capacity+1) = 1060/21 with the clamp at ceil(1/0.05) = 20)
    val churn = spark.sparkContext.parallelize(
      (Seq.fill(60)("H") ++ (1 to 1000).map(i => s"x$i"))
        .zipWithIndex.sortBy(_._2 % 13).map(_._1), 6).toDF("k")
    val hh = Scale.heavyHitters(churn, "k", 0.05)
      .as[(String, Long, Double)].collect().toSeq
    assert(hh === brute(churn, 0.05))
    assert(hh.map(_._1) === Seq("H"))
    // null keys are excluded from both the result and the denominator
    val withNulls = spark.sparkContext.parallelize(
      Seq.fill(50)(Some("hot")) ++ Seq.fill(30)(Option.empty[String]) ++
        (1 to 20).map(i => Some(s"k$i")), 3).toDF("k")
    val nn = Scale.heavyHitters(withNulls, "k", 0.5)
      .as[(String, Long, Double)].collect().toSeq
    assert(nn.map(_._1) === Seq("hot"))
    assert(nn.head._3 === math.rint(50.0 / 70.0 * 1e6) / 1e6)
  }

  test("heavy hitters: tree-merged candidates bound the driver hold at " +
      "capacity under a many-partition layout; broadcast-join verify " +
      "path is bit-identical to the literal path") {
    // 200 partitions — pre-r14 the driver collected partitions × cap
    // partials; the merge tree (fanIn=32: 200 → 7 → 1) must deliver a
    // single final summary of ≤ cap rows
    val rows = Seq.fill(500)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 400).map(i => s"k$i")
    val df = spark.sparkContext
      .parallelize(rows.zipWithIndex.sortBy(_._2 % 11).map(_._1), 200)
      .toDF("k")
    val cap = 20
    val cands = Scale.mergedCandidates(
      df.select($"k").filter($"k".isNotNull), cap)
    assert(cands.size <= cap,
      s"driver hold ${cands.size} exceeds capacity $cap")
    assert(cands.contains("hot") && cands.contains("warm"),
      "true hitters must survive the merge tree (MG superset guarantee)")
    // exactness through the tree, against brute force
    val n = rows.size.toDouble
    def expect(minShare: Double) = rows.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .filter(_._2 > minShare * n)
      .map { case (k, c) => (k, c, math.rint(c / n * 1e6) / 1e6) }
      .sortBy(_._1)
    val got = Scale.heavyHitters(df, "k", 0.15, cap)
      .as[(String, Long, Double)].collect().toSeq
    assert(got === expect(0.15))
    // the verify filter's broadcast-join form (forced via a zero
    // literal threshold) must equal the isInCollection form exactly
    val viaJoin = Scale.heavyHittersImpl(df, "k", 0.15, cap,
        maxLiteralCandidates = 0)
      .as[(String, Long, Double)].collect().toSeq
    assert(viaJoin === got)
  }

  test("autoSaltedJoin equals the plain join on skewed and uniform keys " +
      "(both decision branches)") {
    val dims = (0 until 30).map(i => (i.toLong, s"dim$i")).toDF("k", "v")
    def facts(hot: Boolean) = {
      val rows =
        if (hot) (1 to 400).map(i => (0L, i)) ++ (1 to 200).map(i => ((i % 30).toLong, i))
        else (1 to 600).map(i => ((i % 30).toLong, i))
      spark.sparkContext.parallelize(rows, 5).toDF("k", "p")
    }
    for (hot <- Seq(true, false); jt <- Seq("inner", "left")) {
      val f = facts(hot)
      val plain = f.join(dims, Seq("k"), jt)
        .select($"k", $"p", $"v").as[(Long, Int, String)]
        .collect().sorted.toSeq
      val auto = Scale.autoSaltedJoin(f, dims, "k", minShare = 0.25, buckets = 4,
          joinType = jt)
        .select($"k", $"p", $"v").as[(Long, Int, String)]
        .collect().sorted.toSeq
      assert(auto === plain, s"hot=$hot join=$jt")
    }
  }

  test("autoSaltedJoin hot branch with NULL big-side keys: left join " +
      "preserves the null rows, inner drops them — both == plain join") {
    val dims = (0 until 5).map(i => (i.toLong, s"d$i")).toDF("k", "v")
    val rows: Seq[(Option[Long], Int)] =
      (1 to 200).map(i => (Some(0L), i)) ++             // hot key 0
        (1 to 50).map(i => (Some((i % 5).toLong), i)) ++
        Seq((Option.empty[Long], 901), (Option.empty[Long], 902))
    val f = spark.sparkContext.parallelize(rows, 4).toDF("k", "p")
    for (jt <- Seq("inner", "left")) {
      val plain = f.join(dims, Seq("k"), jt)
        .select($"k", $"p", $"v").as[(Option[Long], Int, Option[String])]
        .collect().sorted.toSeq
      val auto = Scale.autoSaltedJoin(f, dims, "k", minShare = 0.3,
          buckets = 4, joinType = jt)
        .select($"k", $"p", $"v").as[(Option[Long], Int, Option[String])]
        .collect().sorted.toSeq
      assert(auto === plain, s"join=$jt")
      val nullRows = auto.count(_._1.isEmpty)
      assert(nullRows === (if (jt == "left") 2 else 0), s"join=$jt")
    }
  }

  test("whole queries run through spark.sql over registered views") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
      .as[(String, String, Double, Long)].collect().toSeq
    val viaApi = SparkEntry.queries("q01_pricing_summary")(spark, sf)
      .select($"l_returnflag", $"l_linestatus", $"sum_qty", $"count_order")
      .as[(String, String, Double, Long)].collect().toSeq
    assert(viaSql === viaApi)
  }

  test("rangeJoin == the naive predicate join: boundaries, multi-bucket " +
    "spans, negatives, empty intervals; plans as an equi-join") {
    val pts = Seq(-9L, -7L, -1L, 0L, 1L, 5L, 9L, 10L, 14L, 15L, 99L)
      .map(p => (p, s"p$p")).toDF("p", "ptag")
    val ivs = Seq(
      (1L, 0L, 10L),    // covers [0,10): boundary 0 in, 10 out
      (2L, -8L, 2L),    // negative span crossing zero
      (3L, 5L, 35L),    // spans multiple width-10 buckets
      (4L, 20L, 20L),   // empty: matches nothing
      (5L, 50L, 40L))   // inverted: matches nothing
      .toDF("iv_id", "s", "e")
    val got = Scale.rangeJoin(pts, ivs, "p", "s", "e", bucketWidth = 10L)
      .select($"p", $"iv_id").as[(Long, Long)].collect().sorted.toSeq
    val naive = pts.join(ivs, $"p" >= $"s" && $"p" < $"e")
      .select($"p", $"iv_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got === naive)
    assert(got.nonEmpty && !got.exists { case (_, iv) => iv == 4L || iv == 5L })
    // each matching pair exactly once (no multi-bucket duplicates)
    assert(got.distinct === got)
    // the bucket decomposition must produce an equi-join, never a
    // nested-loop/cartesian plan
    val plan = Scale.rangeJoin(pts, ivs, "p", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("intervalJoin == the naive overlap join: touching intervals " +
    "excluded, multi-bucket spans, negatives, keyed, exactly-once; " +
    "plans as an equi-join; fan-out guard raises its own error") {
    val a = Seq(
      (1L, "u", 0L, 10L),     // overlaps b1, touches b2 (ea == sb2)
      (2L, "u", -15L, -4L),   // negative span
      (3L, "u", 5L, 95L),     // spans many width-10 buckets
      (4L, "v", 0L, 10L),     // different key: never pairs with u
      (5L, "u", 20L, 20L))    // empty: matches nothing
      .toDF("id_a", "k", "sa", "ea")
    val b = Seq(
      (11L, "u", 8L, 12L),    // overlaps a1 and a3
      (12L, "u", 10L, 14L),   // touches a1 at 10 — NOT an overlap
      (13L, "u", -9L, -8L),   // inside a2
      (14L, "u", 90L, 200L),  // overlaps a3's tail across buckets
      (15L, "v", 5L, 6L))     // key v: only a4
      .toDF("id_b", "k", "sb", "eb")
    val got = Scale.intervalJoin(a, b, Seq("k"), "sa", "ea", "sb", "eb",
        bucketWidth = 10L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().sorted.toSeq
    val naive = a.join(b, a("k") === b("k") &&
        $"sa" < $"eb" && $"sb" < $"ea" && $"ea" > $"sa" && $"eb" > $"sb")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().sorted.toSeq
    assert(got === naive)
    assert(got.contains((1L, 11L)) && got.contains((2L, 13L)) &&
      got.contains((3L, 14L)) && got.contains((4L, 15L)))
    assert(!got.contains((1L, 12L)), "touching intervals must not pair")
    assert(!got.exists(_._1 == 5L), "empty interval must match nothing")
    // exactly-once: a multi-bucket × multi-bucket overlap (a3 × b14
    // share buckets 9..9? and a3 × b11 share several) appears once
    assert(got.distinct === got)
    val plan = Scale.intervalJoin(a, b, Seq("k"), "sa", "ea", "sb", "eb",
        10L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
    // fan-out guard: its own clear error, even on overflowing bounds
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val huge = Seq((9L, "u", 0L, 1000000L)).toDF("id_b", "k", "sb", "eb")
    val ex = intercept[Exception] {
      Scale.intervalJoin(a, huge, Seq("k"), "sa", "ea", "sb", "eb",
        bucketWidth = 10L, maxBucketsPerInterval = 100L).collect()
    }
    assert(msgs(ex).exists(_.contains("intervalJoin: interval")), ex.toString)
  }

  test("rangeJoin: an interval covering more buckets than the cap raises " +
    "a clear error instead of materializing a huge array") {
    val pts = Seq((5L, "p")).toDF("p", "ptag")
    val ivs = Seq((1L, 0L, 1000000L)).toDF("iv_id", "s", "e")
    val ex = intercept[Exception] {
      Scale.rangeJoin(pts, ivs, "p", "s", "e", bucketWidth = 10L,
        maxBucketsPerInterval = 100L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("rangeJoin: interval")), ex.toString)
    // an interval under the cap passes untouched
    val ivsOk = Seq((1L, 0L, 1000L)).toDF("iv_id", "s", "e")
    val ok = Scale.rangeJoin(pts, ivsOk, "p", "s", "e", bucketWidth = 10L,
      maxBucketsPerInterval = 100L)
      .select($"iv_id").as[Long].collect().toSeq
    assert(ok === Seq(1L))
    // extreme corrupt bounds whose bucket-count SUBTRACTION overflows a
    // long under ANSI: the guard must still raise ITS error (via
    // try_subtract → null → otherwise branch), not an opaque
    // ArithmeticException from its own arithmetic
    val ivsOverflow = Seq((1L, Long.MinValue + 10L, Long.MaxValue - 10L))
      .toDF("iv_id", "s", "e")
    val ex2 = intercept[Exception] {
      Scale.rangeJoin(pts, ivsOverflow, "p", "s", "e", bucketWidth = 10L,
        maxBucketsPerInterval = 100L).collect()
    }
    assert(msgs(ex2).exists(_.contains("rangeJoin: interval")), ex2.toString)
    assert(!ex2.isInstanceOf[ArithmeticException])
  }

  test("cachedHotKeys memoizes per (JVM, cacheKey): a second call with " +
    "different data but the same key returns the cached set") {
    val key = s"spec:${java.util.UUID.randomUUID()}"
    val skewed = spark.sparkContext.parallelize(
      Seq.fill(50)("hot") ++ (1 to 20).map(i => s"k$i"), 3).toDF("k")
    val first = Scale.cachedHotKeys(skewed, "k", 0.3, key)
    assert(first === Seq("hot"))
    // an EMPTY frame would measure zero hot keys if rescanned — the
    // memo must return the first measurement instead
    val empty = Seq.empty[String].toDF("k")
    assert(Scale.cachedHotKeys(empty, "k", 0.3, key) === Seq("hot"))
    // a different cacheKey DOES measure the new data
    val key2 = s"spec:${java.util.UUID.randomUUID()}"
    assert(Scale.cachedHotKeys(empty, "k", 0.3, key2).isEmpty)
  }

  test("funnel rejects duplicate and non-identifier stage names") {
    import graft.operators.Analytics
    val ev = Seq((1L, "view", 1L)).toDF("user_id", "event_type", "ts")
    intercept[IllegalArgumentException] {
      Analytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "view"))
    }
    intercept[IllegalArgumentException] {
      Analytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "add to cart"))
    }
  }

  test("funnel: stage gating at-or-after the previous stage; exact counts and rates") {
    import graft.operators.Analytics
    val ev = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L), // full path
      (2L, "click", 1L), (2L, "view", 2L), (2L, "purchase", 5L), // click BEFORE view → gated out, purchase too
      (3L, "view", 1L),                                          // view only
      (4L, "view", 5L), (4L, "click", 5L))                       // same-instant click counts (>=)
      .toDF("user_id", "event_type", "ts")
    val got = Analytics.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(got === ((4L, 2L, 1L, 0.5, 0.5)))
    // an empty upstream stage nulls the rate instead of dividing by zero
    val none = Analytics.funnel(ev.filter($"event_type" =!= "view"),
      "user_id", "event_type", "ts", Seq("view", "click"))
      .select($"n_view", $"view_to_click".isNull)
      .as[(Long, Boolean)].collect().head
    assert(none === ((0L, true)))
  }

  test("retention: exact per-period counts and next-period semantics") {
    import graft.operators.Analytics
    val day = 86400000000L
    val ev = Seq((1L, 0L), (2L, 100L), (1L, day + 5L), (1L, 2 * day),
      (3L, 2 * day + 7L))
      .toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val got = Analytics.retention(ev, "user_id", "ts", periodDays = 1)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (0L, 0L, 2L, 1L, 0.5),         // u1,u2 active; only u1 returns
      (1L, day, 1L, 1L, 1.0),        // u1 active and returns
      (2L, 2 * day, 2L, 0L, 0.0)))   // last period: empty future
    // duplicate activity within a period counts once
    val dup = Analytics.retention(ev.union(ev), "user_id", "ts", 1)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(dup === got)
  }

  test("hotKeysStream: the MG guarantee holds over the WHOLE stream " +
      "(superset + weight bounds + exact n_total), state stays " +
      "bounded, and a crash-replay of a batch is bit-identical") {
    import java.nio.file.Files
    // N=1220, capacity=10 → slack N/11 ≈ 110: hot (300) and warm (120)
    // are true hitters and MUST survive any batch decomposition
    val rows = Seq.fill(300)("hot") ++ Seq.fill(120)("warm") ++
      (1 to 800).map(i => s"x$i")
    val src = Files.createTempDirectory("graft_hk_src").toString
    spark.createDataset(rows.zipWithIndex.sortBy(_._2 % 7).map(_._1))
      .toDF("k").repartition(6).write.mode("overwrite").parquet(src)
    val state = Files.createTempDirectory("graft_hk_state").toString
    val ckpt = Files.createTempDirectory("graft_hk_ckpt").toString
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = Scale.hotKeysStream(stream, "k", capacity = 10, state, ckpt)
    q.awaitTermination()
    val sm = Scale.hotKeySummary(spark, state)
      .select($"key", $"wt", $"n_total")
      .as[(String, Long, Long)].collect().toSeq
    assert(sm.nonEmpty && sm.size <= 10)
    val n = sm.head._3
    assert(n === 1220L)
    val slack = n / 11
    val wts = sm.map(t => t._1 -> t._2).toMap
    assert(wts.contains("hot") && wts.contains("warm"),
      s"true hitters must survive the cross-batch merge: $wts")
    assert(wts("hot") <= 300L && wts("hot") + slack >= 300L)
    assert(wts("warm") <= 120L && wts("warm") + slack >= 120L)
    // retention: only the latest two batch states remain
    val dirs = new java.io.File(state).listFiles()
      .map(_.getName).filter(_.startsWith("batch="))
    assert(dirs.length <= 2, dirs.mkString(","))
    // crash-replay: re-running a batch against its predecessor's state
    // reproduces the state file exactly (rows AND order)
    val st2 = Files.createTempDirectory("graft_hk_state2").toString
    val b0 = spark.createDataset(
      Seq.fill(50)("hot") ++ (1 to 100).map(i => s"a$i")).toDF("k")
    val b1 = spark.createDataset(
      Seq.fill(70)("hot") ++ (1 to 100).map(i => s"b$i")).toDF("k")
    Scale.hotKeysBatch(b0, 0L, "k", 10, st2)
    Scale.hotKeysBatch(b1, 1L, "k", 10, st2)
    def stateRows() = spark.read.parquet(st2 + "/batch=1")
      .collect().map(r => (r.get(0), r.getLong(1))).toSeq
    val snap = stateRows()
    Scale.hotKeysBatch(b1, 1L, "k", 10, st2) // the replay
    assert(stateRows() === snap)
    // a NEW stream (fresh checkpoint → batch ids reset to 0) against the
    // REUSED stateDir must not serve the old run's high-id state: batch 0
    // purges every existing batch= dir, so the summary reflects only the
    // new run (the old posture silently kept batch=1 as the max forever)
    val fresh = spark.createDataset(
      Seq.fill(40)("NEW") ++ (1 to 50).map(i => s"c$i")).toDF("k")
    Scale.hotKeysBatch(fresh, 0L, "k", 10, st2)
    val dirs2 = new java.io.File(st2).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(dirs2 === Seq("batch=0"), dirs2.mkString(","))
    val sm2 = Scale.hotKeySummary(spark, st2)
      .select($"key", $"wt", $"n_total")
      .as[(String, Long, Long)].collect().toSeq
    assert(sm2.head._3 === 90L, sm2.toString) // new run's n, not old + new
    assert(sm2.exists(_._1 == "NEW"))
    assert(!sm2.exists(_._1 == "hot"), "stale prior-run key served")
  }

  test("topKPerGroup: exact planted results with ties and short groups; " +
      "equals the window-rank form on the fixture; partition-count " +
      "independent; plans as a partial-combinable ObjectHashAggregate, " +
      "not a window sort") {
    import graft.operators.Analytics
    // planted: group 1 has a tie at v=5.0 (ids 11 < 13 break it),
    // group 2 has fewer rows than k
    val rows = Seq(
      (1L, 5.0, 13L), (1L, 5.0, 11L), (1L, 9.0, 12L), (1L, 1.0, 14L),
      (2L, 3.0, 21L))
    val df = spark.sparkContext.parallelize(rows, 3).toDF("g", "v", "id")
    val got = Analytics.topKPerGroup(df, "g", "v", "id", k = 3)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 1, 12L, 9.0), (1L, 2, 11L, 5.0), (1L, 3, 13L, 5.0),
      (2L, 1, 21L, 3.0)))
    // fixture: identical to the window-rank formulation
    val ev = Tables.events(spark, sf)
    val viaAgg = Analytics.topKPerGroup(ev, "user_id", "value",
        "event_id", 3)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"value".desc, $"event_id")
    val viaWindow = ev
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter($"rank" <= 3)
      .select($"user_id", $"rank", $"event_id", $"value")
      .orderBy($"user_id", $"rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(viaAgg === viaWindow)
    // merge-order independence: selection commutes (unlike double sums)
    val at8 = Analytics.topKPerGroup(ev.repartition(8), "user_id",
        "value", "event_id", 3)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(at8 === viaAgg)
    // the safety property on the plan: a partial-combinable aggregate,
    // never a per-group window sort of the full stream
    val plan = Analytics.topKPerGroup(ev, "user_id", "value",
      "event_id", 3).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window "),
      plan.take(2000))
  }

  test("topKPerGroup: NaN values order deterministically as greatest " +
      "(merge-order independent), null values/ids are dropped") {
    import graft.operators.Analytics
    // raw >/== both compare false against NaN → sortWith's contract
    // broke and the surviving set was merge-order dependent; the
    // Double.compare total order pins NaN > +Inf > finite
    val rows: Seq[(Long, java.lang.Double, java.lang.Long)] = Seq(
      (1L, Double.NaN, 10L), (1L, 9.0, 11L), (1L, Double.NaN, 12L),
      (1L, Double.PositiveInfinity, 13L), (1L, 1.0, 14L),
      (2L, null, 20L), (2L, 3.0, 21L), (2L, 4.0, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
    // compare v by BIT PATTERN — tuple == on a NaN is always false
    def run(parts: Int): Seq[(Long, Int, Long, Long)] =
      Analytics.topKPerGroup(df.repartition(parts), "g", "v", "id", k = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSeq
    val got = run(4)
    // group 1: NaN(10) < NaN(12) by id, then +Inf, 9.0 trimmed at k=3;
    // group 2: the null-value and null-id rows are dropped
    assert(got.filter(_._1 == 1L).map(t => t._3) === Seq(10L, 12L, 13L))
    assert(got.filter(_._1 == 2L) ===
      Seq((2L, 1, 21L, java.lang.Double.doubleToLongBits(3.0))))
    assert(run(1) === got && run(7) === got, "merge-order dependence")
  }

  test("gapFillDaily: inactive days zero-filled inside each user's " +
      "span, none outside; decimal-exact sums; corrupt span raises") {
    import graft.operators.Analytics
    val day = 86400000000L
    val ev = Seq(
      (1L, 0L, 1.25), (1L, 10L, 2.25),       // day 0 ×2
      (1L, 3 * day + 5L, 4.5),               // day 3 (1,2 inactive)
      (2L, 5 * day, 7.0))                    // single-day user
      .toDF("user_id", "us", "value")
      .select($"user_id", timestamp_micros($"us").as("ts"), $"value")
    val got = Analytics.gapFillDaily(ev, "user_id", "ts", "value")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 0L, 2L, 3.5),
      (1L, 1L, day, 0L, 0.0),
      (1L, 2L, 2 * day, 0L, 0.0),
      (1L, 3L, 3 * day, 1L, 4.5),
      (2L, 5L, 5 * day, 1L, 7.0)))
    // the LOCF twin: filled days carry the LAST active day's sum (and
    // n_events 0 keeps the fill distinguishable from real activity)
    val locf = Analytics.gapFillDailyLocf(ev, "user_id", "ts", "value")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(locf === Seq(
      (1L, 0L, 0L, 2L, 3.5),
      (1L, 1L, day, 0L, 3.5),
      (1L, 2L, 2 * day, 0L, 3.5),
      (1L, 3L, 3 * day, 1L, 4.5),
      (2L, 5L, 5 * day, 1L, 7.0)))
    // fan-out guard: a user spanning more than maxDays raises the
    // clear error, not an executor OOM from a huge sequence
    val corrupt = Seq((9L, 0L, 1.0), (9L, 1000 * day, 1.0))
      .toDF("user_id", "us", "value")
      .select($"user_id", timestamp_micros($"us").as("ts"), $"value")
    val ex = intercept[Exception] {
      Analytics.gapFillDaily(corrupt, "user_id", "ts", "value",
        maxDays = 100L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("gapFillDaily: user")), ex.toString)
  }

  test("joinSizeProfile: exact totals vs the real join, top-k order, " +
      "null keys excluded, partition independence") {
    import spark.implicits._
    val a = Seq[(java.lang.Long, String)](
      (1L, "r"), (1L, "r"), (1L, "r"), (2L, "r"), (3L, "r"), (null, "r"))
      .toDF("k", "pay")
    val b = Seq[(java.lang.Long, String)](
      (1L, "s"), (1L, "s"), (2L, "s"), (4L, "s"), (null, "s"))
      .toDF("k", "pay")
    val got = graft.operators.Scale.joinSizeProfile(a, b, "k", k = 10)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    // key 1: 3*2=6; key 2: 1*1=1; keys 3/4 one-sided; nulls excluded
    assert(got == Seq(
      (1L, 3L, 2L, 6L, 7L, 2L, 0.857143),
      (2L, 1L, 1L, 1L, 7L, 2L, 0.142857)))
    // the profile's total equals the REAL join's output cardinality
    val real = a.join(b, Seq("k")).count()
    assert(got.head._5 == real)
    // k truncates under the (pairs DESC, key) total order
    val top1 = graft.operators.Scale.joinSizeProfile(a, b, "k", k = 1)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(top1 == got.take(1))
    // partition independence
    val p1 = graft.operators.Scale.joinSizeProfile(
      a.repartition(1), b.repartition(1), "k", 10).collect().toSeq
    val p7 = graft.operators.Scale.joinSizeProfile(
      a.repartition(7), b.repartition(5), "k", 10).collect().toSeq
    assert(p1 == p7)
    intercept[IllegalArgumentException] {
      graft.operators.Scale.joinSizeProfile(a, b, "k", 0)
    }
  }

  // ---- kmvOverlap -------------------------------------------------------

  test("kmvOverlap: exact replica of the documented sketch math; " +
      "under-k groups read exact counts; partition independent") {
    import graft.operators.Scale
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // groups: a = 0..199, b = 100..299 (overlap 100), c = 0..9 (under k)
    val rows = (0 until 200).map(i => ("a", i.toLong)) ++
      (100 until 300).map(i => ("b", i.toLong)) ++
      (0 until 10).map(i => ("c", i.toLong))
    val df = rows.toDF("g", "v")
    val k = 64
    val got = Scale.kmvOverlap(df, "g", "v", k)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // driver replica straight from the scaladoc
    val sets = rows.groupBy(_._1).view
      .mapValues(_.map(_._2.toString).distinct.map(md5hex).sorted).toMap
    def estOf(kept: Seq[String]): Long =
      if (kept.size < k) kept.size.toLong
      else 63L * (1L << 56) / java.lang.Long.parseLong(
        kept.last.substring(0, 14), 16)
    val kmin = sets.map { case (g, hs) => (g, hs.take(k)) }
    def pairRow(a: String, b: String) = {
      val union = (kmin(a) ++ kmin(b)).distinct.sorted.take(k)
      val ku = union.size.toLong
      val rho = union.count(h => kmin(a).contains(h) && kmin(b).contains(h)).toLong
      val eu = estOf(union)
      (a, b, estOf(kmin(a)), estOf(kmin(b)), eu,
        rho * (eu / ku) + (rho * (eu % ku)) / ku)
    }
    val expect = Seq(pairRow("a", "b"), pairRow("a", "c"), pairRow("b", "c"))
      .sortBy(x => (x._1, x._2))
    assert(got === expect)
    // under-k group c reads its exact distinct count
    assert(got.find(r => r._1 == "a" && r._2 == "c").get._4 === 10L)
    // sketch estimates land in a sane band around the truth
    val ab = got.find(r => r._1 == "a" && r._2 == "b").get
    assert(ab._3 > 100L && ab._3 < 400L && ab._5 > 150L && ab._5 < 600L)
    val p1 = Scale.kmvOverlap(df.repartition(1), "g", "v", k)
      .collect().map(_.toString).toSeq
    val p7 = Scale.kmvOverlap(df.repartition(7), "g", "v", k)
      .collect().map(_.toString).toSeq
    assert(p1 === p7)
  }
}
