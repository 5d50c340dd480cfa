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
}
