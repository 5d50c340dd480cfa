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
        |  graft_simhash(array('x','y')) AS sh
        |FROM emb_v ORDER BY vec_id""".stripMargin).collect()
    assert(viaSql.length === 10)
    // selfdot equals the Column-API dot
    val viaCol = Tables.embeddings(spark, sf).limit(10)
      .select($"vec_id", graft.functions.VectorOps.dot($"embedding", $"embedding").as("d"))
      .as[(Long, Double)].collect().toMap
    viaSql.foreach { r =>
      assert(r.getDouble(1) === viaCol(r.getLong(0)))
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
