package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Exact-integer weighted PageRank: hand-replay, path parity
  * (driver vs distributed loop), partition independence, guards. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // undirected triangle with one heavy edge plus a pendant node:
  // a—b (w 3), b—c (w 1), a—c (w 1), c—d (w 1), symmetrized
  private def edges() = {
    val und = Seq(("a", "b", 3L), ("b", "c", 1L), ("a", "c", 1L),
      ("c", "d", 1L))
    (und ++ und.map { case (x, y, w) => (y, x, w) })
      .toDF("src", "dst", "w")
  }

  /** Exact Long replay of the documented recurrence — independent of
    * the implementation's code paths. */
  private def replay(und: Seq[(String, String, Long)], iters: Int,
      dampingPct: Int): Map[String, Long] = {
    val es = und ++ und.map { case (x, y, w) => (y, x, w) }
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    val outW = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val init = Graph.RankScale / nodes.size
    val base = ((100L - dampingPct) * init) / 100L
    var r = nodes.map(_ -> init).toMap
    for (_ <- 0 until iters) {
      val in = es.groupBy(_._2).map { case (v, ins) =>
        v -> ins.map { case (u, _, w) =>
          (dampingPct * ((r(u) * w) / outW(u))) / 100L
        }.sum
      }
      r = nodes.map(v => v -> (base + in.getOrElse(v, 0L))).toMap
    }
    r
  }

  test("triangleCount: hand-exact counts on K4 + path, canonicalization, partition independence") {
    // K4 on 1-4 (C(3,2)=3 triangles per node, clustering 1.0), a
    // 5-6-7 path (0 triangles; deg-2 node clusters 0.0, deg-1 null);
    // edges arrive in mixed orientation with duplicates and a self-loop
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 2L),
      (3L, 4L), (3L, 4L), (5L, 6L), (7L, 6L), (5L, 5L))
      .toDF("x", "y")
    val got = Graph.triangleCount(edges.repartition(5), "x", "y")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 3L, Some(1.0)), (2L, 3L, 3L, Some(1.0)),
      (3L, 3L, 3L, Some(1.0)), (4L, 3L, 3L, Some(1.0)),
      (5L, 1L, 0L, None), (6L, 2L, 0L, Some(0.0)), (7L, 1L, 0L, None)))
    val p1 = Graph.triangleCount(edges.repartition(1), "x", "y")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(p1 === got)
    // global count over the fixture graph equals the naive closed-walk
    // count (each triangle counted once by the canonical a<b<c chain)
    val pairs = graft.operators.Dedup.simhashNearDups(
      Tables.documents(spark, sf), "doc_id", "text", maxHamming = 3)
      .select($"id_a", $"id_b")
    val e = pairs.select(least($"id_a", $"id_b").as("a"),
      greatest($"id_a", $"id_b").as("b")).distinct().localCheckpoint()
    val naive = e.as("x")
      .join(e.as("y"), col("x.b") === col("y.a"))
      .join(e.as("z"), col("z.a") === col("x.a") && col("z.b") === col("y.b"))
      .count()
    val perNode = Graph.triangleCount(pairs, "id_a", "id_b")
      .agg(sum($"triangles")).as[Long].head()
    assert(perNode === 3L * naive)
  }

  test("pageRank matches the exact Long replay (driver path)") {
    val got = Graph.weightedPageRank(edges(), iters = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = replay(Seq(("a", "b", 3L), ("b", "c", 1L), ("a", "c", 1L),
      ("c", "d", 1L)), 8, 85)
    assert(got == want)
    // the heavy a—b edge concentrates mass on a and b; pendant d lowest
    assert(got("a") > got("c") && got("b") > got("c") && got("c") > got("d"))
  }

  test("distributed loop is bit-identical to the driver path") {
    val e = edges()
    val drv = Graph.weightedPageRank(e, iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val loop = Graph.weightedPageRank(e, iters = 4, collectEdgeLimit = -1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(drv == loop)
  }

  test("partition-count independence (distributed loop)") {
    val e = edges()
    val a = Graph.weightedPageRank(e.repartition(1), iters = 3,
      collectEdgeLimit = -1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Graph.weightedPageRank(e.repartition(7), iters = 3,
      collectEdgeLimit = -1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("mass is conserved on a symmetric graph (no dangling nodes)") {
    val got = Graph.weightedPageRank(edges(), iters = 8)
      .agg(sum(col("rank_scaled"))).as[Long].head()
    // total mass stays within integer-truncation slack of SCALE:
    // each node's rank loses < 1 unit per DIV, 3 DIVs per term
    val n = 4L
    assert(got <= Graph.RankScale && got >= Graph.RankScale - 100L * n)
  }

  test("iters = 0 returns the uniform init; guards reject bad args") {
    val got = Graph.weightedPageRank(edges(), iters = 0)
      .select(col("rank_scaled")).distinct().as[Long].collect().toSeq
    assert(got == Seq(Graph.RankScale / 4))
    intercept[IllegalArgumentException] {
      Graph.weightedPageRank(edges(), iters = -1)
    }
    intercept[IllegalArgumentException] {
      Graph.weightedPageRank(edges(), dampingPct = 101)
    }
  }

  test("null endpoints and non-positive weights are dropped, not ranked") {
    val e = Seq(
      (Some("a"), Some("b"), 1L), (Some("b"), Some("a"), 1L),
      (None, Some("b"), 9L), (Some("a"), None, 9L),
      (Some("a"), Some("z"), 0L))
      .toDF("src", "dst", "w")
    val nodes = Graph.weightedPageRank(e, iters = 2)
      .select(col("node")).as[String].collect().toSet
    assert(nodes == Set("a", "b"))
  }
}
