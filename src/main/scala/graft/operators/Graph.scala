package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Graph analytics over edge lists — the curation-signal companions to
  * `Dedup.connectedComponents`. Where CC answers "which docs are the
  * same", PageRank answers "which nodes sit at the center of the
  * duplication/link structure" — at corpus scale the standard crawl /
  * syndication-hub ranking signal.
  *
  * Reference scope note: the reference engine has no graph surface at
  * all (its only read is `SELECT *`, `/root/reference/src/rag/sqlx.rs:84-92`);
  * this family exists for the large-scale training-data pipeline the
  * brief asks for.
  */
object Graph {

  /** Rank mass is carried as a 1e12-scaled BIGINT so every engine and
    * every partitioning produces the same bits. */
  val RankScale: Long = 1000000000000L

  /** Weighted PageRank over a directed edge list, in EXACT integer
    * arithmetic — partition-count/merge-order independent AND
    * bit-replayable in ANSI SQL (DuckDB `//` == Spark `DIV` on
    * non-negative BIGINTs), the same determinism discipline as the
    * scaled-long k-means (`CentroidScaledAggregator`) and the LCG
    * decisions (q102/q103).
    *
    * Nodes are the distinct edge endpoints (edge-induced subgraph).
    * With `SCALE = 1e12`, `N` = node count, `d` = dampingPct:
    * {{{
    *   r_0(v)     = SCALE DIV N
    *   base       = ((100 - d) * (SCALE DIV N)) DIV 100
    *   r_{k+1}(v) = base + Σ_{(u,v,w)∈E} (d * ((r_k(u) * w) DIV W(u))) DIV 100
    * }}}
    * where `W(u)` is u's total out-weight. A fixed iteration budget
    * (no convergence test) keeps the cost and the answer deterministic
    * — the q74 k-means discipline. Dangling nodes (no out-edges) leak
    * their damped mass by design, the standard simplification; feed a
    * symmetrized edge list (as [[graft.SparkEntry]] q120 does) when
    * mass conservation matters.
    *
    * Scale shape: one `groupBy(src)` for out-weights, then per
    * iteration one equi-join of the (node, rank) frame onto the
    * checkpointed edge list and one map-side-combinable `groupBy(dst)`
    * sum — the rank frame is node-bounded, never edge-bounded, and the
    * edge plan is computed once (`localCheckpoint`, the q65 lesson:
    * exchange reuse does not span AQE union branches or loop rounds).
    * Following the `connectedComponents` precedent, an edge list that
    * materializes ≤ `collectEdgeLimit` rows is collected and iterated
    * on the driver with identical Long arithmetic (integer sums
    * commute — bit-identical to the loop by construction, spec-pinned),
    * then broadcast back; a web-scale edge list takes the loop
    * unchanged with `collectEdgeLimit = -1` semantics available.
    *
    * Overflow posture: `r·w` must stay below 2^63 — with rank mass
    * ≤ SCALE that bounds single-edge weights at ~9.2e6. ANSI mode
    * makes a violation a loud ArithmeticException, never a silent
    * wrap; re-scale weights upstream if a corpus exceeds it.
    *
    * Returns one row per node: (`node`, `rank_scaled` BIGINT,
    * `pagerank` = scaled/1e12 rounded to 6 dp). */
  /** Exact triangle counting over an undirected edge list — the local
    * cohesion signal completing the graph family (CC: "same", PageRank:
    * "central", triangles/clustering: "how clique-like is a node's
    * neighborhood" — on a near-dup graph high clustering separates
    * template FAMILIES from chains of pairwise-similar drift).
    *
    * The plan is the standard degree-ordered wedge join: orient every
    * edge from its lower (degree, id) endpoint to the higher, join a
    * node's out-neighbors pairwise (each wedge generated once, ordered
    * by the same key), close each wedge against the oriented edge set.
    * Orientation is the load-bearing scale device: a node's out-degree
    * is bounded by ~√(2·|E|) (a hub's edges orient INTO it), so the
    * wedge volume is Σ outdeg² = O(|E|^1.5) instead of Σ deg² — the
    * hub that would explode a naive neighbor self-join contributes
    * nothing to it. Every join is an equi-join on node keys; the edge
    * and oriented frames are localCheckpoint'ed once each (r11:
    * exchange reuse does not span their multiple consumers).
    *
    * Returns one row per node of the edge-induced graph:
    * (node, degree, triangles, clustering) where clustering =
    * 2·t/(deg·(deg−1)) at 6 dp, null below degree 2 — all counts
    * exact integers, fully ANSI-replayable. */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val e = edges.select(
      least(col(srcCol), col(dstCol)).as("__a"),
      greatest(col(srcCol), col(dstCol)).as("__b"))
      .filter(col("__a") =!= col("__b") && col("__a").isNotNull)
      .distinct()
      .localCheckpoint()
    val deg = e.select(col("__a").as("__v"))
      .unionByName(e.select(col("__b").as("__v")))
      .groupBy(col("__v")).agg(count(lit(1)).as("__deg"))
    val withDeg = e
      .join(deg.select(col("__v").as("__a"), col("__deg").as("__da")),
        Seq("__a"))
      .join(deg.select(col("__v").as("__b"), col("__deg").as("__db")),
        Seq("__b"))
    val aKey = struct(col("__da"), col("__a"))
    val bKey = struct(col("__db"), col("__b"))
    val o = withDeg.select(
      when(aKey < bKey, col("__a")).otherwise(col("__b")).as("__u"),
      when(aKey < bKey, col("__b")).otherwise(col("__a")).as("__w"),
      when(aKey < bKey, col("__db")).otherwise(col("__da")).as("__wdeg"))
      .localCheckpoint()
    val wedges = o.select(col("__u"), col("__w").as("__v1"),
        col("__wdeg").as("__k1"))
      .join(o.select(col("__u"), col("__w").as("__v2"),
        col("__wdeg").as("__k2")), Seq("__u"))
      .filter(struct(col("__k1"), col("__v1"))
        < struct(col("__k2"), col("__v2")))
    val tri = wedges
      .join(o.select(col("__u").as("__v1"), col("__w").as("__v2")),
        Seq("__v1", "__v2"))
      .select(col("__u"), col("__v1"), col("__v2"))
    val perNode = tri
      .select(explode(array(col("__u"), col("__v1"), col("__v2")))
        .as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("__v"), "left")
      .select(col("__v").as("node"), col("__deg").as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        round(when(col("__deg") >= 2,
          (coalesce(col("triangles"), lit(0L)) * 2).cast("double")
            / (col("__deg") * (col("__deg") - 1)).cast("double")), 6)
          .as("clustering"))
      .orderBy(col("node"))
  }

  def weightedPageRank(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", wCol: String = "w", iters: Int = 8,
      dampingPct: Int = 85, collectEdgeLimit: Long = 1000000L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")
    val spark = edges.sparkSession
    // materialize the edge plan ONCE before anything loops over it
    val e = edges
      .select(col(srcCol).as("pr_src"), col(dstCol).as("pr_dst"),
        col(wCol).cast("long").as("pr_w"))
      .where(col("pr_src").isNotNull && col("pr_dst").isNotNull &&
        col("pr_w") > 0L)
      .localCheckpoint()
    // count() on the eager checkpoint reads cached block sizes
    if (collectEdgeLimit >= 0 && e.count() <= collectEdgeLimit)
      return prViaDriver(e, iters, dampingPct)
    val outW = e.groupBy(col("pr_src"))
      .agg(sum(col("pr_w")).as("pr_ow"))
    // fold the out-weight onto each edge once, outside the loop
    val ew = e.join(outW, "pr_src").localCheckpoint()
    val nodes = ew.select(col("pr_src").as("pr_node"))
      .union(ew.select(col("pr_dst").as("pr_node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    if (n == 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(
          StructField("node", edges.schema(srcCol).dataType),
          StructField("rank_scaled", LongType, nullable = false))))
        .withColumn("pagerank", round(col("rank_scaled") / lit(1e12), 6))
    val init = RankScale / n
    val base = ((100L - dampingPct) * init) / 100L
    var ranks = nodes.select(col("pr_node"), lit(init).as("pr_r"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val contribs = ew.join(ranks, ew("pr_src") === ranks("pr_node"))
        .select(col("pr_dst").as("pr_node"),
          expr(s"($dampingPct * ((pr_r * pr_w) DIV pr_ow)) DIV 100")
            .as("pr_c"))
        .groupBy(col("pr_node")).agg(sum(col("pr_c")).as("pr_in"))
      ranks = nodes.join(contribs, Seq("pr_node"), "left")
        .select(col("pr_node"),
          (lit(base) + coalesce(col("pr_in"), lit(0L))).as("pr_r"))
        .localCheckpoint()
      it += 1
    }
    ranks.select(col("pr_node").as("node"),
      col("pr_r").as("rank_scaled"),
      round(col("pr_r").cast("double") / lit(1e12), 6).as("pagerank"))
  }

  /** Small-graph path: the collected edge list iterated on the driver
    * with the SAME Long arithmetic (integer sums are order-independent,
    * so accumulation order cannot diverge from the distributed
    * groupBy). Node values round-trip as-is — any key type with value
    * equality (strings, longs) works. */
  private def prViaDriver(e: DataFrame, iters: Int, dampingPct: Int)
      : DataFrame = {
    val spark = e.sparkSession
    val rows = e.collect()
    val outW = new java.util.HashMap[Any, java.lang.Long]()
    rows.foreach { r =>
      val w = r.getLong(2)
      val prev = outW.get(r.get(0))
      outW.put(r.get(0), if (prev == null) w else prev.longValue() + w)
    }
    import scala.jdk.CollectionConverters._
    val nodeSet = new java.util.LinkedHashSet[Any]()
    rows.foreach { r => nodeSet.add(r.get(0)); nodeSet.add(r.get(1)) }
    val nodes = nodeSet.asScala.toSeq
    val n = nodes.size.toLong
    val nodeType = e.schema("pr_src").dataType
    val outSchema = StructType(Seq(
      StructField("node", nodeType),
      StructField("rank_scaled", LongType, nullable = false)))
    if (n == 0)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
        .withColumn("pagerank", round(col("rank_scaled") / lit(1e12), 6))
    val init = RankScale / n
    val base = ((100L - dampingPct) * init) / 100L
    var ranks = new java.util.HashMap[Any, java.lang.Long]()
    nodes.foreach(v => ranks.put(v, init))
    var it = 0
    while (it < iters) {
      val next = new java.util.HashMap[Any, java.lang.Long]()
      nodes.foreach(v => next.put(v, base))
      rows.foreach { r =>
        val u = r.get(0); val v = r.get(1); val w = r.getLong(2)
        // boxed get — a missing key must fail loudly, never unbox to 0
        val ru: java.lang.Long = ranks.get(u)
        require(ru != null, s"pagerank: node $u missing from rank map")
        val wu: java.lang.Long = outW.get(u)
        // multiplyExact: the distributed path throws under ANSI on the
        // same overflow — the driver path must not silently wrap instead
        val c = (dampingPct * (Math.multiplyExact(ru.longValue(), w) /
          wu.longValue())) / 100L
        next.put(v, Math.addExact(next.get(v).longValue(), c))
      }
      ranks = next
      it += 1
    }
    val out = nodes.map(v => Row(v, ranks.get(v).longValue()))
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), outSchema)
      .withColumn("pagerank", round(col("rank_scaled") / lit(1e12), 6))
  }
}
