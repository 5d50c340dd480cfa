package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, Vamana}

/** Vamana graph ANN (q172). The differential oracle (ExpectedPinSpec +
  * the q172 pin) covers bit-parity with the Python transliteration;
  * this spec covers the operator's own contracts: deterministic
  * partition-independent build, graph invariants (degree bound,
  * within-shard edges, no self-loops, medoid-reachability), exhaustive
  * search == brute force, and a recall floor at the declared probe
  * budget. */
class VamanaSpec extends SparkSpec {

  private val sfd = "/root/testdata/sf0.01"
  private def embs = graft.Tables.embeddings(spark, sfd)
  private val p = Vamana.Params(r = 16, l = 32, alphaNum = 12L,
    alphaDen = 10L, nShards = 4)

  private def graphRows(df: org.apache.spark.sql.DataFrame) =
    df.select("shard", "id", "nbrs", "medoid")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toList,
        r.getBoolean(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("build is deterministic and partition-count independent " +
    "(3 vs 32 input partitions -> identical graph)") {
    val a = graphRows(Vamana.build(embs.repartition(3), "vec_id",
      "embedding", p))
    val b = graphRows(Vamana.build(embs.repartition(32), "vec_id",
      "embedding", p))
    assert(a.nonEmpty && a === b)
  }

  test("graph invariants: out-degree <= R, no self-loops, edges stay " +
    "inside the shard, exactly one medoid per shard, every node " +
    "reachable from its shard medoid") {
    val rows = graphRows(Vamana.build(embs, "vec_id", "embedding", p))
    assert(rows.map(_._1).distinct.sorted === (0 until p.nShards))
    rows.foreach { case (shard, id, nbrs, _) =>
      assert(nbrs.length <= p.r, s"degree bound violated at $id")
      assert(!nbrs.contains(id), s"self-loop at $id")
      assert(nbrs.forall(n => (n % p.nShards) == shard),
        s"cross-shard edge at $id")
      assert(nbrs.distinct.length === nbrs.length, s"dup edge at $id")
    }
    for ((shard, members) <- rows.groupBy(_._1)) {
      val medoids = members.filter(_._4).map(_._2)
      assert(medoids.length === 1, s"shard $shard medoids: $medoids")
      // BFS from the medoid over the directed graph
      val adj = members.map(m => m._2 -> m._3).toMap
      var frontier = Set(medoids.head)
      var seen = frontier
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj).diff(seen)
        seen ++= frontier
      }
      assert(seen.size === members.length,
        s"shard $shard: ${members.length - seen.size} nodes unreachable")
    }
  }

  test("exhaustive search (L >= shard size, mCand >= n) == brute-force " +
    "cosine top-k; declared budget reaches a recall floor") {
    val probe = embs.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
      .map(_.toDouble).toSeq
    val dir = java.nio.file.Files.createTempDirectory("vamana").toString
    Vamana.writeStore(embs, "vec_id", "embedding", dir + "/g", p)

    val brute = Similarity.topKCosine(embs, "embedding", probe, 20,
        "vec_id")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq

    // exhaustive: beam covers the whole shard -> merge == full scan
    val pAll = p.copy(l = 200)
    Vamana.writeStore(embs, "vec_id", "embedding", dir + "/gAll", pAll)
    val exhaustive = Vamana.topK(spark, dir + "/gAll", embs, "vec_id",
        "embedding", probe, pAll, k = 20, mCand = 500)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(exhaustive === brute)

    // declared budget (L=32, mCand=50 of 500 vectors): recall@20 floor.
    // Measured 0.85 on the fixture; pin a safe floor.
    val got = Vamana.topK(spark, dir + "/g", embs, "vec_id", "embedding",
        probe, p, k = 20, mCand = 50)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val recall = brute.count(got.contains).toDouble / brute.size
    assert(recall >= 0.5, s"recall@20 $recall below floor")
  }
}
