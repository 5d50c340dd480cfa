package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing
import graft.functions.TextOps

/** Sequence packing (operators/Packing.scala): the distributed prefix
  * scan must equal a sequential driver fold exactly, must NOT plan a
  * single-partition global window, and must be partition-count
  * independent (the structural form of the 3-vs-8-CPU crosscheck).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("tokenShards == sequential fold; window is partitioned; partition-count independent") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", TextOps.tokenCount($"text").as("tokens"))
    val out = Packing.tokenShards(docs, "doc_id", "tokens", 512)
    val got = out.as[(Long, Int, Long, Int, Int)].collect().sortBy(_._1).toSeq

    val rows = docs.as[(Long, Int)].collect().sortBy(_._1)
    var cum = 0L
    val expected = rows.map { case (id, t) =>
      val before = cum
      cum += t
      (id, t, cum, (before / 512L).toInt, (before % 512L).toInt)
    }.toSeq
    assert(got === expected)
    assert(got.map(_._4).max > 0, "fixture corpus fits one shard — budget too large to test")

    // the running sum must ride a window PARTITIONED by the range
    // bucket — a global orderBy window (one partition for the whole
    // corpus) would show a windowspecdefinition without __pid
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(plan.split("windowspecdefinition")(1).contains("__pid"), plan)

    // output does not depend on the input's partitioning
    for (parts <- Seq(1, 7)) {
      val alt = Packing.tokenShards(docs.repartition(parts), "doc_id", "tokens", 512)
        .as[(Long, Int, Long, Int, Int)].collect().sortBy(_._1).toSeq
      assert(alt === expected, s"diverged at input partition count $parts")
    }
  }

  test("shuffleShards: a reproducible permutation with dense per-shard ranks") {
    import graft.operators.Packing
    val docs = Tables.documents(spark, sf)
    def run() = Packing.shuffleShards(docs, "doc_id", 8)
      .as[(Long, Long, Int, Int)].collect().toSeq
    val got = run()
    // covers every row exactly once
    assert(got.map(_._1).sorted === docs.select($"doc_id").as[Long]
      .collect().sorted.toSeq)
    // reference arithmetic per row
    got.foreach { case (id, key, shard, _) =>
      val k = ((id % (1L << 31)) * 1103515245L + 12345L) % (1L << 31)
      assert(key === k && shard === (k % 8).toInt, s"doc $id")
    }
    // per-shard ranks are dense 1..n and follow the (key, id) order
    got.groupBy(_._3).values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4) === (1 to rows.length))
      assert(sorted.map(r => (r._2, r._1)) === sorted.map(r => (r._2, r._1)).sorted)
    }
    // every shard populated, deterministic across reruns
    assert(got.map(_._3).distinct.sorted === (0 until 8))
    assert(run() === got)
  }

  test("packSequences: hand-planted stream — boundary straddles, digests exact") {
    import graft.operators.Packing
    // token stream 1..9 across three docs at seqLen=4:
    //   seq0 = [1,2,3,4] (docs 1,2), seq1 = [5,6,7,8] (docs 2,3),
    //   seq2 = [9] (doc 3 tail) — docs 2 and 3 straddle boundaries
    val docs = Seq(
      (1L, Seq(1, 2, 3)), (2L, Seq(4, 5)), (3L, Seq(6, 7, 8, 9)),
      (4L, Seq.empty[Int])) // empty doc contributes nothing
      .toDF("doc_id", "toks")
    val got = Packing.packSequences(docs, "doc_id", "toks", 4)
      .orderBy($"seq_id")
      .as[(Long, Long, Long, Int, Int, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 4L, 2L, 1, 4, 1L * 1 + 2 * 2 + 3 * 3 + 4 * 4),
      (1L, 4L, 2L, 5, 8, 1L * 5 + 2 * 6 + 3 * 7 + 4 * 8),
      (2L, 1L, 1L, 9, 9, 9L)))
    // total token conservation: sum of n_tokens == corpus token count
    assert(got.map(_._2).sum === 9L)
  }
}
