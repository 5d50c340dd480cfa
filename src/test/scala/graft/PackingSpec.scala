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
}
