package graft.tools

import org.apache.spark.sql.SparkSession

/** Row-count probe for scaling attribution (SCALING.md): prints the
  * output cardinality of named declared queries at a fixture dir —
  * distinguishes "the operator got slower" from "the operator's
  * result got bigger" (e.g. q25 on the closed-vocabulary fixtures,
  * where near-dup output is genuinely quadratic).
  *
  * Usage: `runMain graft.tools.CountProbe <sfDir> <name...>`. */
object CountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      try println(s"[count] $name rows=${graft.SparkEntry.queries(name)(spark, sfDir).count()}")
      catch {
        case e: Exception =>
          println(s"[count] $name ERROR: ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
