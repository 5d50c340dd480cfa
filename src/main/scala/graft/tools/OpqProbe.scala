package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage checksums of the OPQ trainer so a
  * partition-dependence regression can be bisected to the exact stage
  * (`runMain graft.tools.OpqProbe <sfDir>` under different
  * SPARK_GRAFT_CPUS — every line must be identical). */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.embeddings(spark, sfDir)
    import graft.operators.{Pq, Similarity}
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    def println(s: String): Unit = { lines += s; Predef.println(s) }

    val (sxx, sx, n) = Pq.liftedMoments(e, "embedding", 64)
    println(s"[opq] n=$n sxxHash=${java.util.Arrays.hashCode(sxx)} " +
      s"sxHash=${java.util.Arrays.hashCode(sx)}")
    val cov = Array.tabulate(64, 64) { (i, j) =>
      (sxx(i * 64 + j).toDouble -
        sx(i).toDouble * sx(j).toDouble / n.toDouble) / n.toDouble
    }
    val (vals, vecs) = Pq.jacobiEigen(cov)
    println(s"[opq] valsHash=${java.util.Arrays.hashCode(vals)} " +
      s"vecsHash=${java.util.Arrays.deepHashCode(vecs.asInstanceOf[Array[AnyRef]])}")
    val rot0 = Pq.allocationRotation(vals, vecs, 64, 8)
    println(s"[opq] rot0Hash=${java.util.Arrays.deepHashCode(rot0.asInstanceOf[Array[AnyRef]])}")
    val books0 = Similarity.kMeansSubspaces(
      e.select(col("vec_id"), Pq.rotateExpr(col("embedding"), rot0).as("__rx")),
      "vec_id", "__rx", 64, 8, 16, 5)
    println(s"[opq] books0Hash=${books0.map(_.map(_.toSeq)).hashCode()}")
    val model0 = Pq.Model(8, 8, books0)
    val cross = Pq.reconstructionCross(e, "embedding", rot0, model0, 64)
    println(s"[opq] crossHash=${java.util.Arrays.hashCode(cross)}")
    val rot1 = Pq.polarRotation(cross, 64)
    println(s"[opq] rot1Hash=${java.util.Arrays.deepHashCode(rot1.asInstanceOf[Array[AnyRef]])}")
    val books1 = Similarity.kMeansSubspaces(
      e.select(col("vec_id"), Pq.rotateExpr(col("embedding"), rot1).as("__rx")),
      "vec_id", "__rx", 64, 8, 16, 5)
    println(s"[opq] books1Hash=${books1.map(_.map(_.toSeq)).hashCode()}")
    graft.SparkEntry.queries("q163_opq_store")(spark, sfDir)
      .collect().foreach(r => println(s"[opq] row $r"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"/tmp/opq_probe_$cpus.txt"),
      lines.mkString("\n").getBytes)
    spark.stop()
  }
}
