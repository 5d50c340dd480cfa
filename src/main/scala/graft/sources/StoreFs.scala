package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-`FileSystem` path operations shared by the crash-resumable
  * stores ([[SignatureStore]], `Packing`'s streaming state): every
  * store directory is named by a URI-capable string, so probing and
  * pruning must go through the Hadoop API — `java.io.File` silently
  * works only on the local filesystem and would strand these paths on
  * `hdfs://`/`s3a://`, the deployment target at 100 TB. (The
  * compaction swap already did this; these helpers extend the same
  * discipline to existence probes, listings and retention deletes.) */
private[graft] object StoreFs {

  def fileSystem(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** True iff `dir` holds at least one COMMITTED data file (Spark hides
    * `_`/`.`-prefixed paths, so a crashed write's `_temporary` debris
    * does not count — a store that "exists" but has no committed files
    * must be treated as absent, both for decision correctness and
    * because schema inference on it would fail). */
  def hasCommittedData(spark: SparkSession, dir: String): Boolean = {
    val (fs, p) = fileSystem(spark, dir)
    // Spark's visibility rule: `_`/`.`-prefixed names are hidden UNLESS
    // they contain `=` — a partition directory like `__batch_id=0` is
    // data, `_temporary`/`_SUCCESS` are not
    def visible(n: String): Boolean =
      !(n.startsWith("_") || n.startsWith(".")) || n.contains("=")
    def walk(path: Path): Boolean =
      fs.listStatus(path).exists { st =>
        val n = st.getPath.getName
        visible(n) && (st.isFile || walk(st.getPath))
      }
    fs.exists(p) && walk(p)
  }

  /** Names of `dir`'s immediate children; empty when `dir` is absent. */
  def childNames(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, p) = fileSystem(spark, dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName).toSeq
  }

  /** Recursive delete; no-op when absent. */
  def delete(spark: SparkSession, dir: String): Unit = {
    val (fs, p) = fileSystem(spark, dir)
    fs.delete(p, true)
    ()
  }
}
