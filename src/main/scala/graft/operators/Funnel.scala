package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Curation-funnel observability — per-stage survivor/drop counts for a
  * composed pipeline (the q56/q96 noise→lang→quality→dedup chain) as a
  * SIDE CHANNEL of the run that produces the data, never a second scan.
  *
  * The reference prints per-row decode errors and moves on
  * (`src/lib.rs:212,263,314,359` — `filter_map(Result::ok)`); the q94
  * operator made that a single-job observed metric. This makes the
  * pattern first-class for a WHOLE pipeline: every stage boundary gets a
  * `Dataset.observe` row count, all of them materialize from the one
  * job that evaluates the pipeline, and the report answers the question
  * every production curation run asks before promoting a corpus —
  * "which filter killed my data". At 100 TB a per-stage `count()` audit
  * is N extra full passes; this is zero extra passes when attached to
  * the real sink write ([[observed]]) and exactly one when run
  * standalone ([[report]]).
  *
  * Stages are arbitrary `DataFrame => DataFrame` transforms (filters,
  * dedups, joins), so counts reflect each stage's true output
  * cardinality; `n_dropped` is `n_in - n_out` and reads NEGATIVE for a
  * row-increasing stage (explode/flatten) — that sign is information,
  * not an error.
  *
  * Self-join caveat (the q56 near-dup stage): a stage whose transform
  * references its input MORE THAN ONCE (candidate-pair generation
  * joined back against the same frame) must materialize its input once
  * (`localCheckpoint()`) inside the transform — a DAG that re-executes
  * the observed prefix in two branches would double-count every
  * upstream metric. The prefix still evaluates exactly once; the
  * checkpoint job resolves the upstream observations and the remainder
  * resolves at the final action.
  */
object Funnel {

  /** Attach an observation at the funnel input and after every stage.
    * Returns the final frame (write it to the REAL sink — the counts
    * ride that same job) and the ordered (name, observation) list;
    * read `obs.get("n")` after the first action completes. */
  def observed(df: DataFrame, stages: Seq[(String, DataFrame => DataFrame)])
      : (DataFrame, Seq[(String, Observation)]) = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val names = stages.map(_._1)
    require(names.distinct.size == names.size,
      s"stage names must be distinct: ${names.mkString(", ")}")
    // Observation names are per-query unique; the uuid suffix keeps
    // repeated report() calls (bench passes, retries) from colliding.
    val runId = java.util.UUID.randomUUID().toString.take(8)
    def watch(d: DataFrame, name: String): (DataFrame, Observation) = {
      val ob = Observation(s"funnel_${name}_$runId")
      (d.observe(ob, count(lit(1)).as("n")), ob)
    }
    val (in, inObs) = watch(df, "input")
    val (fin, obs) = stages.foldLeft((in, Seq("input" -> inObs))) {
      case ((cur, acc), (name, stage)) =>
        val (next, ob) = watch(stage(cur), name)
        (next, acc :+ (name -> ob))
    }
    (fin, obs)
  }

  /** Run the funnel once and return the bounded report frame — one row
    * per stage: (stage_idx, stage, n_in, n_out, n_dropped). A single
    * `count()` action evaluates the whole observed chain (plus any
    * checkpoint a self-joining stage performs internally — still zero
    * recompute); the report itself is |stages| rows of driver state. */
  def report(df: DataFrame, stages: Seq[(String, DataFrame => DataFrame)])
      : DataFrame = {
    val spark = df.sparkSession
    val (fin, obs) = observed(df, stages)
    fin.count(): Unit // one action; every observation resolves here
    val counts = obs.map { case (name, ob) =>
      // bounded wait instead of a bare blocking get(): if a stage's
      // internal materialization turned out not to fire the query-
      // execution listener the observation rides on, fail loudly
      // instead of hanging the caller forever
      val m =
        try {
          import scala.concurrent.ExecutionContext.Implicits.global
          scala.concurrent.Await.result(
            scala.concurrent.Future(ob.get),
            scala.concurrent.duration.Duration(60, "s"))
        } catch {
          case _: java.util.concurrent.TimeoutException =>
            throw new IllegalStateException(
              s"funnel observation at '$name' never materialized — a " +
                "stage's internal action bypassed the observed plan")
        }
      m("n") match {
        case l: java.lang.Long => l.longValue()
        case x => x.toString.toLong
      }
    }
    val rows = stages.indices.map { i =>
      (i + 1, stages(i)._1, counts(i), counts(i + 1), counts(i) - counts(i + 1))
    }
    import spark.implicits._
    rows.toDF("stage_idx", "stage", "n_in", "n_out", "n_dropped")
      .orderBy(col("stage_idx"))
  }
}
