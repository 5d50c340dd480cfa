package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** In-engine training of a linear (logistic-regression) document
  * classifier over hashed bag-of-words features — the fastText-style
  * quality/domain filter every production pretraining pipeline runs
  * (CCNet, LLaMA data curation: seed a weak rule, distill it into an
  * embedding classifier, score the corpus). Full-batch gradient
  * descent, restated for Spark's execution model:
  *
  *  - The DATA never moves: each round is ONE single-stage job over the
  *    cached (label, features) RDD; only the dim+2 gradient/loss
  *    accumulator leaves the executors (bounded model state, exactly
  *    the kMeans/BpeTrain fan-in shape).
  *  - Determinism across partitionings: per-ROW gradient contributions
  *    are quantized to 1e12-scaled longs BEFORE summation (double
  *    partials are merge-order dependent and fail the 3-vs-8
  *    crosscheck — the Typed-Aggregator trap documented in round 8);
  *    long sums commute, so the trained weights are bit-identical
  *    under any partition count.
  *  - Scoring is a pure codegen projection: the trained weights inline
  *    as plan literals into the same `DotProductD` kernel the
  *    similarity operators use — no broadcast, no join, no UDF.
  *
  * The 1e12 per-row quantum bounds row count at ~9e6 per overflow-free
  * long at |contribution| ≤ 1 (features are L2-normalized); past that,
  * shrink the quantum or tree-aggregate — noted, not needed at any
  * fixture scale.
  */
object QualityClassifier {

  private val Quantum = 1e12
  private val LossQuantum = 1e9

  final case class Model(weights: Array[Double], bias: Double,
      losses: IndexedSeq[Double])

  /** Mean cross-entropy loss trace is part of the model — specs assert
    * monotone improvement without extra jobs. */
  def train(df: DataFrame, featCol: String, labelCol: String, dim: Int,
      iters: Int = 15, lr: Double = 2.0): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val data = df
      .select(col(labelCol).cast("double"), col(featCol).cast("array<double>"))
      .as[(Double, Seq[Double])]
      .rdd.map { case (y, x) => (y, x.toArray) }
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    try {
      val n = data.count().toDouble
      require(n > 0, "empty training set")
      val w = new Array[Double](dim)
      var b = 0.0
      val losses = IndexedSeq.newBuilder[Double]
      var it = 0
      while (it < iters) {
        val wLocal = w.clone()
        val bLocal = b
        val partials = data.mapPartitions { rows =>
          val g = new Array[Long](dim + 2) // [grads, biasGrad, loss]
          rows.foreach { case (y, x) =>
            var z = bLocal
            var j = 0
            while (j < dim) { z += wLocal(j) * x(j); j += 1 }
            val p = 1.0 / (1.0 + math.exp(-z))
            val d = p - y
            j = 0
            while (j < dim) {
              g(j) += math.rint(d * x(j) * Quantum).toLong
              j += 1
            }
            g(dim) += math.rint(d * Quantum).toLong
            val pc = math.min(1.0 - 1e-12, math.max(1e-12, p))
            val loss = -y * math.log(pc) - (1.0 - y) * math.log(1.0 - pc)
            g(dim + 1) += math.rint(loss * LossQuantum).toLong
          }
          Iterator.single(g)
        }.collect()
        val agg = new Array[Long](dim + 2)
        partials.foreach { g =>
          var j = 0
          while (j < agg.length) { agg(j) += g(j); j += 1 }
        }
        var j = 0
        while (j < dim) {
          w(j) -= lr * (agg(j) / Quantum) / n
          j += 1
        }
        b -= lr * (agg(dim) / Quantum) / n
        losses += (agg(dim + 1) / LossQuantum) / n
        it += 1
      }
      Model(w, b, losses.result())
    } finally {
      data.unpersist()
      ()
    }
  }

  /** Score column: sigmoid of the plan-literal margin, 6 dp. */
  def score(featCol: Column, m: Model): Column = {
    val z = VectorOps.dot(featCol.cast("array<double>"),
      array(m.weights.toIndexedSeq.map(lit): _*)) + lit(m.bias)
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }
}
