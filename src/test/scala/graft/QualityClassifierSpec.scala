package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextOps, VectorOps}
import graft.operators.QualityClassifier

/** In-engine logistic-regression trainer (QualityClassifier): planted
  * separable data trains to perfect separation with a monotone loss
  * trace; gradients quantized per row to longs make the trained weights
  * bit-identical under different partition counts (the 3-vs-8
  * crosscheck property, asserted here directly); q89's fixture
  * distillation recovers the keyword weak label. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 256

  private def featurize(texts: Seq[(Long, String, Double)]) =
    texts.toDF("id", "text", "label")
      .select($"id", $"label",
        VectorOps.hashEmbed(TextOps.words($"text"), dim).as("feat"))

  test("separable planted corpus: perfect separation, loss strictly improves") {
    val rows = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "good clean prose with signal words", 1.0)
      else (i, "junk noisy garbage spam tokens here", 0.0)
    }
    val df = featurize(rows)
    val m = QualityClassifier.train(df, "feat", "label", dim, iters = 30, lr = 4.0)
    assert(m.losses.head > m.losses.last)
    assert(m.losses.last < 0.1, s"final loss ${m.losses.last}")
    val scored = df.select($"label",
        QualityClassifier.score($"feat", m).as("s"))
      .as[(Double, Double)].collect()
    scored.foreach { case (y, s) =>
      assert((s >= 0.5) === (y == 1.0), s"label $y scored $s")
    }
  }

  test("trained weights are bit-identical across partition counts") {
    val rows = (0L until 60L).map { i =>
      (i, s"word${i % 7} filler text sample ${if (i % 3 == 0) "spark" else "flat"}",
        if (i % 3 == 0) 1.0 else 0.0)
    }
    def run(parts: Int) = {
      val df = featurize(rows).repartition(parts)
      QualityClassifier.train(df, "feat", "label", dim, iters = 10, lr = 2.0)
    }
    val m3 = run(3)
    val m8 = run(8)
    assert(java.util.Arrays.equals(m3.weights, m8.weights))
    assert(m3.bias === m8.bias)
    assert(m3.losses === m8.losses)
  }

  test("q89 fixture distillation recovers the keyword weak label") {
    val out = SparkEntry.queries("q89_quality_classifier")(spark, sf)
      .as[(Long, Int, Double, Int)].collect()
    assert(out.nonEmpty)
    val acc = out.count(r => r._2 == r._4).toDouble / out.length
    val base = math.max(out.count(_._2 == 1), out.count(_._2 == 0)).toDouble / out.length
    assert(acc > base, s"accuracy $acc vs majority $base")
    assert(acc >= 0.9, s"accuracy $acc")
  }
}
