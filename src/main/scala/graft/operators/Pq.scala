package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Product quantization (PQ) with asymmetric-distance scoring — the
  * compression step past the int8 store (`VectorStore.writeQuantized`):
  * instead of 1 byte per DIMENSION, each vector stores `m` bytes TOTAL
  * (one codebook index per `dsub`-dim subspace), the standard IVF-PQ
  * building block. Codebooks are trained by the existing distributed
  * Lloyd's loop ([[Similarity.kMeans]]) run per subspace over sliced
  * vectors — deterministic (quantized-long means), bounded driver
  * state (m × k × dsub doubles).
  *
  * Probe-side scoring is classic ADC: the probe precomputes, on the
  * driver, one k-entry table of squared distances per subspace
  * (m × k doubles — model-sized), and every stored vector's
  * approximate squared L2 distance is the SUM of m table lookups on
  * its codes. The tables ride the plan as literals, so the scan side
  * is a pure codegen'd projection — no join, no shuffle, no vector
  * payload read. Exact rerank then fetches only the surviving top-m
  * ids from the system of record, the same late-materialization shape
  * as `topKQuantized`.
  */
object Pq {

  /** Trained PQ model: `codebooks(j)(c)` is the `dsub`-dim centroid
    * `c` of subspace `j`. */
  final case class Model(m: Int, dsub: Int,
      codebooks: IndexedSeq[IndexedSeq[Array[Double]]]) {
    require(codebooks.length == m)
  }

  /** Train per-subspace codebooks on (a sample of) the corpus: for
    * each of the `m` subspaces, run [[Similarity.kMeans]] over the
    * sliced `dsub`-dim sub-vectors. Sequential over subspaces (m is
    * small, each pass is a full distributed Lloyd's loop). */
  def train(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int = 8, k: Int = 16, maxIter: Int = 5): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    // ONE joint loop for all m subspaces (1 job/iteration) instead of m
    // independent kMeans loops (m×maxIter jobs over the same rows) —
    // bit-identical codebooks, ~m× less driver-synchronous stage churn
    // on the cold store-build path (see kMeansSubspaces scaladoc)
    val books = Similarity.kMeansSubspaces(df, idCol, vecCol, dim, m, k,
      maxIter)
    Model(m, dsub, books)
  }

  /** PQ encoding column: `array<tinyint>` of `m` codebook indices —
    * per subspace, the argmin-distance centroid via the same
    * plan-literal [[Similarity.assignExpr]] the k-means loop uses
    * (codegen'd map, no join). */
  def encodeExpr(vecCol: Column, model: Model): Column =
    array(model.codebooks.zipWithIndex.map { case (book, j) =>
      Similarity.assignExpr(
        slice(vecCol, j * model.dsub + 1, model.dsub), book).cast("byte")
    }: _*)

  /** ADC approximate squared-L2 distance of stored codes to `probe`:
    * Σ_j lut_j(codes(j)) where lut_j(c) = ‖probe_j − codebook_j(c)‖²,
    * computed once on the driver and inlined as m k-entry literal
    * arrays. Left-fold sum in subspace order, rounded to 6 dp —
    * deterministic. */
  def adcDistExpr(codesCol: Column, probe: Seq[Double], model: Model): Column = {
    val luts = model.codebooks.zipWithIndex.map { case (book, j) =>
      book.map { cent =>
        var s = 0.0
        var i = 0
        while (i < model.dsub) {
          val d = probe(j * model.dsub + i) - cent(i)
          s += d * d
          i += 1
        }
        s
      }
    }
    val terms = luts.zipWithIndex.map { case (lut, j) =>
      element_at(typedlit(lut.toIndexedSeq),
        codesCol.getItem(j).cast("int") + 1)
    }
    round(terms.reduceLeft(_ + _), 6)
  }

  /** Write the corpus PQ-encoded, partitionBy the same hyperplane-LSH
    * bucket as the full-precision/int8 stores (bucket computed from the
    * ORIGINAL vector → identical pruning behavior; m bytes of codes per
    * row instead of `dim`). */
  def writeStore(df: DataFrame, idCol: String, vecCol: String, path: String,
      model: Model, nBits: Int = 4): Unit =
    df.select(col(idCol),
        graft.sources.VectorStore.bucketOf(col(vecCol), nBits).as("bucket"),
        encodeExpr(col(vecCol), model).as("codes"))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)

  /** Pruned-probe approximate top-`mCand` by ADC distance (ascending;
    * ties break to the lowest id). */
  def topKApprox(spark: SparkSession, path: String, idCol: String,
      probe: Seq[Double], model: Model, mCand: Int,
      nBits: Int = 4): DataFrame =
    graft.sources.VectorStore
      .readCandidates(spark, path,
        graft.sources.VectorStore.probeBuckets(spark, probe, nBits))
      .select(col(idCol), adcDistExpr(col("codes"), probe, model).as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(mCand)

  // --- IVF-PQ: trained coarse cells as the partition key -------------

  /** The probe's `nProbe` nearest coarse cells — pure driver math over
    * model state (nList × dim doubles), no Spark job; ties break to the
    * lowest cell id, mirroring `Similarity.assignExpr`. */
  def probeCells(probe: Seq[Double], centroids: Seq[Array[Double]],
      nProbe: Int): Seq[Int] =
    centroids.zipWithIndex.map { case (c, i) =>
      var s = 0.0
      var j = 0
      while (j < c.length) { val d = probe(j) - c(j); s += d * d; j += 1 }
      (s, i)
    }.sortBy(t => (t._1, t._2)).take(nProbe).map(_._2)

  /** Write the corpus as a full IVF-PQ index: partitioned by TRAINED
    * coarse cell (the [[Similarity.kMeans]] centroids q78 trains —
    * measured 0.84 recall@5 vs the hyperplane buckets' 0.44 at equal
    * probe cost on the fixtures) with `m` PQ code bytes per row. The
    * standard billion-scale ANN layout: the coarse quantizer prunes
    * DIRECTORIES at plan time, the codes score what remains, exact
    * vectors are fetched only per surviving id. */
  def writeStoreIvf(df: DataFrame, idCol: String, vecCol: String,
      path: String, model: Model, centroids: Seq[Array[Double]]): Unit =
    df.select(col(idCol),
        Similarity.assignExpr(col(vecCol), centroids).as("cell"),
        encodeExpr(col(vecCol), model).as("codes"))
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  /** Incremental IVF-PQ index maintenance: append a (micro-)batch —
    * same cells, same codebooks, new files inside the existing cell
    * directories (the posture of `VectorStore.append`); run
    * `VectorStore.compact(spark, path, nBits, partCol = "cell")`
    * periodically to restore one file per cell. The MODEL is frozen at
    * train time — the standard IVF-PQ operating regime (retrain +
    * rebuild is an offline operation, not an append). */
  def appendIvf(df: DataFrame, idCol: String, vecCol: String,
      path: String, model: Model, centroids: Seq[Array[Double]]): Unit =
    df.select(col(idCol),
        Similarity.assignExpr(col(vecCol), centroids).as("cell"),
        encodeExpr(col(vecCol), model).as("codes"))
      .write.partitionBy("cell").mode("append").parquet(path)

  /** IVF-PQ probe: read ONLY the `nProbe` nearest cell directories
    * (Catalyst `PartitionFilters` — spec-guarded), ADC-score their
    * codes, exact-rerank the surviving `mCand` ids from `source`. With
    * nProbe = nList and mCand ≥ corpus this EQUALS the exact
    * brute-force top-k (spec-asserted) — the only approximations are
    * probing fewer cells and trusting the codes for candidate order. */
  def topKIvf(spark: SparkSession, path: String, source: DataFrame,
      idCol: String, vecCol: String, probe: Seq[Double], model: Model,
      centroids: Seq[Array[Double]], k: Int, mCand: Int,
      nProbe: Int): DataFrame = {
    val cells = probeCells(probe, centroids, nProbe)
    val probeCol = array(probe.map(lit): _*)
    spark.read.parquet(path)
      .filter(col("cell").isin(cells: _*))
      .select(col(idCol), adcDistExpr(col("codes"), probe, model).as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(mCand)
      .join(source.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol), VectorOps.cosine6(col(vecCol), probeCol).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  // --- residual IVF-PQ (the Jégou et al. recipe) ---------------------

  /** Residual of a vector against its nearest coarse centroid —
    * v − c(cell(v)), computed in-plan: the cell comes from the same
    * plan-literal argmin the index uses, the centroid matrix rides as
    * one typedlit, and zip_with does the element-wise subtract. The
    * zip_with is interpreted (HOF), but it runs ONCE per row per
    * training/encode pass, never inside the probe's hot scoring path
    * (probes subtract on the driver). */
  def residualExpr(vecCol: Column, centroids: Seq[Array[Double]]): Column = {
    val cell = Similarity.assignExpr(vecCol, centroids)
    val centLit = typedlit(centroids.map(_.toIndexedSeq).toIndexedSeq)
    zip_with(vecCol.cast("array<double>"), element_at(centLit, cell + 1),
      (a, b) => a - b)
  }

  /** Train PQ codebooks on coarse-cell RESIDUALS — the actual IVF-PQ
    * recipe: the coarse centroid absorbs the vector's location, so the
    * codebooks only have to cover the (much smaller) residual cloud,
    * and the same m×k budget buys a finer quantization grid. One
    * shared residual codebook set across cells (standard; per-cell
    * books would be nList× the model state for marginal gain). */
  def trainResidual(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Array[Double]], dim: Int, m: Int = 8, k: Int = 16,
      maxIter: Int = 5): Model = {
    val resid = df.select(col(idCol),
      residualExpr(col(vecCol), centroids).as("__res"))
    train(resid, idCol, "__res", dim, m, k, maxIter)
  }

  /** IVF-PQ store with residual codes: partitioned by the trained
    * coarse cell, each row carrying the PQ codes of its RESIDUAL. */
  def writeStoreIvfResidual(df: DataFrame, idCol: String, vecCol: String,
      path: String, model: Model, centroids: Seq[Array[Double]]): Unit =
    df.select(col(idCol),
        Similarity.assignExpr(col(vecCol), centroids).as("cell"),
        encodeExpr(residualExpr(col(vecCol), centroids), model).as("codes"))
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  /** The scoring stage of [[topKIvfResidual]] (no rerank/limit):
    * per-cell single-directory scans, each with its own literal ADC
    * tables, unioned. Exposed so specs can measure ADC error. */
  def topKIvfResidualAdc(spark: SparkSession, path: String, idCol: String,
      probe: Seq[Double], model: Model, centroids: Seq[Array[Double]],
      nProbe: Int): DataFrame = {
    val cells = probeCells(probe, centroids, nProbe)
    cells.map { c =>
      val pres = probe.zip(centroids(c).toIndexedSeq)
        .map { case (p, ce) => p - ce }
      spark.read.parquet(path)
        .filter(col("cell") === c)
        .select(col(idCol), adcDistExpr(col("codes"), pres, model).as("adc_dist"))
    }.reduce(_.union(_))
  }

  /** Residual IVF-PQ probe: each probed cell scans with its OWN ADC
    * tables, built from the probe's residual against THAT cell's
    * centroid (driver math — the tables differ per cell, which is the
    * price of residual encoding and why classic implementations
    * precompute them per probe exactly like this). Each branch is a
    * single-directory scan (`cell = c` prunes at plan time) with its
    * literal tables; branches union, the global top-`mCand` by ADC
    * distance reranks exactly from `source`. With nProbe = nList and
    * mCand ≥ corpus this equals the brute-force top-k. */
  def topKIvfResidual(spark: SparkSession, path: String, source: DataFrame,
      idCol: String, vecCol: String, probe: Seq[Double], model: Model,
      centroids: Seq[Array[Double]], k: Int, mCand: Int,
      nProbe: Int): DataFrame = {
    val probeCol = array(probe.map(lit): _*)
    topKIvfResidualAdc(spark, path, idCol, probe, model, centroids, nProbe)
      .orderBy(col("adc_dist"), col(idCol))
      .limit(mCand)
      .join(source.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol), VectorOps.cosine6(col(vecCol), probeCol).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** ADC probe with exact rerank: the PQ store is what gets scanned;
    * only the surviving `mCand` ids fetch their full-precision vectors
    * from `source` for the exact cosine top-`k`. With mCand ≥ the
    * candidate-set size this EQUALS the full-precision probe
    * (spec-asserted); smaller mCand trades recall for fetch volume
    * against the PQ quantization error. */
  def topK(spark: SparkSession, path: String, source: DataFrame,
      idCol: String, vecCol: String, probe: Seq[Double], model: Model,
      k: Int, mCand: Int, nBits: Int = 4): DataFrame = {
    val probeCol = array(probe.map(lit): _*)
    topKApprox(spark, path, idCol, probe, model, mCand, nBits)
      .join(source.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol), VectorOps.cosine6(col(vecCol), probeCol).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
