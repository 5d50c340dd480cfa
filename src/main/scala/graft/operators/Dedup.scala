package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextOps

/** Deduplication operators for the training-data pipeline surface. The
  * reference has NO dedup at all — re-running ingest re-inserts every
  * row (no unique key, `src/rag/sqlx.rs:34-45`, SURVEY §2.8 ST7) — so
  * this module supplies the standard ladder: exact → MinHash/LSH →
  * SimHash → n-gram Jaccard, each a declarative plan that shuffles on
  * content-derived keys (never collects to the driver).
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical text. A window
    * over `hash-partition(text)` — the deterministic version of
    * `dropDuplicates` (which keeps an arbitrary row). Map-side the text
    * can be pre-hashed (sha2) so the shuffle key is 32 bytes, not the
    * document — at 100 TB shuffle bytes are the bottleneck, so we group
    * by digest, not body. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Word k-shingles (k-grams joined with spaces), distinct. */
  def shingles(text: Column, k: Int): Column = {
    val ws = TextOps.words(text)
    array_distinct(
      when(size(ws) < k, array(array_join(ws, " ")))
        .otherwise(transform(
          sequence(lit(0), size(ws) - k),
          i => array_join(slice(ws, i + 1, lit(k)), " "))))
  }

  /** MinHash signature: for each of `nHashes` permutations, the min of
    * murmur3(shingle, seed=perm) over the document's shingle set.
    * Deterministic (murmur3 is seed-stable across JVMs/runs). */
  def minhashSignature(shingleCol: Column, nHashes: Int): Column =
    transform(
      sequence(lit(0), lit(nHashes - 1)),
      p => array_min(transform(shingleCol, s => hash(s, p))))

  /** MinHash + LSH banding near-dup candidates: split the signature
    * into `nBands` bands of `rowsPerBand`; documents sharing any band
    * value are candidates; candidates are verified with exact Jaccard
    * over shingle sets. The band equi-join is the scale path — the
    * all-pairs comparison never materializes. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, nBands: Int = 8, rowsPerBand: Int = 2,
      jaccardThreshold: Double = 0.8): DataFrame = {
    val nHashes = nBands * rowsPerBand
    val withSig = df.select(
      col(idCol).as("doc"),
      shingles(col(textCol), shingleK).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), nHashes))
    val banded = withSig.select(
      col("doc"), col("sh"),
      posexplode(transform(
        sequence(lit(0), lit(nBands - 1)),
        b => array_join(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), ":")))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("doc").as("id_a"), col("sh").as("__sha"))
    val b = banded.select(col("band"), col("bucket"), col("doc").as("id_b"), col("sh").as("__shb"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", jaccard(col("__sha"), col("__shb")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact Jaccard over two DISTINCT element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0.0, lit(1.0)).otherwise(inter / union)
  }

  /** SimHash: 32-bit signature — bit i is the sign of the sum over
    * distinct words of ±1 votes, where word w votes by the sign of
    * murmur3(w, seed=i) (an independent hash per bit position — the
    * dynamic-shift-free formulation). Deterministic, built-ins only,
    * MSB-first accumulation via acc*2+bit. */
  def simhash(text: Column, bits: Int = 32): Column = {
    val ws = array_distinct(TextOps.words(text))
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, i) => {
        val votes = aggregate(ws, lit(0),
          (v, w) => v + when(hash(w, i) >= 0, 1).otherwise(-1))
        acc * 2 + when(votes > 0, lit(1L)).otherwise(lit(0L))
      })
  }

  /** Hamming distance between two simhash signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within `maxHamming` — exact-hamming verify
    * over band-bucketed candidates (4 bands × 8 bits: by pigeonhole a
    * pair within hamming<=3 agrees exactly on at least one band, so
    * banding loses nothing at the default threshold). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("doc"), simhash(col(textCol)).as("sig"))
    val bandsArr = array((0 until 4).map(b =>
      shiftright(col("sig"), 8 * b).bitwiseAND(lit(0xFFL))): _*)
    val banded = sigs.select(col("doc"), col("sig"),
      posexplode(bandsArr).as(Seq("band", "half")))
    val a = banded.select(col("band"), col("half"), col("doc").as("id_a"), col("sig").as("__siga"))
    val b = banded.select(col("band"), col("half"), col("doc").as("id_b"), col("sig").as("__sigb"))
    a.join(b, Seq("band", "half"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming(col("__siga"), col("__sigb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard similarity for all same-group pairs — the
    * oracle-expressible near-dup variant (group key bounds the
    * quadratic term; at scale the group is an LSH bucket). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, k: Int, threshold: Double): DataFrame = {
    val base = df.select(col(groupCol).as("grp"), col(idCol).as("doc"),
      shingles(col(textCol), k).as("sh"))
    val a = base.select(col("grp"), col("doc").as("id_a"), col("sh").as("__sha"))
    val b = base.select(col("grp"), col("doc").as("id_b"), col("sh").as("__shb"))
    a.join(b, Seq("grp"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", round(jaccard(col("__sha"), col("__shb")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("grp"), col("id_a"), col("id_b"), col("jaccard"))
  }
}
