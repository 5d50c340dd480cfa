package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pretraining-corpus curation operators beyond the dedup ladder:
  * PII/URL scrubbing, within-document repetition statistics
  * (Gopher/RefinedWeb-style quality signals), benchmark
  * decontamination, and deterministic stratified sampling. All are
  * declarative DataFrame transforms: scrubbing and sampling are pure
  * codegen projections/filters (no shuffle); repetition and
  * decontamination use the explode → equi-join/aggregate formulation
  * that scales the same way the n-gram Jaccard dedup does.
  */
object Curation {

  /** Redaction patterns. RE2-compatible (no backrefs/lookahead) so the
    * same patterns run in Spark (java.util.regex) and DuckDB (RE2)
    * bit-identically — the property the q61 oracle leans on. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern = "https?://[^ ]+"
  val longNumberPattern = "[0-9][0-9 ()+.-]{5,}[0-9]"

  /** Scrub PII-ish spans from `textCol`: emails → <EMAIL>, URLs →
    * <URL>, long number runs (phone-shaped) → <NUM>. Order matters —
    * URLs first so an email-looking userinfo inside a URL does not
    * split it. Pure projection: stays inside whole-stage codegen,
    * nothing shuffles, predicates still push past it. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlPattern, "<URL>"),
        emailPattern, "<EMAIL>"),
      longNumberPattern, "<NUM>")

  /** Within-document repetition statistics (the Gopher quality
    * signals): total words, distinct words, duplicate-word ratio and
    * the frequency share of the single most repeated word. Formulated
    * as explode → two hash aggregations with map-side partial combine
    * — the (doc, word) key space is bounded by the corpus itself, so
    * the shuffle is proportional to input size at any scale. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("__word"))
    words
      .groupBy(col(idCol), col("__word"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__n")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        max(col("__n")).as("__max_freq"))
      .select(
        col(idCol),
        col("n_words"),
        col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_words").cast("double"), 6)
          .as("dup_ratio"),
        round(col("__max_freq").cast("double") / col("n_words").cast("double"), 6)
          .as("top_word_ratio"))
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * one word k-shingle with the benchmark set — the standard
    * eval-leakage guard before pretraining. The benchmark side is
    * SMALL by construction (an eval set), so its distinct shingles
    * broadcast and the corpus side never shuffles: explode → broadcast
    * equi-join → per-doc count. Returns (id, n_shared) for
    * contaminated docs only. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame = {
    def shingled(df: DataFrame, keep: Column*) =
      df.filter(col(textCol).isNotNull)
        .select(keep :+ explode(Dedup.shingles(col(textCol), k)).as("__shingle"): _*)
    val bench = shingled(benchmark).select(col("__shingle")).distinct()
    shingled(corpus, col(idCol))
      .join(broadcast(bench), Seq("__shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Bloom-filter two-phase decontamination — the 100 TB form of
    * [[decontaminate]]. Exact decontamination probes EVERY corpus
    * shingle against the benchmark hash table; at real eval-suite
    * scale (tens of millions of shingles) that table is GBs and every
    * corpus shingle pays a probe. Here the benchmark shingle set is
    * first summarized into a Bloom filter (one aggregation job —
    * `BloomFilterAggregate` merges by bit-OR, so the bytes are
    * partition-order independent), and the corpus side is pruned by a
    * codegen'd `BloomFilterMightContain` INSIDE the scan projection —
    * a bitset test, no join, no shuffle — before the surviving ~fpp
    * fraction plus true hits pay the exact confirm join. The confirm
    * join removes every false positive, so the result is IDENTICAL to
    * [[decontaminate]] (same oracle), while the joined volume drops by
    * ~(1 − fpp) at any corpus size. This is the same mechanism Spark's
    * own runtime row-level filtering injects for shuffle joins,
    * applied deliberately. `expectedItems` sizes the filter;
    * bits = −n·ln(fpp)/ln(2)². By default (≤ 0) the size is DERIVED
    * from the observed benchmark shingle count (one extra count job on
    * the SMALL side — r9 advice: a fixed default silently saturates at
    * real eval-suite scale, fpp → 1, and the prune degrades to a no-op
    * with no signal); an explicit `expectedItems` that the observed
    * cardinality exceeds logs a saturation warning instead. */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int,
      expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    def shingled(df: DataFrame, keep: Column*) =
      df.filter(col(textCol).isNotNull)
        .select(keep :+ explode(Dedup.shingles(col(textCol), k)).as("__shingle"): _*)
    // the benchmark shingle set is SMALL by construction (an eval set)
    // and feeds three consumers — the sizing count, the bloom aggregate
    // and the exact confirm join. Materialize it once; without this the
    // shingle explode+distinct recomputes per consumer (r10 advice).
    val bench = shingled(benchmark).select(col("__shingle")).distinct()
      .localCheckpoint()
    val observed = bench.count()
    val items =
      if (expectedItems > 0L) {
        if (observed > expectedItems)
          org.slf4j.LoggerFactory.getLogger("graft.operators.Curation").warn(
            s"decontaminateBloom: benchmark has $observed distinct shingles " +
              s"> expectedItems=$expectedItems — filter saturated (fpp -> 1), " +
              "the bloom prune is a no-op; results stay exact via the confirm join")
        expectedItems
      } else math.max(64L, observed)
    val numBits = math.max(64L,
      math.ceil(-items * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bloomAgg = new BloomFilterAggregate(
      GraftShims.expression(xxhash64(col("__shingle"))),
      Literal(items), Literal(numBits)).toAggregateExpression()
    val bfBytes = bench.agg(GraftShims.column(bloomAgg).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val mightHit = GraftShims.column(BloomFilterMightContain(
      Literal(bfBytes, BinaryType),
      GraftShims.expression(xxhash64(col("__shingle")))))
    shingled(corpus, col(idCol))
      .filter(mightHit)
      .join(broadcast(bench), Seq("__shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** FUZZY decontamination — the whole-document complement of the
    * shingle-overlap guards above: flag corpus documents that are
    * NEAR-DUPLICATES (exact Jaccard ≥ threshold over word k-shingle
    * sets) of any benchmark document. [[decontaminate]] is the
    * recall-oriented check (one shared shingle flags), which at web
    * scale flags far too much to act on; this is the precision-
    * oriented one — "this training doc IS a lightly-edited copy of an
    * eval item" — the standard fuzzy-contamination pass run before
    * pretraining. Scale shape: MinHash banding makes the candidate
    * stage an equi-join (never |corpus|×|benchmark| pairwise), the
    * benchmark side is an eval set and BROADCASTS in both the band
    * join and the verify rejoin, and only (band, bucket, id) triples
    * flow through the candidate join — shingle payloads rejoin per
    * surviving DISTINCT pair (late materialization, r2 discipline).
    * Defaults are the production LSH regime (0.8, 8×2 bands); the
    * declared q99 pins 16×1-bit bands, where a true pair at j ≥ 0.8
    * escapes banding with probability (1−j)^16 ≤ 6.5e-12 — fixture-
    * exact, spec-checked against the all-pairs definition (the same
    * regime precedent as q48). Returns one row per contaminated
    * corpus doc: (id, n_matches, max_jaccard). */
  def decontaminateFuzzy(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, shingleK: Int = 3,
      nBands: Int = 8, rowsPerBand: Int = 2,
      jaccardThreshold: Double = 0.8): DataFrame = {
    val nHashes = nBands * rowsPerBand
    // corpus side parallelize-first (single-row-group fixture scans
    // give one partition; the shingle/minhash kernels must run wide)
    val corp = corpus.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__cid"), col(textCol))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism,
        col("__cid"))
      .select(col("__cid"), Dedup.shingles(col(textCol), shingleK).as("__csh"))
    val bench = benchmark.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__bid"),
        Dedup.shingles(col(textCol), shingleK).as("__bsh"))
    def banded(df: DataFrame, id: String, sh: String): DataFrame =
      df.withColumn("__sig", Dedup.minhashSignature(col(sh), nHashes))
        .select(col(id), posexplode(transform(
          sequence(lit(0), lit(nBands - 1)),
          b => array_join(
            slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand)), ":")))
          .as(Seq("__band", "__bucket")))
    val candidates = banded(corp, "__cid", "__csh")
      .join(broadcast(banded(bench, "__bid", "__bsh")),
        Seq("__band", "__bucket"))
      .select(col("__cid"), col("__bid")).distinct()
    candidates
      .join(corp, Seq("__cid"))
      .join(broadcast(bench), Seq("__bid"))
      .withColumn("__j", round(Dedup.jaccard(col("__csh"), col("__bsh")), 6))
      .filter(col("__j") >= jaccardThreshold)
      .groupBy(col("__cid"))
      .agg(count(lit(1)).as("n_matches"), max(col("__j")).as("max_jaccard"))
      .select(col("__cid").as(idCol), col("n_matches"), col("max_jaccard"))
  }

  /** Deterministic stratified sampling: per-stratum keep-rates applied
    * through an arithmetic hash of the row id (an LCG step mod 100) —
    * reproducible across engines, partitionings and runs, unlike
    * Bernoulli `sample()`. `rates` maps stratum → keep percentage;
    * rows in strata absent from the map keep `defaultRate`. Pure
    * filter: no shuffle, pushes into the scan. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultRate: Int): DataFrame = {
    val bucket = pmod(col(idCol) * lit(1103515245L) + lit(12345L), lit(100L))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /** Domain mixing to a per-stratum token budget — the step that turns
    * a curated corpus into a training MIXTURE: each stratum (source /
    * domain / language) is down-sampled so its expected token
    * contribution is ≈ `budgetTokens`, strata already under budget pass
    * through whole. The keep rate is derived IN-PLAN: per-stratum token
    * totals (a tiny aggregate) broadcast-join back onto the corpus, so
    * nothing corpus-sized is collected and the filter itself is the
    * same deterministic LCG-percent bucket [[stratifiedSample]] uses
    * (reproducible across engines/partitionings; exact ANSI oracle).
    * Integer arithmetic throughout: rate = min(100, (100·budget) DIV
    * total) — exact at any corpus size; an empty stratum keeps 100. */
  def mixToBudget(df: DataFrame, idCol: String, strataCol: String,
      tokensCol: String, budgetTokens: Long): DataFrame = {
    val totals = df.groupBy(col(strataCol))
      .agg(sum(col(tokensCol)).as("__tot"))
    val rate = when(col("__tot") <= 0L, lit(100L))
      .otherwise(least(lit(100L), expr(s"(100 * ${budgetTokens}L) DIV __tot")))
      .cast("int")
    val bucket = pmod(col(idCol) * lit(1103515245L) + lit(12345L), lit(100L))
    df.join(broadcast(totals), Seq(strataCol))
      .withColumn("rate", rate)
      .filter(bucket < col("rate"))
      .drop("__tot")
  }

  /** Corpus vocabulary: the `k` most frequent whitespace tokens with
    * corpus term frequency and document frequency — the first pass of
    * tokenizer training / coverage analysis. One explode + hash
    * aggregation (tf combines map-side; df is a two-phase distinct
    * aggregate on (term, doc) keys); the top-k plans as TakeOrdered,
    * never a global sort. Order (tf desc, term) is total, so the k-th
    * boundary is deterministic across engines. */
  def vocabulary(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__doc"),
        explode(graft.functions.TextOps.words(col(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("__doc")).as("df"))
      .orderBy(col("tf").desc, col("term"))
      .limit(k)

  /** Per-document average negative log-likelihood under the corpus's
    * own unigram model — the CCNet/KenLM-style perplexity signal for
    * quality filtering, with the corpus itself as the language model
    * (boilerplate-heavy docs score low NLL, noise scores high). Two
    * passes, both linear: unigram counts (hash agg, map-side
    * combined), then an explode→join on term (vocab side is ≪ corpus)
    * plus a per-doc aggregation. Per-token log-probs are rounded to
    * 6 dp and summed as DECIMAL(18,6) — order-independent, so the
    * shuffle layout cannot perturb the score (same discipline as
    * BM25). Returns (`idCol`, n_tokens, avg_nll). */
  def unigramNll(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__doc"),
        explode(graft.functions.TextOps.words(col(textCol))).as("term"))
    val counts = toks.groupBy(col("term")).agg(count(lit(1)).as("__tf"))
    val total = counts.agg(sum(col("__tf")).as("__total"))
    val lp = round(
      log(col("__tf").cast("double") / col("__total").cast("double")),
      6).cast("decimal(18,6)")
    toks.join(counts, "term")
      .crossJoin(broadcast(total))
      .withColumn("__lp", lp)
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_tokens"),
        round(-(sum(col("__lp")).cast("decimal(18,6)").cast("double"))
          / count(lit(1)), 6).as("avg_nll"))
      .select(col("__doc").as(idCol), col("n_tokens"), col("avg_nll"))
  }

  /** Bigram LM scoring with add-one smoothing — the order-sensitive
    * upgrade of [[unigramNll]] (a scrambled document scores the same
    * under a unigram LM; the bigram conditional catches it — the
    * standard "KenLM-style perplexity filter" shape, corpus-self
    * trained like the unigram):
    *   P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1} ·) + V)
    * where c(w_{i-1} ·) is the corpus count of bigrams starting with
    * w_{i-1} and V the corpus unigram vocabulary. Bigram occurrences
    * come from the `WordNgrams` kernel (every occurrence, not the
    * dedup shingle SET); both count tables are vocabulary-bounded
    * aggregates that join back onto the bigram stream (AQE broadcasts
    * them when small). Per-occurrence log-probs round to 6 dp and sum
    * as DECIMAL(18,6) — the order-independent discipline every other
    * scorer uses. Returns (`idCol`, n_bigrams, avg_nll). */
  def bigramNll(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__doc"),
        graft.functions.TextOps.words(col(textCol)).as("__ws"))
    val vocab = base
      .select(explode(col("__ws")).as("term"))
      .agg(countDistinct(col("term")).as("__v"))
    val bigrams = base
      .select(col("__doc"),
        explode(graft.expressions.VectorExpressions.wordNgrams(col("__ws"), 2))
          .as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val c2 = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("__c2"))
    val c1 = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("__c1"))
    val lp = round(
      log((col("__c2") + 1).cast("double") / (col("__c1") + col("__v")).cast("double")),
      6).cast("decimal(18,6)")
    bigrams.join(c2, "bg").join(c1, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp", lp)
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(-(sum(col("__lp")).cast("decimal(18,6)").cast("double"))
          / count(lit(1)), 6).as("avg_nll"))
      .select(col("__doc").as(idCol), col("n_bigrams"), col("avg_nll"))
  }
}
