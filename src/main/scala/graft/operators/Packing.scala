package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for pretraining: concatenate the corpus in a total
  * document order and cut it into fixed token-budget training shards —
  * the bookkeeping step between a curated corpus and a tokenized
  * training run (each document learns which shard it starts in and at
  * which token offset; a document may straddle a boundary, exactly as
  * concatenate-then-split pretraining does).
  *
  * The core is a GLOBAL running token total in `idCol` order — the
  * textbook place a naive plan collapses to a single-partition window
  * (`Window.orderBy` with no partitioning moves the whole corpus
  * through ONE task). Scale-correct shape instead: the classic
  * two-phase distributed prefix scan —
  *   1. range-partition by the order key (so partition i holds a
  *      contiguous id range, n ≈ cores partitions),
  *   2. per-partition token sums → driver (n longs — bounded model
  *      state, never corpus-sized),
  *   3. prefix-sum those n values on the driver and broadcast them
  *      back as a plan literal; each row's global total = its
  *      WITHIN-partition running sum (a window PARTITIONED by the
  *      range bucket — parallel) + its partition's prefix offset.
  * The output is partition-count independent (the global cumsum in id
  * order does not depend on where the range bounds fall), so the
  * 3-vs-8-CPU crosscheck holds structurally.
  */
object Packing {

  /** (idCol, tokensCol) → + cum_tokens (inclusive running total in
    * idCol order), shard (0-based index of the `budget`-token training
    * shard this document STARTS in), shard_offset (token offset of the
    * document's first token within that shard). Integer-exact: shard =
    * (cum - tokens) div budget, offset = (cum - tokens) mod budget. */
  def tokenShards(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    // materialize the range partitioning once: the partial-sum job and
    // the final pass must see the SAME row→partition assignment
    val base = df.select(col(idCol), col(tokensCol))
      .repartitionByRange(n, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val partials = base.groupBy(col("__pid"))
      .agg(sum(col(tokensCol)).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (partials.isEmpty) 0 else partials.keys.max
    val prefix: Map[Int, Long] = (0 to maxPid)
      .scanLeft(0L)((acc, p) => acc + partials.getOrElse(p, 0L))
      .dropRight(1)
      .zipWithIndex.map { case (s, p) => p -> s }.toMap
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
    // integral DIV/pmod keep the arithmetic exact at any corpus size
    // (a double division would lose exactness past 2^53 total tokens)
    base
      .withColumn("cum_tokens",
        sum(col(tokensCol)).over(w) + element_at(typedlit(prefix), col("__pid")))
      .select(col(idCol), col(tokensCol),
        col("cum_tokens"),
        expr(s"CAST((cum_tokens - $tokensCol) DIV $budget AS INT)").as("shard"),
        pmod(col("cum_tokens") - col(tokensCol), lit(budget)).cast("int")
          .as("shard_offset"))
  }

  /** The MATERIALIZATION step past [[tokenShards]]' bookkeeping (r10):
    * cut the concatenated token-id stream into fixed `seqLen`-token
    * training sequences — concatenate-then-split pretraining rows,
    * documents straddling boundaries exactly as a real run packs them —
    * and emit one integer-exact DIGEST row per sequence (the driver
    * comparator needs scalars; raw packed arrays are a spec concern):
    * (seq_id, n_tokens, n_docs spanned, first/last token id,
    * checksum = Σ (pos_in_seq+1)·token — position-weighted, so any
    * reorder or off-by-one shows).
    *
    * Scale shape: doc start offsets come from the same two-phase
    * distributed prefix scan as [[tokenShards]] (bounded driver state),
    * the token arrays join back BY ID (one hash shuffle — the payload
    * never rides the prefix machinery), and the per-sequence digest is
    * a map-side-combinable `groupBy(seq_id)` aggregate: min_by/max_by
    * on the unique global position, exact long sums. No window touches
    * the exploded token stream and nothing corpus-sized reaches the
    * driver. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Long): DataFrame = {
    val counted = df.select(col(idCol), col(tokensCol))
      .withColumn("__n", size(col(tokensCol)).cast("long"))
    val starts = tokenShards(counted.select(col(idCol), col("__n")),
        idCol, "__n", seqLen)
      .select(col(idCol), (col("cum_tokens") - col("__n")).as("__start"))
    counted.join(starts, Seq(idCol))
      .select(col(idCol), col("__start"),
        posexplode(col(tokensCol)).as(Seq("__ord", "__tok")))
      .withColumn("__gpos", col("__start") + col("__ord"))
      .withColumn("seq_id", expr(s"__gpos DIV $seqLen"))
      .withColumn("__pos", pmod(col("__gpos"), lit(seqLen)))
      .groupBy(col("seq_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col(idCol)).as("n_docs"),
        min_by(col("__tok"), col("__gpos")).as("first_token"),
        max_by(col("__tok"), col("__gpos")).as("last_token"),
        sum((col("__pos") + 1L) * col("__tok").cast("long")).as("checksum"))
  }

  /** Deterministic global corpus shuffle into `nShards` epoch shards —
    * the step between a curated MIXTURE (q82) and packing (q80): a
    * training run wants documents in pseudo-random order, reproducibly.
    * `Bernoulli`-free and engine-portable like q64's sampler: the
    * shuffle key is an LCG of the row id ((id mod 2^31)·1103515245 +
    * 12345 mod 2^31 — the inner mod keeps the ANSI-mode product inside
    * a long at ANY id magnitude), the shard is key mod nShards, and the
    * within-shard position ranks by (key, id) — a deterministic total
    * order, so reruns, engines and partitionings all agree. The rank
    * window PARTITIONS by shard (never a global orderBy window): each
    * shard ranks in parallel, and at cluster scale nShards is sized to
    * the write parallelism — the same rows would be shuffled to one
    * writer per shard anyway, so the window adds no exchange beyond
    * the one the sharded write already pays. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val key = pmod(
      pmod(col(idCol), lit(1L << 31)) * lit(1103515245L) + lit(12345L),
      lit(1L << 31))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col(idCol))
    df.select(col(idCol), key.as("shuffle_key"))
      .withColumn("shard", pmod(col("shuffle_key"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
  }
}
