package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Chunker, Dedup}
import graft.functions.{TextOps, VectorOps}

/** SURVEY §5.3 property tests. Inputs are ScalaCheck-generated (fixed
  * seed for reproducibility) and evaluated in single batched Spark
  * jobs, so each property covers many cases without per-case job
  * overhead.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val wordGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(12).mkString)
  private val docGen: Gen[String] =
    Gen.chooseNum(1, 900).flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  test("chunker: reconstruction, bounded chunk size, dense ordinals (random docs)") {
    val docs = sample(docGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val chunked = Chunker.chunk(docs, "text") // default 512/384
    // every chunk <= 384 words except the single-chunk passthrough case
    val bad = chunked
      .withColumn("n_doc_words", size(TextOps.words(col("text"))))
      .filter(col("chunk_tokens") > 384 && col("n_doc_words") > 512)
      .count()
    assert(bad === 0)
    // ordinals dense from 0
    val ordinalHoles = chunked.groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), max($"chunk_id").as("mx"), min($"chunk_id").as("mn"))
      .filter($"mn" =!= 0 || $"mx" =!= $"n" - 1).count()
    assert(ordinalHoles === 0)
    // concatenated chunks reconstruct the original word sequence
    val rejoined = chunked.groupBy($"doc_id")
      .agg(concat_ws(" ", array_sort(collect_list(struct($"chunk_id", $"chunk_text")))
        .getField("chunk_text")).as("rejoined"))
    val mismatch = rejoined.join(docs, "doc_id")
      .filter(concat_ws(" ", TextOps.words($"text")) =!= $"rejoined").count()
    assert(mismatch === 0)
  }

  test("jaccard: bounded [0,1], symmetric, self=1 (random word sets)") {
    val sets = sample(Gen.listOf(wordGen).map(_.distinct), 80).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws) }.toDF("id", "ws")
    val a = sets.select($"id".as("ia"), $"ws".as("wa"))
    val b = sets.select($"id".as("ib"), $"ws".as("wb"))
    val pairs = a.crossJoin(b).select(
      Dedup.jaccard($"wa", $"wb").as("jab"),
      Dedup.jaccard($"wb", $"wa").as("jba"),
      ($"ia" === $"ib").as("same"))
    assert(pairs.filter($"jab" < 0.0 || $"jab" > 1.0).count() === 0)
    assert(pairs.filter($"jab" =!= $"jba").count() === 0)
    assert(pairs.filter($"same" && $"jab" =!= 1.0).count() === 0)
  }

  test("fingerprint: stable under recomputation, sensitive to word order (random docs)") {
    val docs = sample(docGen.suchThat(_.split(" ").distinct.length > 1), 40)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val fp1 = docs.select($"id", TextOps.fingerprint(TextOps.words($"text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    val fp2 = docs.select($"id", TextOps.fingerprint(TextOps.words($"text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp1 === fp2)
    // reversing the word order changes the fingerprint (unless palindromic)
    val rev = docs.select($"id",
      TextOps.fingerprint(TextOps.words($"text")).as("fp"),
      TextOps.fingerprint(reverse(TextOps.words($"text"))).as("fpr"),
      (TextOps.words($"text") === reverse(TextOps.words($"text"))).as("pal"))
    val ordInsensitive = rev.filter(!$"pal" && $"fp" === $"fpr").count()
    // mod-1e9+7 collisions are possible but vanishingly rare for 40 docs
    assert(ordInsensitive === 0)
  }

  test("hash embedding: unit norm or zero, fixed dim, deterministic (random docs)") {
    val docs = sample(docGen, 50).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val emb = docs.select($"id",
      VectorOps.hashEmbed(TextOps.words($"text"), 32).as("e"))
    val rows = emb.as[(Long, Seq[Double])].collect()
    assert(rows.forall(_._2.length == 32))
    assert(rows.forall { case (_, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      math.abs(n - 1.0) < 1e-9 || n == 0.0
    })
    val again = emb.as[(Long, Seq[Double])].collect()
    assert(rows.toMap === again.toMap)
  }

  test("exact dedup: idempotent and keeps one row per distinct text (random dups)") {
    val base = sample(docGen, 30)
    val withDups = (base ++ base ++ base.take(10)).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = Dedup.exact(withDups, "doc_id", "text")
    assert(once.count() === base.distinct.length)
    assert(Dedup.exact(once, "doc_id", "text").count() === once.count())
    // kept ids are the minimum id of each duplicate group
    val expected = withDups.groupBy($"text").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val got = once.select($"doc_id").as[Long].collect().sorted.toSeq
    assert(got === expected)
  }

  test("histogram quantiles == buffered percentile on random groups " +
      "(nulls, duplicates, skewed sizes)") {
    // one batched dataset: group sizes 1..~400, heavy duplication via a
    // small value domain, ~10% nulls (percentile ignores them — the
    // histogram plan must too)
    val rows = sample(
      for {
        g <- Gen.chooseNum(0, 11)
        v <- Gen.option(Gen.chooseNum(-50, 50).map(_ * 0.25))
      } yield (g, v), 2500)
    // plus a group whose values are ALL null: the built-in keeps the
    // group row (null quantiles), and the histogram plan must too
    val df = (rows ++ Seq.fill(5)((99, Option.empty[Double]))).toDF("g", "v")
    val viaHistogram = graft.operators.Analytics.quantiles(df, "g", "v")
      .collect().toSeq
    val viaBuiltin = df
      .groupBy($"g")
      .agg(percentile($"v", array(lit(0.5), lit(0.9), lit(0.99))).as("__q"))
      .select($"g", round(element_at($"__q", 1), 6).as("p50"),
        round(element_at($"__q", 2), 6).as("p90"),
        round(element_at($"__q", 3), 6).as("p99"))
      .orderBy($"g").collect().toSeq
    assert(viaHistogram === viaBuiltin)
  }
}
