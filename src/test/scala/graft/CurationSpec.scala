package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Curation operators beyond the dedup ladder (Curation.scala): the
  * fixture text is synthetic word soup with no PII, so redaction and
  * contamination behavior is proven here on planted rows; the declared
  * q61-q64 oracles prove engine-equivalence on the fixtures. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("scrub redacts emails, URLs and phone-shaped numbers, keeps prose") {
    val rows = Seq(
      (1L, "contact me at alice.smith+spam@example.co.uk for details"),
      (2L, "docs at https://spark.apache.org/docs/latest?q=1 and more"),
      (3L, "call +1 (555) 123-4567 now"),
      (4L, "nothing sensitive here"),
      (5L, "mixed: bob@x.io via http://t.co/a1 or 555 666 7777"))
      .toDF("id", "t")
    val got = rows.select($"id", Curation.scrub($"t").as("s"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "contact me at <EMAIL> for details")
    assert(got(2L) === "docs at <URL> and more")
    assert(got(3L) === "call +<NUM> now")
    assert(got(4L) === "nothing sensitive here")
    assert(got(5L) === "mixed: <EMAIL> via <URL> or <NUM>")
  }

  test("repetitionStats: exact counts and ratios on a known document") {
    // "a a a b c" → 5 words, 3 distinct, dup 0.4, top word 3/5
    val df = Seq((1L, "a a a b c"), (2L, "x y z")).toDF("doc_id", "text")
    val out = Curation.repetitionStats(df, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 5L, 3L, 0.4, 0.6)))
    assert(out(2L) === ((2L, 3L, 3L, 0.0, 0.333333)))
  }

  test("decontaminate flags only docs sharing a k-shingle with the benchmark") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "we saw the quick brown fox yesterday"), // shares "the quick brown" + "quick brown fox"
      (2L, "a completely different sentence entirely"),
      (3L, "brown fox jumps over lazy dogs")) // shares "brown fox jumps"
      .toDF("doc_id", "text")
    val out = Curation.decontaminate(corpus, bench, "doc_id", "text", k = 3)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L, 3L -> 1L))
  }

  test("decontaminate plan broadcasts the benchmark side") {
    val docs = Tables.documents(spark, sf)
    val plan = Curation.decontaminate(
      docs.filter($"doc_id" >= 5), docs.filter($"doc_id" < 5),
      "doc_id", "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("bigramNll: hand-computed add-one conditionals; scrambling raises NLL") {
    // corpus: "a b a" and "b a" -> bigrams: (a b)x1, (b a)x2
    // prefix counts: a->1, b->2; V=2
    // lp(a b) = ln(2/3) = -0.405465; lp(b a) = ln(3/4) = -0.287682
    val df = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    val got = Curation.bigramNll(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpAB = round6(math.log(2.0 / 3.0))
    val lpBA = round6(math.log(3.0 / 4.0))
    assert(got(1L) === ((1L, 2L, round6(-(lpAB + lpBA) / 2))))
    assert(got(2L) === ((2L, 1L, round6(-lpBA))))
    assert(lpAB === -0.405465 && lpBA === -0.287682)

    // order sensitivity: reversing word order changes the score (a
    // unigram LM is permutation-invariant by construction, so any
    // difference proves the conditional actually conditions). The
    // fixture is word soup, so only inequality — not direction — is a
    // sound claim.
    val docs = Tables.documents(spark, sf).limit(50)
    val scrambled = docs.select($"doc_id",
      concat_ws(" ", reverse(graft.functions.TextOps.words($"text"))).as("text"))
    val orig = Curation.bigramNll(docs, "doc_id", "text")
      .agg(avg($"avg_nll")).as[Double].head()
    val rev = Curation.bigramNll(scrambled, "doc_id", "text")
      .agg(avg($"avg_nll")).as[Double].head()
    assert(orig.isFinite && rev.isFinite && orig != rev)
  }

  test("decontaminateBloom equals exact decontaminate; bloom phase prunes") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" >= 8)
    val bench = docs.filter($"doc_id" < 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_id").as[(Long, Long)].collect().toSeq
    val exact = rows(Curation.decontaminate(corpus, bench, "doc_id", "text", 4))
    val bloom = rows(Curation.decontaminateBloom(corpus, bench, "doc_id", "text", 4))
    assert(exact.nonEmpty) // fixture actually contains contamination
    assert(bloom === exact)
    // the pruned plan carries the bloom membership test, not a second join
    val plan = Curation.decontaminateBloom(corpus, bench, "doc_id", "text", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    // and a disjoint benchmark yields nothing (fpp never reaches output)
    val none = Curation.decontaminateBloom(
      corpus, Seq((999L, "zzz qqq vvv kkk www")).toDF("doc_id", "text"),
      "doc_id", "text", 4)
    assert(none.count() === 0)
  }

  test("stratified sample is deterministic, respects per-stratum rates") {
    val docs = Tables.documents(spark, sf)
    val rates = (0 to 9).map(i => s"src$i" -> 60).toMap
    def run() = Curation.stratifiedSample(docs, "doc_id", "source", rates, 25)
      .select($"doc_id").as[Long].collect().toSet
    val s1 = run(); val s2 = run()
    assert(s1 === s2) // reproducible — not Bernoulli sample()
    // empirical rates land near the nominal ones (LCG spreads ids)
    val bySource = Curation.stratifiedSample(docs, "doc_id", "source", rates, 25)
      .groupBy(length($"source") === 4).count().as[(Boolean, Long)].collect().toMap
    val totals = docs.groupBy(length($"source") === 4).count()
      .as[(Boolean, Long)].collect().toMap
    val highRate = bySource(true).toDouble / totals(true)
    val lowRate = bySource(false).toDouble / totals(false)
    assert(highRate > 0.45 && highRate < 0.75, s"high $highRate")
    assert(lowRate > 0.12 && lowRate < 0.40, s"low $lowRate")
    assert(highRate > lowRate)
  }

  test("mixToBudget: rates from planted totals, capped at 100, deterministic LCG keep set") {
    // stratum a: 10 docs x 100 tokens = 1000 total, budget 500 → rate 50
    // stratum b:  4 docs x  50 tokens =  200 total, under budget → rate 100 (all kept)
    val rows = (0L until 10L).map(i => (i, "a", 100)) ++
      (10L until 14L).map(i => (i, "b", 50))
    val df = rows.toDF("id", "src", "tokens")
    val out = Curation.mixToBudget(df, "id", "src", "tokens", budgetTokens = 500L)
      .select($"id", $"src", $"tokens", $"rate")
      .as[(Long, String, Int, Int)].collect()
    assert(out.filter(_._2 == "a").forall(_._4 == 50))
    assert(out.filter(_._2 == "b").forall(_._4 == 100))
    val expectedIds = rows.collect { case (id, s, _)
        if ((id * 1103515245L + 12345L) % 100) < (if (s == "a") 50 else 100) => id }
    assert(out.map(_._1).sorted.toSeq === expectedIds.sorted)
    // every under-budget stratum passes through whole
    assert(out.count(_._2 == "b") === 4)
  }

  test("temperatureResample: exact copies from the integer replay, alpha extremes, partition independence") {
    // skewed domains: a=16, b=4, c=1 docs
    val rows = (0L until 16L).map((_, "a")) ++
      (16L until 20L).map((_, "b")) ++ Seq((21L, "c"))
    val df = rows.toDF("id", "src")
    def l6(x: Double): Long =
      (BigDecimal.decimal(x)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        * 1000000).toLong
    def replay(alpha: Int, budget: Long): Map[(Long, String), Int] = {
      val nd = rows.groupBy(_._2).map { case (s, rs) => s -> rs.size.toLong }
      val lmax = nd.values.map(n => l6(math.log(n.toDouble))).max
      val w6 = nd.map { case (s, n) =>
        s -> l6(math.exp((alpha * (l6(math.log(n.toDouble)) - lmax)).toDouble / 1e9)) }
      val wsum = w6.values.sum
      val td = w6.map { case (s, w) => s -> (budget * w) / wsum }
      rows.flatMap { case (id, s) =>
        val n = nd(s); val t = td(s)
        val base = t / n; val xrate = (1000L * (t % n)) / n
        val perm = ((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L % 1000L
        val c = base + (if (perm < xrate) 1L else 0L)
        if (c >= 1L) Some((id, s) -> c.toInt) else None
      }.toMap
    }
    for (alpha <- Seq(0, 500, 1000)) {
      val exp = replay(alpha, 42L)
      val got = Curation.temperatureResample(df.repartition(7), "id", "src", alpha, 42L)
        .groupBy($"id", $"src").agg(max($"copy").as("mx"), count(lit(1)).as("k"))
        .as[(Long, String, Int, Long)].collect()
      // copy numbers are dense 1..copies
      got.foreach { case (id, _, mx, k) => assert(mx.toLong === k, s"id $id") }
      assert(got.map(t => (t._1, t._2) -> t._3).toMap === exp, s"alpha $alpha")
    }
    // α=0 flattens: every domain targets budget/3 = 10 docs, so the
    // singleton domain c UPSAMPLES to exactly 10 copies of its one doc
    val flat = Curation.temperatureResample(df, "id", "src", 0, 30L)
    assert(flat.filter($"src" === "c").count() === 10L)
    // partition independence
    val p1 = Curation.temperatureResample(df.repartition(1), "id", "src", 500, 42L)
      .orderBy($"id", $"copy").collect().toSeq
    val p7 = Curation.temperatureResample(df.repartition(7), "id", "src", 500, 42L)
      .orderBy($"id", $"copy").collect().toSeq
    assert(p1 === p7)
  }

  test("sourceOverlapMatrix: hand-exact pair cells, zero cells absent, short-doc collapse") {
    val docs = Seq(
      (1L, "s1", "a b c d"),        // {"a b c", "b c d"}
      (2L, "s2", "b c d e"),        // {"b c d", "c d e"}
      (3L, "s2", "b c d e"),        // duplicate doc adds nothing (set)
      (4L, "s3", "x y"),            // short doc -> whole-text shingle
      (5L, "s3", null.asInstanceOf[String])) // null text drops
      .toDF("doc_id", "src", "text")
    val got = Curation.sourceOverlapMatrix(docs.repartition(5), "src", "text", 3)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // only the overlapping pair (s1, s2) appears: shared {"b c d"},
    // jaccard 1/(2+2-1) = 0.333333; s3 overlaps nobody -> no rows
    assert(got === Seq(("s1", "s2", 2L, 2L, 1L, 0.333333)))
    val p1 = Curation.sourceOverlapMatrix(docs.repartition(1), "src", "text", 3)
      .collect().toSeq
    assert(p1 === got.map(org.apache.spark.sql.Row.fromTuple))
  }

  test("vocabulary: exact tf/df on a planted corpus, top-k order is (tf desc, term)") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana durian"),
      (3L, "apple cherry"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Curation.vocabulary(docs, "doc_id", "text", 3)
      .as[(String, Long, Long)].collect().toSeq
    // banana tf=3 df=2; apple tf=3 df=2 — tie broken by term asc;
    // cherry tf=2 df=2 beats durian tf=1 at the k boundary
    assert(got === Seq(("apple", 3L, 2L), ("banana", 3L, 2L), ("cherry", 2L, 2L)))
  }

  test("vocabulary top-k plans as TakeOrdered with map-side partial aggregation") {
    val q = Curation.vocabulary(Tables.documents(spark, sf), "doc_id", "text", 50)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("partial_count") || plan.contains("partial"), plan)
  }

  test("unigramNll: corpus-self LM scores match hand-computed values; rarity raises NLL") {
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // counts: a=2 b=2 c=1, total=5
    val got = Curation.unigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set(1L, 2L)) // null text contributes nothing
    assert(got(1L)._2 === 3L && got(2L)._2 === 2L)
    val lpCommon = math.log(2.0 / 5) // a and b
    val lpRare = math.log(1.0 / 5) // c
    assert(math.abs(got(1L)._3 - -lpCommon) < 2e-6)
    assert(math.abs(got(2L)._3 - -(lpCommon + lpRare) / 2) < 2e-6)
    assert(got(2L)._3 > got(1L)._3) // rarer tokens → higher NLL
  }

  test("scrub is a pure projection — filter still pushes to the scan") {
    val plan = Tables.documents(spark, sf)
      .select($"doc_id", Curation.scrub($"text").as("s"))
      .filter($"doc_id" < 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(doc_id,10)"), plan)
  }

  test("decontaminateFuzzy: planted near-dup of an eval item flagged; " +
      "partial overlap below threshold is not") {
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("id", "text")
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),     // exact copy
      (11L, "alpha beta gamma delta epsilon zeta eta iota"),      // near dup
      (12L, "one two three something else entirely different x"), // partial
      (13L, "unrelated words with zero overlap whatsoever here")) // none
      .toDF("id", "text")
    val got = Curation.decontaminateFuzzy(corpus, bench, "id", "text",
      shingleK = 3, nBands = 16, rowsPerBand = 1, jaccardThreshold = 0.5)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet === Set(10L, 11L))
    assert(got(10L)._2 === 1.0)               // exact copy: jaccard 1
    assert(got(11L)._2 < 1.0 && got(11L)._2 >= 0.5)
  }

  test("decontaminateFuzzy at 16x1 bands == the all-pairs exact definition " +
      "on the fixture (the q99 regime); benchmark side broadcasts") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val fuzzy = Curation.decontaminateFuzzy(
      docs.filter($"doc_id" >= 100), docs.filter($"doc_id" < 100),
      "doc_id", "text", shingleK = 3, nBands = 16, rowsPerBand = 1,
      jaccardThreshold = 0.8)
    // all-pairs reference: cross join the two shingled slices, exact
    // rounded jaccard, same threshold/aggregation
    def sh(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        as: String) =
      docs.filter(f($"doc_id")).filter($"text".isNotNull)
        .select($"doc_id".as(s"__$as"),
          Dedup.shingles($"text", 3).as(s"__sh_$as"))
    val ref = sh(_ >= 100, "c").crossJoin(sh(_ < 100, "b"))
      .withColumn("__j", round(Dedup.jaccard($"__sh_c", $"__sh_b"), 6))
      .filter($"__j" >= 0.8)
      .groupBy($"__c")
      .agg(count(lit(1)).as("n_matches"), max($"__j").as("max_jaccard"))
      .select($"__c".as("doc_id"), $"n_matches", $"max_jaccard")
    val a = fuzzy.as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = ref.as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a.nonEmpty, "fixture has no cross-slice near-dups — pick a new slice")
    assert(a === b)
    val plan = fuzzy.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  private def lcgBucket(id: Long, mod: Long): Long =
    (((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L) % mod

  test("splitByCluster: near-dup cluster members share a side; split is the " +
    "LCG permille of the cluster id; permille bounds hold") {
    val df = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta"),
      (12L, "totally different words entirely unrelated content here now"),
      (13L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val out = Curation.splitByCluster(df, "doc_id", "text", valPermille = 500)
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.size === 4)
    // identical docs collapse to one cluster and therefore one side
    assert(out(10L) === out(11L) && out(11L) === out(13L))
    assert(out(10L)._1 === 10L)
    // every split label is exactly the LCG decision on its cluster id
    out.values.foreach { case (c, s) =>
      assert(s === (if (lcgBucket(c, 1000L) < 500) "val" else "train"))
    }
    val all0 = Curation.splitByCluster(df, "doc_id", "text", 0)
      .select("split").distinct().as[String].collect().toSeq
    assert(all0 === Seq("train"))
    val all1000 = Curation.splitByCluster(df, "doc_id", "text", 1000)
      .select("split").distinct().as[String].collect().toSeq
    assert(all1000 === Seq("val"))
  }

  test("weightedSample: keep set == per-row LCG-vs-floor(score*1000) replay; " +
    "out-of-range scores clamp") {
    val rows = (0L until 200L).map(i => (i, (i % 11).toDouble / 10.0))
    val df = rows.toDF("id", "score")
    val kept = Curation.weightedSample(df, "id", "score")
      .as[(Long, Double)].collect().map(_._1).toSet
    val expect = rows.filter { case (i, s) =>
      lcgBucket(i, 1000L) <
        math.min(1000L, math.max(0L, math.floor(s * 1000.0).toLong))
    }.map(_._1).toSet
    assert(kept === expect)
    assert(kept.nonEmpty && kept.size < rows.size)
    val clamp = Seq((1L, -0.5), (2L, 2.0)).toDF("id", "score")
    val ck = Curation.weightedSample(clamp, "id", "score")
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(ck === Set(2L)) // prob 0 drops, prob >1 clamps to always-keep
  }

  test("corpusOverlap: exact hand-computed set counts, jaccard and containment") {
    val corpus = Seq((100L, "a b c"), (101L, "x y")).toDF("doc_id", "text")
    val bench = Seq((1L, "b c d")).toDF("doc_id", "text")
    // k=2 shingles: corpus {a b, b c, x y}, bench {b c, c d}, shared {b c}
    val got = Curation.corpusOverlap(corpus, bench, "text", k = 2)
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(got === ((3L, 2L, 1L, 0.25, 0.5)))
    // disjoint benchmark → zero overlap, zero containment
    val none = Curation.corpusOverlap(corpus,
      Seq((1L, "p q r")).toDF("doc_id", "text"), "text", k = 2)
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(none._3 === 0L && none._4 === 0.0 && none._5 === 0.0)
    // EMPTY benchmark: divisors are 0 — the ratios must be NULL (the
    // DuckDB semantics), never NaN (Spark's raw 0/0 double)
    val empty = Curation.corpusOverlap(corpus,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", k = 2)
      .select($"n_shared", $"jaccard".isNull, $"containment".isNull)
      .as[(Long, Boolean, Boolean)].collect().head
    assert(empty === ((0L, false, true))) // union=3 nonzero → jaccard 0.0
    val bothEmpty = Curation.corpusOverlap(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", k = 2)
      .select($"jaccard".isNull, $"containment".isNull)
      .as[(Boolean, Boolean)].collect().head
    assert(bothEmpty === ((true, true)))
  }

  test("heapsProfile: exact vocab-at-prefix on a hand corpus; " +
    "partition-count independent") {
    val df = Seq(
      (1L, "a a a a a a a a a a"),          // tokens 1-10, vocab {a}
      (2L, "b c d e f g h i j k"))          // tokens 11-20, +10 terms
      .toDF("doc_id", "text")
    val got = Curation.heapsProfile(df, "doc_id", "text")
      .as[(Long, Long)].collect().toSeq
    // points: 16 (< 20) and the 20-token total; V(16)=a..g=7, V(20)=11
    assert(got === Seq((16L, 7L), (20L, 11L)))
    val a = Curation.heapsProfile(df.repartition(1), "doc_id", "text")
      .as[(Long, Long)].collect().toSeq
    val b = Curation.heapsProfile(df.repartition(5), "doc_id", "text")
      .as[(Long, Long)].collect().toSeq
    assert(a === got && b === got)
    // empty corpus → empty profile, no NPE
    assert(Curation.heapsProfile(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
      .count() === 0L)
  }

  test("zipfFit: exact scaled-integer regression on a hand corpus; " +
    "partition-count independent") {
    val df = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val got = Curation.zipfFit(df, "text")
      .as[(Long, Long, Double, Double)].collect().head
    assert(got._1 === 3L && got._2 === 7L)
    // replicate the operator's arithmetic: 6-dp HALF_UP ln terms lifted
    // to 1e6-scaled longs, exact integer sums, IEEE double closed form
    def s6(v: Double): Long =
      (BigDecimal(java.lang.Double.toString(v))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) * BigDecimal(1000000))
        .toLongExact
    val terms = Seq((1L, 4L), (2L, 2L), (3L, 1L)) // (rank, tf): a=4 b=2 c=1
    val xs = terms.map { case (r, _) => s6(math.log(r.toDouble)) }
    val ys = terms.map { case (_, t) => s6(math.log(t.toDouble)) }
    val nD = terms.size.toDouble
    val sx = xs.sum.toDouble / 1e6; val sy = ys.sum.toDouble / 1e6
    val sxx = xs.map(v => v * v).sum.toDouble / 1e12
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble / 1e12
    val denom = nD * sxx - sx * sx
    val slope = (nD * sxy - sx * sy) / denom
    def r6(v: Double): Double =
      BigDecimal(java.lang.Double.toString(v))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._3 === r6(slope))
    assert(got._4 === r6((sy - slope * sx) / nD))
    assert(got._3 < 0.0) // more frequent → lower rank: negative slope
    // the two-phase rank is partition-layout independent
    val corpus = (0L until 97L)
      .map(i => (i, s"w${i % 13} w${i % 7} w${i % 7} common common"))
      .toDF("doc_id", "text")
    val a = Curation.zipfFit(corpus.repartition(1), "text")
      .as[(Long, Long, Double, Double)].collect().head
    val b = Curation.zipfFit(corpus.repartition(13), "text")
      .as[(Long, Long, Double, Double)].collect().head
    assert(a === b)
  }

  test("capPerGroup: at most n picks per group, selection is the LCG " +
      "order (not data order), partition-count independent, small " +
      "groups kept whole") {
    def lcg(id: Long): Long = ((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L
    val rows = (0L until 20L).map(i => ("big", i)) ++
      Seq(("tiny", 100L), ("tiny", 101L))
    for (parts <- Seq(1, 3, 7)) {
      val df = spark.sparkContext
        .parallelize(scala.util.Random.shuffle(rows), parts).toDF("g", "id")
      val got = Curation.capPerGroup(df, "g", "id", n = 5)
        .as[(String, Int, Long)].collect().toSeq
      val expectBig = (0L until 20L).sortBy(i => (lcg(i), i)).take(5)
        .zipWithIndex.map { case (id, p) => ("big", p + 1, id) }
      val expectTiny = Seq(100L, 101L).sortBy(i => (lcg(i), i))
        .zipWithIndex.map { case (id, p) => ("tiny", p + 1, id) }
      assert(got === expectBig ++ expectTiny, s"parts=$parts")
    }
  }

  test("tfidfKeywords: hand-exact scores and ranks, null drop, k guard, " +
      "partition independence") {
    // N=3 docs; df: apple 2, banana 2, cherry 1
    // idf6 = round(ln(N/df), 6) * 1e6: ln(1.5) -> 405465, ln(3) -> 1098612
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "banana"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Curation.tfidfKeywords(docs.repartition(3), "doc_id", "text", k = 5)
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1, "apple", 2L, 2L, 0.81093),
      (1L, 2, "banana", 1L, 2L, 0.405465),
      (2L, 1, "cherry", 1L, 1L, 1.098612),
      (2L, 2, "apple", 1L, 2L, 0.405465),
      (3L, 1, "banana", 1L, 2L, 0.405465)))
    // k truncates per doc
    val k1 = Curation.tfidfKeywords(docs, "doc_id", "text", k = 1)
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    assert(k1 == got.filter(_._2 == 1))
    // partition independence
    val a = Curation.tfidfKeywords(docs.repartition(1), "doc_id", "text", 5)
      .collect().toSeq
    val b = Curation.tfidfKeywords(docs.repartition(7), "doc_id", "text", 5)
      .collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Curation.tfidfKeywords(docs, "doc_id", "text", 0)
    }
  }

  test("fieldAssociation: exact-independence -> mi 0, bijection -> mi == h, " +
      "null drop, partition independence") {
    // exactly independent counts (every cell 3): ln(1) = 0 per cell,
    // so mi is an EXACT 0.0, not an epsilon
    val ind = Seq.tabulate(12)(i => (s"l${i % 2}", s"s${i / 6}"))
      .toDF("lang", "src")
    val gi = Curation.fieldAssociation(ind.repartition(3), "lang", "src")
      .as[(Long, Double, Double, Double)].collect().head
    assert(gi == ((12L, 0.693147, 0.693147, 0.0)))
    // bijective dependence, 50/50: mi == h_a == h_b == round(ln 2, 6)
    val bij = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("lang", "src")
    val gb = Curation.fieldAssociation(bij, "lang", "src")
      .as[(Long, Double, Double, Double)].collect().head
    assert(gb == ((4L, 0.693147, 0.693147, 0.693147)))
    // null rows drop from BOTH marginals
    val withNulls = Seq[(String, String)](
      ("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"),
      (null, "x"), ("a", null)).toDF("lang", "src")
    val gn = Curation.fieldAssociation(withNulls, "lang", "src")
      .as[(Long, Double, Double, Double)].collect().head
    assert(gn == gb)
    // partition independence
    val p1 = Curation.fieldAssociation(ind.repartition(1), "lang", "src")
      .collect().toSeq
    val p7 = Curation.fieldAssociation(ind.repartition(7), "lang", "src")
      .collect().toSeq
    assert(p1 == p7)
  }

  test("noveltyScores: hand-exact fractions, shared shingles lower both " +
      "docs, short-doc collapse, partition independence") {
    // d1 "a b c d": shingles {a b c, b c d}; d2 "a b c e": {a b c, b c e};
    // "a b c" shared (df 2) -> each doc 1/2 novel. d3 short "q r": one
    // whole-text shingle, unique -> 1.0. d4 null text drops.
    val docs = Seq[(java.lang.Long, String)](
      (1L, "a b c d"), (2L, "a b c e"), (3L, "q r"), (4L, null))
      .toDF("doc_id", "text")
    val got = Curation.noveltyScores(docs.repartition(3), "doc_id", "text", 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 1L, 1L, 1.0)))
    // identical twin docs: nothing unique anywhere in either
    val twins = Seq((1L, "x y z w"), (2L, "x y z w")).toDF("doc_id", "text")
    val gt = Curation.noveltyScores(twins, "doc_id", "text", 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(gt == Seq((1L, 2L, 0L, 0.0), (2L, 2L, 0L, 0.0)))
    // partition independence
    val p1 = Curation.noveltyScores(docs.repartition(1), "doc_id", "text", 3)
      .collect().toSeq
    val p7 = Curation.noveltyScores(docs.repartition(7), "doc_id", "text", 3)
      .collect().toSeq
    assert(p1 == p7)
    intercept[IllegalArgumentException] {
      Curation.noveltyScores(docs, "doc_id", "text", 0)
    }
  }

  test("effectiveSampleSize: uniform -> n, dominated -> small, " +
      "non-positive drop, partition independence") {
    // uniform weights: ESS == n exactly
    val uni = Seq(2.0, 2.0, 2.0, 2.0).toDF("w")
    val gu = Curation.effectiveSampleSize(uni, "w")
      .as[(Long, Double, Double)].collect().head
    assert(gu == ((4L, 8.0, 4.0)))
    // 9-vs-1: ESS = 100/82 = 1.219512
    val dom = Seq(9.0, 1.0).toDF("w")
    val gd = Curation.effectiveSampleSize(dom, "w")
      .as[(Long, Double, Double)].collect().head
    assert(gd == ((2L, 10.0, 1.219512)))
    // zero/negative/null weights drop
    val dirty = Seq[java.lang.Double](2.0, 2.0, 0.0, -1.0, null).toDF("w")
    val gz = Curation.effectiveSampleSize(dirty, "w")
      .as[(Long, Double, Double)].collect().head
    assert(gz == ((2L, 4.0, 2.0)))
    // partition independence
    val big = (1 to 100).map(i => (i % 7 + 1).toDouble).toDF("w")
    val p1 = Curation.effectiveSampleSize(big.repartition(1), "w")
      .collect().toSeq
    val p7 = Curation.effectiveSampleSize(big.repartition(7), "w")
      .collect().toSeq
    assert(p1 == p7)
  }

  test("tokenFertility: equals an independent per-doc aggregation of the " +
      "same kernels on the fixture; null text drops; partition " +
      "independence") {
    val docs = Tables.documents(spark, sf)
    val got = Curation.tokenFertility(docs, "text", "source")
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    // independent route: per-doc kernel outputs aggregated on the driver
    val st = graft.functions.TextOps.bpeDocStats($"text", 64)
    val perDoc = docs.filter($"text".isNotNull)
      .select($"source", st.getField("n_tokens").cast("long"),
        graft.functions.TextOps.tokenCount($"text").cast("long"),
        octet_length($"text").cast("long"))
      .as[(String, Long, Long, Long)].collect().toSeq
    val expected = perDoc.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, rows) =>
        val (t, w, b) =
          (rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).sum)
        def r6(x: Double) = BigDecimal(x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (src, rows.size.toLong, t, w, b,
          if (w > 0) Some(r6(t.toDouble / w)) else None,
          if (b > 0) Some(r6(t.toDouble / b)) else None)
    }
    assert(got === expected && got.nonEmpty)
    // fertility on this fixture is well-defined and > 0 everywhere
    assert(got.forall(r => r._6.exists(_ > 0) && r._7.exists(_ > 0)))
    // null text drops from every count
    val withNull = docs.select($"source", $"text")
      .unionByName(Seq(("src_00", Option.empty[String])).toDF("source", "text"))
    val gn = Curation.tokenFertility(withNull, "text", "source")
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(gn === got)
    val p3 = Curation.tokenFertility(docs.repartition(3), "text", "source")
      .collect().toSeq
    val p8 = Curation.tokenFertility(docs.repartition(8), "text", "source")
      .collect().toSeq
    assert(p3 === p8)
  }
  // ---- ngramRepetition ------------------------------------------------

  test("ngramRepetition: hand-exact counts and ppm; short docs emit no " +
      "row for large n; null text drops; partition independent") {
    val df = Seq(
      (1L, Some("a b a b a")),
      (2L, Some("x y z")),
      (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = Curation.ngramRepetition(df, "doc_id", "text", Seq(2, 3, 4))
      .as[(Long, Int, Long, Long, Long, Long)].collect().toSeq
    // doc 1: 2-grams [a b, b a, a b, b a] -> 4/2, max 2
    //        3-grams [a b a, b a b, a b a] -> 3/2, max 2
    //        4-grams [a b a b, b a b a] -> 2/2, max 1
    // doc 2: 2-grams 2/2 max 1; 3-grams 1/1 max 1; NO 4-gram row
    assert(got === Seq(
      (1L, 2, 4L, 2L, 500000L, 500000L),
      (1L, 3, 3L, 2L, 333333L, 666666L),
      (1L, 4, 2L, 2L, 0L, 500000L),
      (2L, 2, 2L, 2L, 0L, 500000L),
      (2L, 3, 1L, 1L, 0L, 1000000L)))
    val p1 = Curation.ngramRepetition(df.repartition(1), "doc_id", "text")
      .collect().map(_.toString).toSeq
    val p7 = Curation.ngramRepetition(df.repartition(7), "doc_id", "text")
      .collect().map(_.toString).toSeq
    assert(p1 === p7)
  }

  // ---- allocateStratified ---------------------------------------------

  test("allocateStratified: largest-remainder quotas, LCG-order picks " +
      "== window reference, exact total, zero-quota stratum, budget >= " +
      "corpus keeps all, partition independent") {
    import org.apache.spark.sql.expressions.Window
    val df = (0L to 4L).map(i => ("a", i)) ++ (10L to 12L).map(i => ("b", i))
    val d = df.toDF("s", "id")
    // N=8, B=5: base a=3 (rem 1), b=1 (rem 7); L=1 -> b +1 => a=3, b=2
    val got = Curation.allocateStratified(d, "id", "s", 5L)
      .as[(String, Long)].collect().toSeq
    assert(got.count(_._1 == "a") == 3 && got.count(_._1 == "b") == 2)
    // picks match the independent window-rank reference over (lcg, id)
    val lcg = pmod(pmod(col("id"), lit(1L << 31)) * lit(1103515245L)
      + lit(12345L), lit(1L << 31))
    val ref = d.withColumn("lcg", lcg)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("s")).orderBy(col("lcg"), col("id"))))
      .filter((col("s") === "a" && col("rn") <= 3) ||
        (col("s") === "b" && col("rn") <= 2))
      .select(col("s"), col("id")).orderBy(col("s"), col("id"))
      .as[(String, Long)].collect().toSeq
    assert(got === ref)
    // zero-quota stratum: a:50 rows, b:1, budget 3 -> a=3, b=0
    val big = ((0L until 50L).map(i => ("a", i)) :+ (("b", 99L))).toDF("s", "id")
    val g2 = Curation.allocateStratified(big, "id", "s", 3L)
      .as[(String, Long)].collect().toSeq
    assert(g2.size == 3 && g2.forall(_._1 == "a"))
    // budget >= corpus keeps every row
    val all = Curation.allocateStratified(d, "id", "s", 100L)
      .as[(String, Long)].collect().toSeq
    assert(all.size == 8)
    // null stratum/id rows drop
    val withNull = d.unionByName(
      Seq((Option.empty[String], Option(77L)),
        (Option("a"), Option.empty[Long]))
        .toDF("s", "id"))
    val gn = Curation.allocateStratified(withNull, "id", "s", 5L)
      .as[(String, Long)].collect().toSeq
    assert(gn === got)
    val p1 = Curation.allocateStratified(d.repartition(1), "id", "s", 5L)
      .collect().map(_.toString).toSeq
    val p7 = Curation.allocateStratified(d.repartition(7), "id", "s", 5L)
      .collect().map(_.toString).toSeq
    assert(p1 === p7)
  }

  test("splitLeakage: cluster method crosses zero by construction; " +
    "the naive per-doc split crosses a straddling family; exact counts") {
    def lcg(id: Long): Long =
      (((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L) % 1000L
    // pick one id on each naive side (valPermille = 200)
    val idVal = (0L until 200L).find(lcg(_) < 200L).get
    val idTrain = (0L until 200L).find(lcg(_) >= 200L).get
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (idVal, shared), (idTrain, shared), // identical -> hamming-0 pair
      (1000L, "completely different words one"),
      (1001L, "another unrelated document body two"))
      .toDF("doc_id", "text")
    val got = graft.operators.Curation
      .splitLeakage(df, "doc_id", "text", valPermille = 200)
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got === Seq(
      ("cluster", 1L, 0L, Some(0L)),
      ("naive_doc", 1L, 1L, Some(1000000L))))
  }

  test("splitLeakage: across-sig group arithmetic == enumerated doc-pair " +
      "reference on a planted near-sig multi-family corpus (q120 parity " +
      "pattern); empty/pairless corpus reads exact 0") {
    import graft.operators.Dedup
    // near-sig families: one-word variants of a 24-word base sit within
    // hamming<=3 of it (the probed DedupSpec shape), so the band join
    // produces ACROSS-sig adjacency; family sizes > 1 exercise the
    // f_a*f_b product terms, and ids are drawn 0..N so lcg buckets
    // straddle the naive split.
    val base = (1 to 24).map(i => s"w$i").mkString(" ")
    def variant(pos: Int, w: String) =
      (1 to 24).map(i => if (i == pos) w else s"w$i").mkString(" ")
    val texts = Seq(base, variant(8, "beta"), variant(13, "gamma"),
      "a totally unrelated short payload")
    val famSizes = Seq(4, 3, 2, 1)
    val df = texts.zip(famSizes).zipWithIndex.flatMap { case ((t, n), fi) =>
      (0 until n).map(j => ((fi * 7 + j).toLong, t)) }
      .toDF("doc_id", "text")
    val got = graft.operators.Curation
      .splitLeakage(df, "doc_id", "text", valPermille = 200)
      .as[(String, Long, Long, Option[Long])].collect().toSeq
      .sortBy(_._1)
    // enumerated reference: the pre-r20 composition (doc-level pair
    // stream + per-doc sides) computed independently
    def lcg(id: Long): Long =
      (((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L) % 1000L
    val pairs = Dedup.simhashNearDups(df, "doc_id", "text", 3)
      .select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSeq
    val sides = graft.operators.Curation
      .splitByCluster(df, "doc_id", "text", 200, 3)
      .select(col("doc_id"), col("split"))
      .as[(Long, String)].collect().toMap
    val nPairs = pairs.size.toLong
    val naiveCross = pairs.count { case (a, b) =>
      (lcg(a) < 200) != (lcg(b) < 200) }.toLong
    val clusterCross = pairs.count { case (a, b) =>
      sides(a) != sides(b) }.toLong
    def ppm(nc: Long) =
      if (nPairs > 0) Some(nc * 1000000L / nPairs) else None
    assert(got === Seq(
      ("cluster", nPairs, clusterCross, ppm(clusterCross)),
      ("naive_doc", nPairs, naiveCross, ppm(naiveCross))))
    // the across-sig term must actually fire: the planted corpus has
    // more pairs than the within-family C(f,2) total (4C2+3C2+2C2=10)
    assert(nPairs > 10L, s"planted adjacency missing (nPairs=$nPairs)")
    assert(naiveCross > 0L, "planted straddle missing")
    // empty corpus: exact 0 counts, NULL ppm (the r20 coalesce contract)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val gotEmpty = graft.operators.Curation
      .splitLeakage(empty, "doc_id", "text", valPermille = 200)
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(gotEmpty === Seq(
      ("cluster", 0L, 0L, None),
      ("naive_doc", 0L, 0L, None)))
  }

  test("charEntropy: hand-exact 6-dp lifted nats, single-char doc reads " +
      "0, null/empty excluded, partition independence") {
    val docs = Seq(
      (1L, "aab"),  // a:2/3 (ln6 -405465), b:1/3 (-1098612)
      (2L, "ab"),   // uniform: entropy == ln 2 == 0.693147
      (3L, "aaa"),  // degenerate: 0
      (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.charEntropy(df, "doc_id", "text")
        .as[(Long, Long, Long, Long)].collect().toSeq
    val got = run(docs)
    // doc1: -(2*(-405465) + 1*(-1098612)) DIV 3 = 1909542 DIV 3
    assert(got === Seq(
      (1L, 3L, 2L, 636514L),
      (2L, 2L, 2L, 693147L),
      (3L, 3L, 1L, 0L)))
    assert(run(docs.repartition(4)) === got)
  }

  test("unigramSurprisal: hand-exact corpus-LM self-information, " +
      "partition independence") {
    val docs = Seq((1L, "a a b"), (2L, "b c"))
      .toDF("doc_id", "text")
    // corpus: a:2, b:2, c:1, T=5 -> ln6(a)=ln6(b)=-916291, ln6(c)=-1609438
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.unigramSurprisal(df, "doc_id", "text")
        .as[(Long, Long, Long)].collect().toSeq
    val got = run(docs)
    assert(got === Seq(
      (1L, 3L, 916291L),               // 2748873 DIV 3
      (2L, 2L, 1262864L)))             // 2525729 DIV 2 (truncated)
    assert(run(docs.repartition(3)) === got)
  }

  test("hotPhrases: exact shares over the shingle occurrence stream, " +
      "threshold strict, partition independence") {
    // 4 docs of 4 words -> 2 distinct 3-shingles each = 8 occurrences;
    // "a b c" appears in docs 1-3 (share 3/8), "b c d" in 1-2 (2/8),
    // the rest once each (1/8)
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "z a b c"),
      (4L, "p q r s"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame, minShare: Double) =
      Curation.hotPhrases(df, "doc_id", "text", k = 3, minShare)
        .as[(String, Long, Double)].collect().toSeq
    val got = run(docs, 0.2)
    assert(got === Seq(("a b c", 3L, 0.375), ("b c d", 2L, 0.25)))
    // strict >: a phrase AT the threshold is excluded
    assert(run(docs, 0.375) === Seq.empty)
    assert(run(docs.repartition(5), 0.2) === got)
  }
}
