package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup keeps lowest id per duplicate text, idempotent") {
    val df = Seq(
      (3L, "a b c"), (1L, "a b c"), (2L, "x y z"), (5L, "a b c"), (4L, "x y z"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
    val ids = out.select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L))
    // idempotent
    assert(Dedup.exact(out, "doc_id", "text").count() === 2)
  }

  test("shingles: count, order, distinctness") {
    val sh = Seq(Tuple1("a b c d")).toDF("t")
      .select(Dedup.shingles($"t", 3).as("sh")).as[Seq[String]].head()
    assert(sh.toSet === Set("a b c", "b c d"))
    val short = Seq(Tuple1("a b")).toDF("t")
      .select(Dedup.shingles($"t", 3).as("sh")).as[Seq[String]].head()
    assert(short === Seq("a b"))
  }

  test("jaccard: identical=1, disjoint=0") {
    val df = Seq((Seq("a", "b"), Seq("a", "b"), Seq("c", "d"))).toDF("x", "y", "z")
    val (same, disj) = df.select(
      Dedup.jaccard($"x", $"y").as("s"),
      Dedup.jaccard($"x", $"z").as("d")).as[(Double, Double)].head()
    assert(same === 1.0 && disj === 0.0)
  }

  test("minhash LSH finds exact duplicates and is contained in exact jaccard") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words entirely unrelated to all others here"),
      (4L, "the quick brown fox jumps over the lazy dog again and now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(df, "doc_id", "text",
      shingleK = 3, nBands = 8, rowsPerBand = 2, jaccardThreshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))     // identical docs always collide
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // verify step kills false positives
  }

  test("minhash LSH differential vs exact jaccard at a non-default threshold (0.3, 16×1 bands)") {
    // 20 docs: 4 exact-dup groups of templated sentences + perturbed
    // variants + unrelated noise. Exact all-pairs jaccard is computed
    // in plain Scala (replicating the shingle definition) — the LSH
    // path must be CONTAINED in it with identical rounded scores, and
    // must have perfect recall on identical docs (same signature ⇒
    // every band agrees).
    val base = Seq("alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight nine ten",
      "red orange yellow green blue indigo violet colors",
      "north south east west up down left right center")
    val rows = (0 until 20).map { i =>
      val b = base(i % 4)
      val t = i / 4 match {
        case 0 | 1 => b // two identical copies of each base
        case 2 => b + " extra"
        case 3 => b.replaceFirst("\\w+$", "changed")
        case _ => s"noise$i filler$i padding$i junk$i"
      }
      (i.toLong, t)
    }
    val df = rows.toDF("doc_id", "text")
    val k = 3
    def shingleSet(t: String): Set[String] = {
      val ws = t.trim.split("\\s+").toSeq
      if (ws.length < k) Set(ws.mkString(" "))
      else ws.sliding(k).map(_.mkString(" ")).toSet
    }
    val sets = rows.map { case (id, t) => id -> shingleSet(t) }.toMap
    val exact = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toDouble
      j = if (sa.size + sb.size == 0) 1.0 else inter / (sa.size + sb.size - inter)
      if j >= 0.3
    } yield (a, b) -> BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    val got = Dedup.minhashNearDups(df, "doc_id", "text",
        shingleK = k, nBands = 16, rowsPerBand = 1, jaccardThreshold = 0.3)
      .as[(Long, Long, Double)].collect()
    got.foreach { case (a, b, j) =>
      assert(exact.contains((a, b)), s"false pair ($a,$b)")
      assert(math.abs(j - exact((a, b))) < 1e-6, s"score mismatch ($a,$b)")
    }
    val identical = for ((a, sa) <- sets; (b, sb) <- sets if a < b && sa == sb) yield (a, b)
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    identical.foreach(p => assert(gotPairs.contains(p), s"missed identical pair $p"))
  }

  test("simhash banding is EXACT for hamming <= 3 (pigeonhole) — differential at 1 and 3") {
    // candidate generation must lose nothing: a 64-bit pair within
    // hamming<=3 agrees exactly on one of the 4 16-bit bands, so the
    // banded join equals the all-pairs definition computed here from
    // the kernel's own signatures
    val rows = (0 until 18).map { i =>
      val words = (0 until 12).map(w => s"w${(w + i / 6) % 14}")
      (i.toLong, (words :+ s"tail${i % 3}").mkString(" "))
    }
    val df = rows.toDF("doc_id", "text")
    val sigs = df.select($"doc_id", Dedup.simhash($"text", 64).as("s"))
      .as[(Long, Long)].collect().toMap
    for (maxH <- Seq(1, 3)) {
      val exact = (for {
        (a, sa) <- sigs; (b, sb) <- sigs if a < b
        h = java.lang.Long.bitCount(sa ^ sb)
        if h <= maxH
      } yield (a, b, h)).toSet
      val got = Dedup.simhashNearDups(df, "doc_id", "text", maxHamming = maxH)
        .as[(Long, Long, Int)].collect().map(t => (t._1, t._2, t._3)).toSet
      assert(got === exact, s"maxHamming=$maxH")
      assert(exact.nonEmpty, "corpus produced no close pairs — test is vacuous")
    }
  }

  test("simhash: deterministic, identical texts equal, hamming 0") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "v w x y z"))
      .toDF("id", "t")
    val sigs = df.select($"id", Dedup.simhash($"t").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
    val pairs = Dedup.simhashNearDups(df.withColumnRenamed("t", "text"), "id", "text", 0)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("simhashClusters == connectedComponents over the full pairwise output; " +
      "identical-signature mass collapses before the band join") {
    // the q98 semantic claim: collapsing identical signatures to one
    // representative before pair generation yields the SAME clusters as
    // CC over every doc-level pair, because all doc pairs across two
    // signature groups share one hamming distance
    val rows =
      // a 6-doc identical-text block (one signature group)
      (0 until 6).map(i => (i.toLong, "alpha beta gamma delta epsilon")) ++
      // a near block one word off (should chain to the block above iff
      // within hamming 3 — whichever way, both forms must agree)
      (6 until 9).map(i => (i.toLong, "alpha beta gamma delta zeta")) ++
      // far-away singletons
      Seq((9L, "one two three four five"), (10L, "six seven eight nine ten"))
    val df = rows.toDF("doc_id", "text")
    val viaPairs = Dedup.connectedComponents(
        df.select($"doc_id"), "doc_id",
        Dedup.simhashNearDups(df, "doc_id", "text", 3), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val viaClusters = Dedup.simhashClusters(df, "doc_id", "text", 3)
      .as[(Long, Long)].collect().toMap
    assert(viaClusters === viaPairs)
    // the identical block is one cluster labeled by its min id
    assert((0L until 6L).map(viaClusters).toSet === Set(0L))
    // singletons label themselves
    assert(viaClusters(9L) === 9L && viaClusters(10L) === 10L)
    // output is exactly one row per doc (the linear-output contract)
    assert(Dedup.simhashClusters(df, "doc_id", "text", 3).count() === 11)
  }

  test("simhashCrossGroupEdges == counting doc-level pairs by group " +
      "(fixture + planted multi-group dup families)") {
    // the count-products collapse must reproduce EXACTLY the per-group
    // pair counts of the enumerated doc-pair stream it replaces
    def enumerated(df: org.apache.spark.sql.DataFrame) = {
      val src = df.select(col("doc_id"), col("source"))
      Dedup.simhashNearDups(df, "doc_id", "text", 3)
        .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")),
          "id_a")
        .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")),
          "id_b")
        .filter(col("sa") =!= col("sb"))
        .select(least(col("sa"), col("sb")).as("x"),
          greatest(col("sa"), col("sb")).as("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("w"))
        .as[(String, String, Long)].collect().sorted.toSeq
    }
    def collapsed(df: org.apache.spark.sql.DataFrame) =
      Dedup.simhashCrossGroupEdges(df, "doc_id", "text", "source", 3)
        .as[(String, String, Long)].collect().sorted.toSeq
    val docs = Tables.documents(spark, sf)
    assert(collapsed(docs) === enumerated(docs))
    // planted: two identical-text families spanning three groups plus
    // near-identical variants — exercises both the same-sig product
    // term and the near-sig (band-verified) term
    val planted = (
      (0 until 12).map(i => (i.toLong, s"g${i % 3}", "alpha beta gamma delta epsilon")) ++
      (12 until 20).map(i => (i.toLong, s"g${i % 2}", "alpha beta gamma delta zeta")) ++
      (20 until 24).map(i => (i.toLong, s"g${i % 4}", s"unique text $i payload")))
      .toDF("doc_id", "source", "text")
    val got = collapsed(planted)
    assert(got === enumerated(planted) && got.nonEmpty)
  }

  test("simhashTriangles == Graph.triangleCount over enumerated doc pairs " +
      "(fixture + planted multi-family corpus, blocks parity)") {
    // the group-collapsed closed form must reproduce EXACTLY the
    // per-node (degree, triangles, clustering) of the doc-level wedge
    // join it replaces — on fixture docs and on a planted corpus with
    // two identical-text families, band-verified near variants
    // (exercising the cross-group bipartite + group-triangle terms),
    // and singletons
    def enumerated(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Graph.triangleCount(
        Dedup.simhashNearDups(df, "doc_id", "text", 3), "id_a", "id_b")
        .as[(Long, Long, Long, Option[Double])].collect().sorted.toSeq
    def grouped(df: org.apache.spark.sql.DataFrame, blocks: Int = 1) =
      Dedup.simhashTriangles(df, "doc_id", "text", 3, blocks)
        .as[(Long, Long, Long, Option[Double])].collect().sorted.toSeq
    val docs = Tables.documents(spark, sf)
    assert(grouped(docs) === enumerated(docs))
    val planted = (
      (0 until 10).map(i => (i.toLong, "alpha beta gamma delta epsilon")) ++
      (10 until 16).map(i => (i.toLong, "alpha beta gamma delta zeta")) ++
      (16 until 20).map(i => (i.toLong, s"unique text $i payload")))
      .toDF("doc_id", "text")
    val got = grouped(planted)
    assert(got === enumerated(planted) && got.nonEmpty)
    // the hot-bucket blocks knob is result-invisible here too
    assert(grouped(planted, 4) === got)
    // sanity: the size-10 family alone gives its members >= C(9,2)
    // triangles each
    val tri0 = got.find(_._1 === 0L).get
    assert(tri0._3 >= 36L)
  }

  test("dropDuplicateParagraphs: planted boilerplate dropped at df>maxDf, " +
      "order-preserving reassembly, trim/empty-drop, intra-doc repeats " +
      "count once for df, all-boilerplate and null docs survive as rows") {
    val rows: Seq[(Long, String)] = Seq(
      1L -> "  intro one \n boiler \n body d1 \n boiler ",
      2L -> "boiler\nunique two",
      3L -> "boiler\n\n  \nonly boiler here",
      4L -> "shared x\nunique four",
      5L -> "shared x\nunique five",
      6L -> "boiler")
    val df = (rows.map { case (i, t) => (i, Option(t)) } :+ (7L -> None))
      .toDF("doc_id", "text")
    def run(parts: Int) =
      Dedup.dropDuplicateParagraphs(df.repartition(parts), "doc_id",
        "text", sep = "\n", maxDf = 2)
        .as[(Long, Long, Long, Option[Double], String)].collect().toSeq
    val got = run(4)
    // "boiler" df=4 (docs 1,2,3,6 — d1's intra-doc repeat counts ONCE
    // for df) → dropped at maxDf=2; "shared x" df=2 → kept exactly at
    // the threshold
    assert(got === Seq(
      (1L, 4L, 2L, Some(0.5), "intro one\nbody d1"),
      (2L, 2L, 1L, Some(0.5), "unique two"),
      (3L, 2L, 1L, Some(0.5), "only boiler here"),
      (4L, 2L, 2L, Some(1.0), "shared x\nunique four"),
      (5L, 2L, 2L, Some(1.0), "shared x\nunique five"),
      (6L, 1L, 0L, Some(0.0), ""),
      (7L, 0L, 0L, None, "")))
    assert(run(1) === got && run(7) === got)
  }

  test("simhashTriangles maxWedgeDegree: no-op when the cap doesn't bind; " +
      "a hub signature loses exactly its cross-family edges (brute-force " +
      "reference over the documented semantics)") {
    // a long base text whose one-word variants sit within hamming<=3 of
    // it (probed shape): base adj v8/v13/v21, v8 adj v13/v21 — so base
    // and v8 have group-degree 3 and become hubs at cap=2; the alpha
    // variant and the unique text are isolated. Family sizes > 1
    // exercise the f-terms (internal cliques survive the cap).
    val base = (1 to 24).map(i => s"w$i").mkString(" ")
    def variant(pos: Int, w: String) =
      (1 to 24).map(i => if (i == pos) w else s"w$i").mkString(" ")
    val texts = Seq(base, variant(8, "beta"), variant(13, "gamma"),
      variant(21, "omega"), variant(3, "alpha"), "unique little text payload")
    val famSizes = Seq(4, 3, 2, 3, 2, 1)
    val df = texts.zip(famSizes).zipWithIndex.flatMap { case ((t, n), fi) =>
      (0 until n).map(j => ((fi * 10 + j).toLong, t)) }.toDF("doc_id", "text")
    def run(cap: Int) =
      Dedup.simhashTriangles(df, "doc_id", "text", 3, 1, maxWedgeDegree = cap)
        .as[(Long, Long, Long, Option[Double])].collect().sorted.toSeq
    // driver-side brute force, straight from the documented semantics
    val sigOf = df.select($"doc_id", Dedup.simhash($"text", 64).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val sigs = sigOf.values.toSeq.distinct
    def gdeg(s: Long) = sigs.count(t => t != s && ham(s, t) <= 3)
    def brute(cap: Int): Seq[(Long, Long, Long, Option[Double])] = {
      val hub = sigs.filter(s => cap > 0 && gdeg(s) > cap).toSet
      val ids = sigOf.keys.toSeq.sorted
      def adj(u: Long, v: Long): Boolean = {
        val (su, sv) = (sigOf(u), sigOf(v))
        u != v &&
          (su == sv || (ham(su, sv) <= 3 && !hub(su) && !hub(sv)))
      }
      ids.flatMap { u =>
        val nb = ids.filter(v => adj(u, v))
        val d = nb.size.toLong
        if (d == 0) None
        else {
          val t = (for (i <- nb.indices; j <- i + 1 until nb.size
            if adj(nb(i), nb(j))) yield 1).size.toLong
          val c =
            if (d >= 2) Some(BigDecimal(2.0 * t / (d * (d - 1)).toDouble)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            else None
          Some((u, d, t, c))
        }
      }.sorted
    }
    assert(sigs.exists(s => gdeg(s) > 2), "planted hub shape broke")
    assert(run(2) === brute(2))                 // hub edges dropped exactly
    assert(run(-1) === brute(-1))               // uncapped == full reference
    assert(run(4096) === run(-1))               // default cap never binds here
    // hub families keep their internal cliques: every doc of a size-n>=3
    // hub family still reports clustering 1.0
    val hubFams = sigs.filter(s => gdeg(s) > 2).toSet
    val hubDocClu = run(2).filter(r => hubFams(sigOf(r._1)))
    assert(hubDocClu.nonEmpty && hubDocClu.forall(_._4.contains(1.0)))
  }

  test("block-decomposed band self-join is bit-identical to the plain path " +
      "(pairs and clusters, fixture + planted hot bucket)") {
    // the r12 hot-band-bucket mitigation: every (a, b) pair must be
    // produced exactly once at key (blk(a), blk(b)) — same pairs, same
    // hammings, same clusters as the single-key join, on real fixture
    // docs and on a planted corpus whose identical texts concentrate
    // one band bucket (the regime the decomposition exists for)
    val docs = Tables.documents(spark, sf)
    def pairsOf(blocks: Int) =
      Dedup.simhashNearDups(docs, "doc_id", "text", 3, selfJoinBlocks = blocks)
        .as[(Long, Long, Int)].collect().sorted.toSeq
    assert(pairsOf(8) === pairsOf(1))
    val hot = ((0 until 40).map(i => (i.toLong, "alpha beta gamma delta")) ++
      (40 until 50).map(i => (i.toLong, s"unique text number $i payload")))
      .toDF("doc_id", "text")
    def hotPairs(blocks: Int) =
      Dedup.simhashNearDups(hot, "doc_id", "text", 3, selfJoinBlocks = blocks)
        .as[(Long, Long, Int)].collect().sorted.toSeq
    assert(hotPairs(4) === hotPairs(1))
    assert(hotPairs(1).size >= 40 * 39 / 2) // the hot block really is dense
    def clustersOf(blocks: Int) =
      Dedup.simhashClusters(hot, "doc_id", "text", 3, selfJoinBlocks = blocks)
        .as[(Long, Long)].collect().sorted.toSeq
    assert(clustersOf(4) === clustersOf(1))
  }

  test("sub-band hot-bucket decomposition is bit-identical to the plain " +
      "band join (fixture distinct sigs forced all-hot; planted hot " +
      "bucket of DISTINCT sigs; blocks compose on top)") {
    import org.apache.spark.sql.DataFrame
    def pairs(sigs: DataFrame, blocks: Int, threshold: Int) =
      Dedup.simhashBandPairs(sigs, 3, blocks, threshold)
        .as[(Long, Long, Int)].collect().sorted.toSeq
    // fixture distinct sigs: threshold=1 forces EVERY bucket through
    // the sub-band path; must equal the plain join exactly
    val fixtureSigs = Tables.documents(spark, sf)
      .select($"doc_id".as("doc"),
        Dedup.simhash($"text", 64).as("sig"))
      .groupBy($"sig").agg(min($"doc").as("doc"))
      .select($"doc".as("doc"), $"sig")
      .localCheckpoint()
    val plain = pairs(fixtureSigs, 1, 0)
    assert(plain.nonEmpty)
    assert(pairs(fixtureSigs, 1, 1) === plain)
    assert(pairs(fixtureSigs, 4, 1) === plain)       // blocks compose
    assert(pairs(fixtureSigs, 1, 1000000) === plain) // census, no hubs
    // planted: 300 DISTINCT sigs sharing band 0's value (one hot
    // bucket, pairwise far apart) + a near-dup chain inside it whose
    // diffs live in the upper 48 bits (found only via sub-bands) + a
    // cross-band pair that agrees on a COLD band — the union-dedup
    // seam between the hot and cold streams
    val hotBand = 0x1234L
    val crafted = (
      (0 until 300).map(i =>
        (i.toLong, (i.toLong * 0x9E3779B97F4AL & ~0xFFFFL) | hotBand)) ++
      Seq(
        (1000L, (0x5555L << 16) | hotBand),
        (1001L, ((0x5555L ^ 1L) << 16) | hotBand),          // ham 1
        (1002L, ((0x5555L ^ 3L) << 16) | hotBand),          // ham 2 of 1000
        (2000L, 0x7777000000009999L),
        (2001L, 0x7777000000001111L + (1L << 40))))         // band 3 equal
      .toDF("doc", "sig")
    val cp = pairs(crafted, 1, 0)
    assert(cp.exists(p => p._1 == 1000L && p._2 == 1001L))
    assert(pairs(crafted, 1, 16) === cp)
    assert(pairs(crafted, 4, 16) === cp)
    assert(pairs(crafted, 8, 200) === cp)
  }

  test("clusterSizeProfile: exact size histogram on a planted corpus") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "totally different words entirely unrelated content here"))
      .toDF("doc_id", "text")
    val got = Dedup.clusterSizeProfile(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSeq
    // one singleton cluster (doc 4) + one family of three (docs 1-3)
    assert(got === Seq((1L, 1L, 1L), (3L, 1L, 3L)))
    // doc conservation: histogram masses sum back to the corpus
    assert(got.map(_._3).sum === 4L)
  }

  test("shingle df cap: unchanged below the cap, drops boilerplate shingles above it") {
    // fixture dfs are far below 50, so the capped plan must reproduce
    // the exact output (backs the q22/q47 unchanged-hash requirement)
    val docs = Tables.documents(spark, sf)
    val plain = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", 3, 0.5)
      .as[(String, Long, Long, Double)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", 3, 0.5,
      maxShingleDf = 50)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(capped === plain)
    // synthetic hot shingle: boilerplate prefix shared by every doc is
    // the only overlap between docs 1 and 2 — the cap removes it, so the
    // pair disappears instead of exploding the (grp, shingle) join
    val boiler = "subscribe to our newsletter now"
    val syn = Seq(
      (1L, s"$boiler unique one text body"),
      (2L, s"$boiler wholly different words here"),
      (3L, s"$boiler unique one text body")).toDF("id", "text")
      .withColumn("g", lit("g"))
    val un = Dedup.ngramJaccardPairs(syn, "id", "text", "g", 3, 0.2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val cap = Dedup.ngramJaccardPairs(syn, "id", "text", "g", 3, 0.2, maxShingleDf = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(un.contains((1L, 2L)))       // boilerplate alone fakes similarity
    assert(!cap.contains((1L, 2L)))     // cap kills the fake pair
    assert(cap.contains((1L, 3L)))      // true duplicates survive the cap
  }

  test("fixture near-dups: LSH pairs are verified (j>=0.8) and recover same-source exact pairs") {
    val docs = Tables.documents(spark, sf)
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text",
      shingleK = 3, nBands = 8, rowsPerBand = 2, jaccardThreshold = 0.8)
    // every emitted pair survived the exact-jaccard verify step
    assert(lsh.filter($"jaccard" < 0.8).count() === 0)
    // LSH searches ALL pairs (cross-source included); the same-source
    // exact query must be recovered in full (identical/near-identical
    // shingle sets always agree on every minhash → always banded).
    val lshPairs = lsh.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", 3, 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert((exact -- lshPairs).isEmpty, s"LSH missed: ${exact -- lshPairs}")
  }

  private def runCC(n: Long, edges: Seq[(Long, Long)],
      maxIter: Int = 30, collectEdgeLimit: Long = 1000000L): Map[Long, Long] = {
    val nodes = spark.range(n).toDF("id")
    val pairs = edges.toDF("id_a", "id_b")
    Dedup.connectedComponents(nodes, "id", pairs, maxIter = maxIter,
        collectEdgeLimit = collectEdgeLimit)
      .as[(Long, Long)].collect().toMap
  }

  test("duplicatedSpans: hand-planted shared windows, exact counts") {
    import graft.operators.Dedup
    // k=5: doc 1 and 2 share the run "ABCDEFGH" (4 distinct 5-spans);
    // doc 3 is all-unique; doc 4 too short; doc 5 duplicates doc 3.
    val docs = Seq(
      (1L, "ABCDEFGHxyzw"), // spans: 8 total, 4 shared with doc 2
      (2L, "qqABCDEFGHpp"),
      (3L, "0123456789"),
      (4L, "abc"),
      (5L, "0123456789"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 5)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc1: 12 chars -> 8 spans, shared = ABCDE,BCDEF,CDEFG,DEFGH = 4
    // doc3/doc5: 6 spans each, all 6 shared (exact dup)
    assert(got === Seq(
      (1L, 8L, 4L, 0.5),
      (2L, 8L, 4L, 0.5),
      (3L, 6L, 6L, 1.0),
      (5L, 6L, 6L, 1.0)))
    // fixture differential: operator == an in-memory brute force
    val fx = Tables.documents(spark, sf)
    val texts = fx.filter($"text".isNotNull && length($"text") >= 32)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val spanSets = texts.map { case (id, t) =>
      id -> (0 to t.length - 32).map(i => t.substring(i, i + 32)).toSet
    }
    val dfreq = spanSets.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val expect = spanSets.map { case (id, ss) =>
      (id, ss.size.toLong, ss.count(dfreq(_) >= 2).toLong)
    }.sortBy(_._1).toSeq
    val fxGot = Dedup.duplicatedSpans(fx, "doc_id", "text", 32)
      .orderBy($"doc_id")
      .select($"doc_id", $"total_spans", $"dup_spans")
      .as[(Long, Long, Long)].collect().toSeq
    assert(fxGot === expect)
  }

  test("duplicatedSpans: texts shorter than k are excluded; empty input is empty") {
    import graft.operators.Dedup
    val short = Seq((1L, "abc"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(short, "doc_id", "text", 5).count() === 0)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(empty, "doc_id", "text", 5).count() === 0)
  }

  test("duplicatedSpans: the guarded plan is bit-identical and carries " +
      "no list aggregate (the single-executor-OOM shape is gone)") {
    import graft.operators.Dedup
    // boilerplate regime: ONE 32-char span (license-header-style) is
    // planted in EVERY doc — in the default plan its collect_list
    // group is corpus-sized (the r9 100 TB OOM finding); the guarded
    // plan must produce the identical result with NO list aggregate
    // anywhere (count-agg + sort-merge rejoin — every group a scalar).
    val boiler = "ALL RIGHTS RESERVED (C) 2026 CO." // exactly 32 chars
    assert(boiler.length === 32)
    val docs = Tables.documents(spark, sf)
      .filter($"text".isNotNull)
      .select($"doc_id", concat($"text", lit(" " + boiler)).as("text"))
    val uncapped = Dedup.duplicatedSpans(docs, "doc_id", "text", 32)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val guardedDf = Dedup.duplicatedSpans(docs, "doc_id", "text", 32,
      boundedPlan = true)
    val guarded = guardedDf.orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(guarded === uncapped)
    // the safety property itself, asserted on the plan: no group in
    // the guarded plan accumulates a list, so no span's duplication
    // factor — however hot — can blow up a single task's memory
    val plan = guardedDf.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), plan.take(3000))
    assert(plan.contains("SortMergeJoin"), plan.take(3000))
    // and the default plan IS the list shape (the contrast that makes
    // the assertion meaningful)
    val defaultPlan = Dedup.duplicatedSpans(docs, "doc_id", "text", 32)
      .queryExecution.executedPlan.toString
    assert(defaultPlan.contains("collect_list"), defaultPlan.take(3000))
  }

  test("keepFirst: drops exactly the larger side of every pair; " +
      "composes with capped and uncapped pair streams identically " +
      "to the inline left-anti") {
    import graft.operators.Dedup
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"), (6L, "d"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.keepFirst(docs, "doc_id", pairs)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 4L))
    // fixture composition: keepFirst(capped pairs) == the inline
    // left-anti over the same stream (the production q47 shape)
    val fx = Tables.documents(spark, sf)
    val capped = Dedup.ngramJaccardPairs(fx, "doc_id", "text", "source",
      3, 0.5, maxShingleDf = 64)
    val viaOp = Dedup.keepFirst(fx, "doc_id", capped)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val inline = fx.join(
        capped.select($"id_b".as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(viaOp === inline)
    assert(viaOp.nonEmpty)
  }

  test("connected components: transitive chain collapses to one cluster") {
    // A~B, B~C but A!~C — the case pairwise keep-first cannot handle
    val cc = runCC(5, Seq((1L, 2L), (2L, 3L)))
    assert(cc === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("connected components: long path converges via pointer jumping") {
    // 64-node path: diameter 63, but pointer jumping needs O(log n)
    // rounds — 15 would time out plain min-propagation (63 rounds).
    // collectEdgeLimit = -1 pins the DISTRIBUTED loop (the default
    // would take the small-graph union-find path here).
    val path = (0L until 63L).map(i => (i, i + 1))
    val cc = runCC(64, path, maxIter = 15, collectEdgeLimit = -1L)
    assert(cc.values.toSet === Set(0L))
  }

  test("connected components: driver union-find path == distributed loop") {
    // same chained+isolated graph through both paths — the adaptive
    // switch must be invisible in the result
    val rnd = new scala.util.Random(7)
    val edges = (0L until 40L).map(i => (i, i + 1)) ++          // long chain
      Seq.fill(60)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .filter { case (a, b) => a != b }
    val viaDriver = runCC(220, edges)                            // under the cap
    val viaLoop = runCC(220, edges, collectEdgeLimit = -1L)      // forced loop
    assert(viaDriver === viaLoop)
  }

  test("connected components equal a union-find baseline on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 200L
    val edges = Seq.fill(120)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    // in-test union-find oracle
    val parent = Array.tabulate(n.toInt)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = (0 until n.toInt).map(i => i.toLong -> find(i).toLong).toMap
    assert(runCC(n, edges) === expect)
  }

  test("keepBest: highest quality wins per cluster, min-id tiebreak, " +
      "singletons pass, quality above 1e6 still orders") {
    // two identical-text families + singletons; quality = n_chars-like
    // longs (exceeding the 1e6 lift base — the composite key must stay
    // monotone there too)
    val docs = (
      Seq((0L, "alpha beta gamma delta epsilon", 100.0),
          (1L, "alpha beta gamma delta epsilon", 900.0),
          (2L, "alpha beta gamma delta epsilon", 900.0),
          (10L, "unique text ten payload", 5.0),
          (11L, "other unique eleven payload", 7.0)))
      .toDF("doc_id", "text", "q")
    val got = graft.operators.Dedup.keepBest(docs, "doc_id", "text", "q")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val fam = got.find(_._2 == 3L).get
    // quality 900 beats 100; tie between 1 and 2 -> min id 1
    assert(fam._3 == 1L && fam._4 == 900.0)
    val singles = got.filter(_._2 == 1L)
    assert(singles.map(r => (r._3, r._4)).toSet ==
      Set((10L, 5.0), (11L, 7.0)))
    // doc conservation: sizes sum to the corpus
    assert(got.map(_._2).sum == 5L)
    // partition independence
    val p1 = graft.operators.Dedup.keepBest(docs.repartition(1), "doc_id",
      "text", "q").collect().toSeq
    val p7 = graft.operators.Dedup.keepBest(docs.repartition(7), "doc_id",
      "text", "q").collect().toSeq
    assert(p1 == p7)
  }

  test("winnowingFingerprints == an independent brute-force winnower; " +
    "the w+k-1 shared-substring guarantee holds; density bounds; " +
    "partition independence") {
    import spark.implicits._
    val k = 8
    val w = 4
    // independent reference: plain Scala + MessageDigest (no code
    // shared with the operator)
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    def brute(text: String): Set[(Int, String)] = {
      val hs = (1 to text.length - k + 1)
        .map(i => i -> md5hex(text.substring(i - 1, i - 1 + k)))
      (1 to hs.length - w + 1).map { j =>
        // minimal hash in window, ties -> RIGHTMOST
        hs.slice(j - 1, j - 1 + w)
          .minBy { case (i, h) => (h, -i) }
      }.toSet
    }
    val shared = "the-shared-run-of-text-here!"  // length 28 >= w+k-1
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, s"completely different prefix $shared and a different tail"),
      (3L, s"zzz $shared yyy unrelated words follow here now"),
      (4L, "aaaaaaaaaaaaaaaaaaaaaaaa"))  // degenerate: all grams equal
    val df = docs.toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .winnowingFingerprints(df, "doc_id", "text", k, w)
      .as[(Long, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    for ((id, text) <- docs) {
      val ref = brute(text)
      val refFps = ref.map(_._2)
      val g = got(id)
      assert(g._2 === (text.length - k + 1).toLong, s"n_grams doc $id")
      assert(g._3 === ref.size.toLong, s"n_selected doc $id")
      assert(g._4 === refFps.size.toLong, s"n_distinct_fps doc $id")
      assert(g._5 === refFps.min && g._6 === refFps.max, s"fp range doc $id")
      // density: between 1/w and 1 of the windows
      assert(g._3 >= 1L && g._3 <= (g._2 - w + 1))
    }
    // guarantee: docs 2 and 3 share a >= w+k-1 substring → their
    // selected fingerprint SETS intersect (the MOSS property)
    val fps = (id: Long) => brute(docs.find(_._1 == id).get._2).map(_._2)
    assert(fps(2L).intersect(fps(3L)).nonEmpty)
    // degenerate doc 4: one distinct gram → exactly one fingerprint
    assert(got(4L)._4 === 1L)
    // partition independence
    val a = graft.operators.Dedup
      .winnowingFingerprints(df.repartition(1), "doc_id", "text", k, w)
      .collect().toSeq
    val b = graft.operators.Dedup
      .winnowingFingerprints(df.repartition(5), "doc_id", "text", k, w)
      .collect().toSeq
    assert(a === b)

    // winnowedNearDups == the brute-force shared-fingerprint count
    // (cap never binds at 4 docs); docs 2/3 share the planted run
    val pairs = graft.operators.Dedup
      .winnowedNearDups(df, "doc_id", "text", k, w,
        maxFpDf = 64, minShared = 1)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for (i <- docs.map(_._1); j <- docs.map(_._1) if i < j) {
      val expect = fps(i).intersect(fps(j)).size.toLong
      assert(pairs.getOrElse((i, j), 0L) === expect, s"pair ($i,$j)")
    }
    assert(pairs((2L, 3L)) >= 1L)
    // the threshold drops weak pairs
    val strong = graft.operators.Dedup
      .winnowedNearDups(df, "doc_id", "text", k, w, 64,
        minShared = (pairs((2L, 3L)) + 1).toInt)
      .as[(Long, Long, Long)].collect()
    assert(!strong.exists(r => r._1 == 2L && r._2 == 3L))
  }

  test("editDistancePairs (q173): exact banded-levenshtein verify behind " +
    "prefix/suffix blocking; either-end blocking contract; block-df cap; " +
    "partition independence") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      1L -> base,
      2L -> base,                                     // dist 0 (both keys)
      3L -> base.replace("quick", "quikc"),           // small edit mid-prefix?
      4L -> base.replace("jumps", "jumped"),          // middle edit: both keys hold
      5L -> ("XYZ " + base.drop(4)),                  // prefix edited -> suffix key pairs it
      6L -> (base.dropRight(7) + "at dawn"),          // suffix edited -> prefix key pairs it
      7L -> ("AAA " + base.drop(4).dropRight(7) + "at dusk"), // BOTH ends edited -> blocked out
      8L -> "completely unrelated text that matches nothing else here")
    val df = docs.toDF("doc_id", "text")
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    val maxDist = 8
    val got = graft.operators.Dedup
      .editDistancePairs(df, "doc_id", "text", maxDist, 16, 256)
      .as[(Long, Long, Int)].collect().toSeq
    // independent reference: all pairs sharing a 16-prefix or 16-suffix
    val ref = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      if ta.take(16) == tb.take(16) ||
        ta.reverse.take(16) == tb.reverse.take(16)
      d = lev(ta, tb) if d <= maxDist
    } yield (ia, ib, d)).sorted
    assert(got.sorted === ref)
    assert(got.exists(t => t._1 == 1L && t._2 == 2L && t._3 == 0))
    assert(got.exists(t => t._1 == 1L && t._2 == 5L), "suffix key must pair 5")
    assert(got.exists(t => t._1 == 1L && t._2 == 6L), "prefix key must pair 6")
    assert(!got.exists(t => t._2 == 7L || t._1 == 7L),
      "both-ends-edited doc is outside the blocking contract")
    assert(!got.exists(t => t._1 == 8L || t._2 == 8L))
    // block-df cap: with maxBlockDf = 1 every block is hot -> no pairs
    assert(graft.operators.Dedup
      .editDistancePairs(df, "doc_id", "text", maxDist, 16, 1).isEmpty)
    // partition independence
    val p1 = graft.operators.Dedup
      .editDistancePairs(df.repartition(1), "doc_id", "text", maxDist, 16, 256)
      .collect().toSeq
    val p7 = graft.operators.Dedup
      .editDistancePairs(df.repartition(7), "doc_id", "text", maxDist, 16, 256)
      .collect().toSeq
    assert(p1.map(_.toString) === p7.map(_.toString))
  }

  test("winnowing short-document contract (r17): a doc with 1 <= np < w " +
    "gets ONE truncated whole-doc window (min hash, ties rightmost); " +
    "docs shorter than k chars stay outside the fingerprint domain") {
    import spark.implicits._
    val k = 8
    val w = 4
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    // np = len - 7: "tweetlen" -> np 1; "tweet-len!" -> np 3; "short" -> 0
    val docs = Seq(
      (1L, "tweetlen"),            // np = 1: single gram, one fingerprint
      (2L, "tweet-len!"),          // np = 3 < w: truncated window over all
      (3L, "short"),               // len < k: no k-gram, absent
      (4L, "a full-length document that clears k+w-1 comfortably"))
    val df = docs.toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .winnowingFingerprints(df, "doc_id", "text", k, w)
      .as[(Long, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(!got.contains(3L), "sub-k doc must be absent")
    // doc 1: exactly its single gram's hash
    assert(got(1L)._2 === 1L && got(1L)._3 === 1L)
    assert(got(1L)._5 === md5hex("tweetlen"))
    // doc 2: one selection = the min hash over ALL np grams (rightmost tie)
    val grams2 = (1 to 3).map(i => i -> md5hex("tweet-len!".substring(i - 1, i + 7)))
    val want2 = grams2.minBy { case (i, h) => (h, -i) }._2
    assert(got(2L)._2 === 3L && got(2L)._3 === 1L && got(2L)._5 === want2)
    assert(got(2L)._5 === got(2L)._6)
    // short docs participate in matching: two identical short texts
    // (np < w -> one truncated-window fingerprint each) pair up
    val tw = Seq((10L, "tweet-len!"), (11L, "tweet-len!"))
      .toDF("doc_id", "text")
    val p = graft.operators.Dedup
      .winnowedNearDups(tw, "doc_id", "text", k, w, 64, minShared = 1)
      .as[(Long, Long, Long)].collect()
    assert(p.toSeq === Seq((10L, 11L, 1L)))
  }

  test("sharedSubstringPairs: brute-force reference on planted overlaps; " +
    "the df cap drops boilerplate grams; exact-substring guarantee; " +
    "partition independence") {
    val rng = new scala.util.Random(7)
    def rnd(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar)
      .mkString
    val base = rnd(80)
    val boiler = rnd(32) // planted in MORE than maxGramDf docs
    val docs = Seq(
      (1L, base),                              // full base
      (2L, base.substring(0, 50) + rnd(30)),   // 50-char shared prefix
      (3L, rnd(80)),                           // unrelated
      (4L, base),                              // exact dup of 1
      (5L, rnd(10))                            // below minLen — no grams
    ) ++ (100L until 170L).map(i => (i, boiler + rnd(20)))
    val df = docs.toDF("doc_id", "text")
    val minLen = 32
    val cap = 64

    // independent brute force over the documented semantics
    val grams = docs.filter(_._2.length >= minLen).map { case (id, t) =>
      id -> (0 to t.length - minLen).map(i => t.substring(i, i + minLen))
        .toSet
    }.toMap
    val gramDf = grams.values.flatten.groupBy(identity)
      .map { case (g, os) => g -> os.size }
    val keptG = grams.map { case (id, gs) =>
      id -> gs.filter(g => gramDf(g) <= cap)
    }
    val expected = (for {
      a <- keptG.keys; b <- keptG.keys if a < b
      n = keptG(a).intersect(keptG(b)).size if n >= 1
    } yield (a, b, n.toLong)).toSet

    val got = Dedup.sharedSubstringPairs(df, "doc_id", "text", minLen,
        cap, minShared = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected)
    // the 50-char prefix pair shares exactly 50-32+1=19 grams; the
    // exact dup shares all 80-32+1=49
    assert(got.contains((1L, 2L, 19L)) && got.contains((1L, 4L, 49L)))
    // the boilerplate gram sits in 70 > 64 docs: with it counted,
    // EVERY boiler pair (C(70,2) = 2415) would match; the cap leaves
    // only the pairs that share some other (uncapped) gram
    val boilerPairs = got.count(t => t._1 >= 100L && t._2 >= 100L)
    assert(boilerPairs < 70 * 69 / 2)
    val uncapped = Dedup.sharedSubstringPairs(df, "doc_id", "text",
        minLen, maxGramDf = 1000000, minShared = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(uncapped.count(t => t._1 >= 100L && t._2 >= 100L) ===
      70 * 69 / 2)
    // partition independence
    val got3 = Dedup.sharedSubstringPairs(df.repartition(3), "doc_id",
        "text", minLen, cap, 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got3 === got)
  }

  test("containmentPairs: a quoted excerpt scores contain≈1 where " +
    "jaccard misses it; brute-force reference; cap semantics; " +
    "partition independence") {
    val rng = new scala.util.Random(11)
    def rndWords(n: Int) =
      (0 until n).map(_ => "w" + rng.nextInt(5000)).mkString(" ")
    val long = rndWords(200)
    val quote = long.split(" ").slice(50, 70).mkString(" ") // 20 words
    val docs = Seq(
      (1L, long),
      (2L, quote),              // excerpt of 1 — containment, not jaccard
      (3L, rndWords(200)),      // unrelated
      (4L, long)                // exact dup of 1
    )
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", 3, 0.5,
        maxShingleDf = Int.MaxValue)
      .as[(Long, Long, Double, Double)].collect().toSeq

    // brute force over the documented semantics
    def sh(t: String) = {
      val ws = t.split("\\s+").toSeq
      (if (ws.length < 3) Seq(ws.mkString(" "))
       else ws.sliding(3).map(_.mkString(" ")).toSeq).distinct.toSet
    }
    val m = docs.map { case (id, t) => id -> sh(t) }.toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (for {
      a <- m.keys; b <- m.keys if a < b
      inter = m(a).intersect(m(b)).size
      cab = r6(inter.toDouble / m(a).size)
      cba = r6(inter.toDouble / m(b).size)
      if math.max(cab, cba) >= 0.5
    } yield (a, b, cab, cba)).toSeq.sortBy(t => (t._1, t._2))
    assert(got === expected)
    // the quote is contained (direction b-in-a reads 1.0) while its
    // jaccard vs the long doc is far below the 0.5 bar
    assert(got.exists(t => t._1 == 1L && t._2 == 2L && t._4 === 1.0))
    val jac = m(1L).intersect(m(2L)).size.toDouble /
      (m(1L).size + m(2L).size - m(1L).intersect(m(2L)).size)
    assert(jac < 0.5)
    // the exact dup reads 1.0 both ways
    assert(got.exists(t => t._1 == 1L && t._2 == 4L &&
      t._3 === 1.0 && t._4 === 1.0))
    // cap: a boilerplate shingle in > cap docs leaves the capped sets
    val manyDocs = docs ++ (100L until 110L).map(i =>
      (i, quote + " " + rndWords(30)))
    val capped = Dedup.containmentPairs(manyDocs.toDF("doc_id", "text"),
        "doc_id", "text", 3, 0.5, maxShingleDf = 5)
      .as[(Long, Long, Double, Double)].collect().toSeq
    // quote shingles now sit in 12 > 5 docs -> dropped from the sets;
    // doc 2 (pure quote) loses its whole set and pairs vanish for it
    assert(!capped.exists(t => t._1 == 2L || t._2 == 2L))
    // partition independence
    val got3 = Dedup.containmentPairs(df.repartition(3), "doc_id",
        "text", 3, 0.5, maxShingleDf = Int.MaxValue)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got3 === got)
  }

  test("nearDupLinkPrediction: brute-force reference over the documented " +
      "group-graph semantics (fixture + planted), the degree cap binds, " +
      "blocks and partitioning invariant") {
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def brute(df: org.apache.spark.sql.DataFrame, cap: Int)
        : Seq[(Long, Long, Long, Double)] = {
      val sigRep = df.filter($"text".isNotNull)
        .select($"doc_id", Dedup.simhash($"text", 64).as("sig"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val reps = sigRep.groupBy(_._2).map { case (s, xs) =>
        (s, xs.map(_._1).min) }
      def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
      val nodes = reps.keys.toSeq.sorted
      val edges = (for {
        i <- nodes.indices; j <- i + 1 until nodes.size
        if ham(nodes(i), nodes(j)) <= 3
      } yield Set(nodes(i), nodes(j))).toSet
      def nbrs(u: Long) = nodes.filter(v => v != u && edges(Set(u, v)))
      val cands = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
      for (u <- nodes) {
        val nb = nbrs(u); val d = nb.size
        if (d >= 2 && (cap <= 0 || d <= cap)) {
          val t = (r6(1.0 / math.log(d.toDouble)) * 1000000).toLongExact
          for (i <- nb.indices; j <- i + 1 until nb.size
               if !edges(Set(nb(i), nb(j)))) {
            val key = (math.min(reps(nb(i)), reps(nb(j))),
              math.max(reps(nb(i)), reps(nb(j))))
            val (c0, s0) = cands.getOrElse(key, (0L, 0L))
            cands(key) = (c0 + 1, s0 + t)
          }
        }
      }
      cands.toSeq.map { case ((ra, rb), (cn, aa6)) =>
        (ra, rb, cn, r6(aa6.toDouble / 1e6).toDouble)
      }.sortBy(x => (x._1, x._2))
    }
    def run(df: org.apache.spark.sql.DataFrame, cap: Int, blocks: Int = 1) =
      Dedup.nearDupLinkPrediction(df, "doc_id", "text", 3, blocks, cap)
        .as[(Long, Long, Long, Double)].collect().toSeq
    // planted: a base text with three one-word variants (the triangles
    // hub shape) — guaranteed wedges; two-doc families exercise reps
    val base = (1 to 24).map(i => s"w$i").mkString(" ")
    def variant(pos: Int, w: String) =
      (1 to 24).map(i => if (i == pos) w else s"w$i").mkString(" ")
    val texts = Seq(base, variant(8, "beta"), variant(13, "gamma"),
      variant(21, "omega"), "unique little text payload")
    val planted = texts.zipWithIndex.flatMap { case (t, fi) =>
      Seq(((fi * 10).toLong, t), ((fi * 10 + 1).toLong, t)) }
      .toDF("doc_id", "text")
    val gp = run(planted, 128)
    assert(gp === brute(planted, 128) && gp.nonEmpty)
    // the cap binds: capping at 2 removes the degree-3 centers
    val gc = run(planted, 2)
    assert(gc === brute(planted, 2) && gc != gp)
    // fixture parity + blocks/partitioning invariance
    val docs = Tables.documents(spark, sf)
    val gf = run(docs, 128)
    assert(gf === brute(docs, 128))
    assert(run(docs, 128, 8) === gf)
    assert(run(docs.repartition(7), 128) === gf)
  }

  test("simhashCores: group-quotient peel == doc-level Batagelj-Zaversnik " +
      "brute force (fixture + planted families); blocks/partitioning " +
      "invariant") {
    def brute(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
      val sigOf = df.filter($"text".isNotNull)
        .select($"doc_id", Dedup.simhash($"text", 64).as("sig"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
      val ids = sigOf.keys.toSeq.sorted
      val adj = ids.map { u =>
        u -> ids.filter(v => v != u &&
          (sigOf(u) == sigOf(v) || ham(sigOf(u), sigOf(v)) <= 3))
      }.toMap
      val cur = scala.collection.mutable.Map(
        ids.map(d => d -> adj(d).size.toLong): _*)
      val heap = scala.collection.mutable.PriorityQueue(
        ids.map(d => (cur(d), d)): _*)(
        Ordering.by[(Long, Long), (Long, Long)](x => (-x._1, -x._2)))
      val removed = scala.collection.mutable.Set.empty[Long]
      val core = scala.collection.mutable.Map.empty[Long, Long]
      var kmax = 0L
      while (heap.nonEmpty) {
        val (d, g) = heap.dequeue()
        if (!removed(g) && cur(g) == d) {
          kmax = math.max(kmax, d); core(g) = kmax; removed += g
          for (h <- adj(g) if !removed(h)) {
            val nd = math.max(cur(h) - 1, kmax)
            if (nd != cur(h)) { cur(h) = nd; heap.enqueue((nd, h)) }
          }
        }
      }
      ids.map(d => (d, core(d)))
    }
    def run(df: org.apache.spark.sql.DataFrame, blocks: Int = 1) =
      Dedup.simhashCores(df, "doc_id", "text", 3, blocks)
        .as[(Long, Long)].collect().toSeq
    // planted: one 10-doc identical family (9-core clique), a linked
    // 6-doc variant family, singletons
    val planted = (
      (0 until 10).map(i => (i.toLong, "alpha beta gamma delta epsilon")) ++
      (10 until 16).map(i => (i.toLong, "alpha beta gamma delta zeta")) ++
      (16 until 20).map(i => (i.toLong, s"unique text $i payload")))
      .toDF("doc_id", "text")
    val gp = run(planted)
    assert(gp === brute(planted) && gp.exists(_._2 >= 9))
    val docs = Tables.documents(spark, sf)
    val gf = run(docs)
    assert(gf === brute(docs))
    assert(run(docs, 8) === gf)
    assert(run(docs.repartition(7)) === gf)
  }
}
