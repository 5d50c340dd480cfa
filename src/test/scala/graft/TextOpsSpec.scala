package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount: empty → 0 (reference guard), whitespace runs collapse") {
    val df = Seq("", "  ", "a", "a  b\tc", " x y ").toDF("t")
      .select($"t", TextOps.tokenCount($"t").as("n"))
    val m = df.as[(String, Int)].collect().toMap
    assert(m("") === 0 && m("  ") === 0 && m("a") === 1 && m("a  b\tc") === 3 && m(" x y ") === 2)
  }

  test("bpeTokenEstimate: ceil(len/4) per word") {
    val n = Seq(Tuple1("abcd abcde a")).toDF("t")
      .select(TextOps.bpeTokenEstimate($"t")).as[Int].head()
    assert(n === 1 + 2 + 1)
  }

  test("chunkCount ceil-div matches reference formula") {
    val out = Seq(0, 1, 384, 385, 768, 769).toDF("n")
      .select($"n", TextOps.chunkCount($"n", 384).as("c")).as[(Int, Int)]
      .collect().toMap
    assert(out === Map(0 -> 0, 1 -> 1, 384 -> 1, 385 -> 2, 768 -> 2, 769 -> 3))
  }

  test("langId picks densest stopword language, 'und' when none") {
    val df = Seq(
      "the cat is in the house and it is big",
      "le chat est dans la maison et il est un",
      "el gato es un animal y la casa es que",
      "der hund ist ein tier und die katze ist zu",
      "zzz qqq www rrr").toDF("t")
      .select($"t", TextOps.langId($"t").as("l"))
    val m = df.as[(String, String)].collect().toMap
    assert(m.values.toSeq.count(_ == "und") === 1)
    assert(m("the cat is in the house and it is big") === "en")
    assert(m("le chat est dans la maison et il est un") === "fr")
    assert(m("el gato es un animal y la casa es que") === "es")
    assert(m("der hund ist ein tier und die katze ist zu") === "de")
    assert(m("zzz qqq www rrr") === "und")
  }

  test("fingerprint: deterministic, order-sensitive, bounded") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "c b a")).toDF("id", "t")
      .select($"id", TextOps.fingerprint(TextOps.words($"t")).as("fp"))
    val m = df.as[(Long, Long)].collect().toMap
    assert(m(1L) === m(2L))
    assert(m(1L) !== m(3L)) // order matters
    assert(m.values.forall(v => v >= 0 && v < 1000000007L))
  }

  test("textStats kernel == HOF counts on the fixture corpus") {
    val enStop = TextOps.stopwords("en")
    val ws = TextOps.words(lower($"text"))
    val kernel = Tables.documents(spark, sf).select(
      $"doc_id",
      TextOps.textStats(ws, Seq(enStop)).as("ts"))
      .select($"doc_id",
        $"ts".getField("n_words").as("n"),
        element_at($"ts".getField("hits"), 1).as("hits"),
        $"ts".getField("alpha_hits").as("alpha"))
    val hof = Tables.documents(spark, sf).select(
      $"doc_id",
      size(ws).as("n"),
      size(filter(ws, w => w.isInCollection(enStop))).as("hits"),
      size(filter(ws, w => w.rlike("^[a-z]+$"))).as("alpha"))
    assert(kernel.exceptAll(hof).isEmpty && hof.exceptAll(kernel).isEmpty)
  }

  test("textStats alpha byte-test matches the regex on unicode/mixed words") {
    val df = Seq("abc", "aBc", "", "a1b", "héllo", "的了", "z", "hello-world").toDF("w")
      .select(array($"w").as("ws"))
      .select(
        $"ws".getItem(0).as("w"),
        TextOps.textStats($"ws", Nil).getField("alpha_hits").as("k"),
        size(filter($"ws", w => w.rlike("^[a-z]+$"))).as("h"))
    assert(df.filter($"k" =!= $"h").count() === 0)
  }

  test("bpe + fingerprint kernels == HOF folds on the fixture corpus") {
    val docs = Tables.documents(spark, sf)
    val cmp = docs.select(
      TextOps.bpeTokenEstimate($"text").as("bk"),
      TextOps.bpeTokenEstimateHof($"text").as("bh"),
      TextOps.fingerprint(TextOps.words($"text")).as("fk"),
      TextOps.fingerprintHof(TextOps.words($"text")).as("fh"))
    assert(cmp.filter($"bk" =!= $"bh" || $"fk" =!= $"fh").count() === 0)
  }

  test("quality score formula is bounded in [0, 1]") {
    val docs = Tables.documents(spark, sf)
    val out = SparkEntry.queries("q17_quality_score")(spark, sf)
    val bad = out.filter($"score" < 0.0 || $"score" > 1.0).count()
    assert(bad === 0 && out.count() === docs.count())
  }
}
