package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Chunker, Similarity}
import graft.sources.Formats

class FormatsAndTypedSpec extends SparkSpec {
  import spark.implicits._

  test("typed chunker flatMap equals the column chunker") {
    val docs = Tables.documents(spark, sf)
    val typed = Chunker.chunkTyped(spark,
      docs.select($"doc_id", $"text").as[(Long, String)],
      idealTokens = 32, chunkWords = 24)
      .collect().map(c => (c.doc_id, c.chunk_id) -> (c.chunk_text, c.chunk_tokens)).toMap
    val columnar = Chunker.chunk(docs, "text", idealTokens = 32, chunkWords = 24)
      .select($"doc_id", $"chunk_id", $"chunk_text", $"chunk_tokens")
      .as[(Long, Int, String, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(typed === columnar)
  }

  test("csv and json round-trip the documents table") {
    val docs = Tables.documents(spark, sf)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"text", $"lang", $"source", $"n_chars")
        .as[(Long, String, String, String, Long)].collect().sorted.toSeq
    val csvDir = Files.createTempDirectory("graft_csv").toString + "/docs"
    Formats.writeCsv(docs, csvDir)
    assert(key(Formats.readCsv(spark, csvDir, docs.schema)) === key(docs))
    val jsonDir = Files.createTempDirectory("graft_json").toString + "/docs"
    Formats.writeJson(docs, jsonDir)
    assert(key(Formats.readJson(spark, jsonDir, docs.schema)) === key(docs))
    val orcDir = Files.createTempDirectory("graft_orc").toString + "/docs"
    Formats.writeOrc(docs, orcDir)
    assert(key(Formats.readOrc(spark, orcDir)) === key(docs))
    // ORC scans push filters like parquet (the reason to offer it)
    val plan = Formats.readOrc(spark, orcDir).filter($"doc_id" === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.split("PushedFilters")(1).contains("doc_id"), plan)
  }

  test("Tables.events normalizes every shipped ts physical type to the same instants") {
    // the driver has regenerated events.parquet with different writers
    // across rounds — TIMESTAMP(NANOS) (reads as long under the legacy
    // flag), TIMESTAMP(MICROS) NTZ (isAdjustedToUTC=false), and plain
    // TIMESTAMP (LTZ, what gen_scale_fixtures emits). Whatever the
    // physical type, Tables.events must surface identical session-UTC
    // instants, or every unix_millis/watermark caller silently shifts.
    val micros = Seq(0L, 1_700_000_000_123_456L, 1_700_003_600_000_000L)
    def readBack(writeAs: String): Seq[Long] = {
      val dir = Files.createTempDirectory(s"graft_ev_$writeAs").toString
      val df = writeAs match {
        case "ltz" =>
          micros.toDF("us").select(timestamp_micros($"us").as("ts"))
        case "ntz" =>
          micros.toDF("us").select(
            timestamp_micros($"us").cast("timestamp_ntz").as("ts"))
      }
      df.write.parquet(dir + "/events.parquet")
      Tables.events(spark, dir)
        .select(unix_micros($"ts")).as[Long].collect().sorted.toSeq
    }
    assert(readBack("ltz") === micros)
    assert(readBack("ntz") === micros)
    // the NANOS path cannot be written by Spark; its normalization is
    // the `LongType -> timestamp_micros(ns div 1000)` branch, asserted
    // arithmetically on the same instants
    val viaNanos = micros.map(_ * 1000L).toDF("ts")
      .select(unix_micros(timestamp_micros(expr("ts div 1000"))))
      .as[Long].collect().sorted.toSeq
    assert(viaNanos === micros)
  }

  test("IVF ANN: sims exact for emitted pairs, per-probe top-k shape") {
    val e = Tables.embeddings(spark, sf)
    val probes = e.filter($"vec_id" < 3)
    val corpus = e.filter($"vec_id" >= 3)
    val out = Similarity.ivfJoin(probes, corpus, "vec_id", "vec_id", "embedding",
      k = 5, nList = 8, nProbe = 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.nonEmpty)
    val byProbe = out.groupBy(_._1)
    assert(byProbe.size === 3 && byProbe.values.forall(_.length <= 5))
    // emitted sims equal the exact cosine (IVF approximates recall, not values)
    val exact = Similarity.knnJoin(probes, corpus, "vec_id", "vec_id", "embedding", 1000000)
      .select($"probe_id", $"neighbor_id", $"sim")
      .as[(Long, Long, Double)].collect()
      .map { case (p, n, s) => (p, n) -> s }.toMap
    assert(out.forall { case (p, n, s, _) => exact((p, n)) == s })
    // determinism
    val again = Similarity.ivfJoin(probes, corpus, "vec_id", "vec_id", "embedding",
      k = 5, nList = 8, nProbe = 3).as[(Long, Long, Double, Int)].collect()
    assert(out.toSet === again.toSet)
  }
}
