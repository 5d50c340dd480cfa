package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_bin")
    Files.write(d.resolve("a.jpg"), Array[Byte](1, 2, 3, 4, 5))
    Files.write(d.resolve("b.png"), Array[Byte](9, 8, 7))
    Files.write(d.resolve("c.bin"), Array.fill[Byte](2048)(42))
    d.toString
  }

  test("binaryFile source exposes path/length/content") {
    val df = Multimodal.readBinaryDir(spark, dir)
    assert(df.count() === 3)
    assert(df.columns.toSet === Set("path", "modificationTime", "length", "content"))
    val lens = df.select(element_at(split($"path", "/"), -1).as("f"), $"length")
      .as[(String, Long)].collect().toMap
    assert(lens("a.jpg") === 5 && lens("c.bin") === 2048)
  }

  test("mime guess from extension with octet-stream fallback") {
    val m = Multimodal.readBinaryDir(spark, dir)
      .select(element_at(split($"path", "/"), -1).as("f"),
        Multimodal.mimeFromPath($"path").as("mime"))
      .as[(String, String)].collect().toMap
    assert(m("a.jpg") === "image/jpeg")
    assert(m("b.png") === "image/png")
    assert(m("c.bin") === "application/octet-stream")
  }

  test("S6 binary sink round-trips through the binaryFile source") {
    val out = Files.createTempDirectory("graft_bin_out").toString
    val src = Multimodal.readBinaryDir(spark, dir)
      .select(element_at(split($"path", "/"), -1).as("filename"), $"content")
    Multimodal.writeBinaries(src, out)
    val back = Multimodal.readBinaryDir(spark, out)
      .select(element_at(split($"path", "/"), -1).as("f"), $"content")
      .as[(String, Array[Byte])].collect().toMap
    val orig = src.as[(String, Array[Byte])].collect().toMap
    assert(back.keySet === orig.keySet)
    assert(orig.forall { case (f, bytes) => back(f).sameElements(bytes) })
  }

  test("P10 filename defaulting: supplied name wins, else timestamped mime default") {
    val df = Seq(
      (Some("given.jpg"), "2024-03-01 10:20:30", "image/jpeg"),
      (None, "2024-03-01 10:20:30", "image/jpeg"),
      (None, "2024-12-31 23:59:59", "application/x-unknown"))
      .toDF("name", "ts_s", "mime")
      .withColumn("ts", $"ts_s".cast("timestamp"))
    val got = df.select(
      Multimodal.defaultFilename($"name", $"ts", $"mime").as("f"))
      .as[String].collect().toSeq
    assert(got === Seq(
      "given.jpg",
      "signal-2024-03-01-102030.jpg",
      "signal-2024-12-31-235959.bin"))
  }

  test("feature extraction: deterministic, fixed dim, partition-parallel") {
    val bins = Multimodal.readBinaryDir(spark, dir)
    val f1 = Multimodal.extractFeatures(spark, bins, dim = 16).collect()
      .map(f => f.path -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(spark, bins, dim = 16).collect()
      .map(f => f.path -> f.features.toSeq).toMap
    assert(f1 === f2)
    assert(f1.values.forall(_.length == 16))
    // content actually flowed: different files → different features
    assert(f1.values.toSet.size === 3)
  }

  test("frame sampling emits stride-spaced ordinals") {
    val frames = Multimodal.sampleFrames(
      Multimodal.readBinaryDir(spark, dir, "c.bin"), stride = 1)
    val idx = frames.select($"frame_idx").as[Int].collect().sorted.toSeq
    assert(idx === (0 until 3).toSeq) // 2048 bytes → 3 fake frames
  }
}
