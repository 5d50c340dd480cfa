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
