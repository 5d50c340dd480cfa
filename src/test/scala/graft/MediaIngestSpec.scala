package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.sources.{MediaDedupStore, Multimodal}

/** Streaming multimodal ingest-dedup: near-dups of already-committed
  * media drop, exact (same-sig) duplicates collapse within a batch,
  * modalities coexist in one store, and batch replay is idempotent
  * (the SignatureStore crash-replay contract over perceptual hashes). */
class MediaIngestSpec extends SparkSpec {

  private val images = "/root/repo/src/test/resources/graft/images"
  private val audio = "/root/repo/src/test/resources/graft/audio"

  private def binStream(dir: String) =
    spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, " +
        "length LONG, content BINARY")
      .load(dir)

  private def drain(src: String, store: String, accepted: String,
      ckpt: String): Unit =
    MediaDedupStore.ingestDedup(binStream(src), store, accepted, ckpt)
      .awaitTermination()

  private def acceptedFiles(accepted: String): Set[String] =
    spark.read.parquet(accepted)
      .select(regexp_extract(col("doc"), "([^/]+)$", 1))
      .collect().map(_.getString(0)).toSet

  test("cross-batch near-dup drop, within-batch exact collapse, " +
      "mixed modalities, idempotent re-drain and batch replay") {
    val root = Files.createTempDirectory("graft_media_ingest")
    val src = root.resolve("src"); Files.createDirectory(src)
    val store = root.resolve("store").toString
    val accepted = root.resolve("accepted").toString
    val ckpt = root.resolve("ckpt").toString
    def stage(from: String, name: String, as: String): Unit =
      Files.copy(Paths.get(s"$from/$name"), src.resolve(as),
        StandardCopyOption.REPLACE_EXISTING)

    // batch 1: a base image, a byte-identical copy (same sig -> exact
    // collapse keeps the lexicographically lowest path), one unique
    stage(images, "img_00.bmp", "a_base.bmp")
    stage(images, "img_00.bmp", "a_copy.bmp")
    stage(images, "img_28.bmp", "u1.bmp")
    drain(src.toString, store, accepted, ckpt)
    assert(acceptedFiles(accepted) === Set("a_base.bmp", "u1.bmp"))

    // batch 2: a near-dup of the committed base (img_01: one-pixel
    // variant, hamming 0 at the dHash), a fresh unique image, and an
    // AUDIO clip (different modality, lives in the same store)
    stage(images, "img_01.bmp", "neardup.bmp")
    stage(images, "img_29.bmp", "u2.bmp")
    stage(audio, "clip_00.wav", "song.wav")
    drain(src.toString, store, accepted, ckpt)
    assert(acceptedFiles(accepted) ===
      Set("a_base.bmp", "u1.bmp", "u2.bmp", "song.wav"))

    // audio near-dup of the committed clip drops too (batch 3)
    stage(audio, "clip_01.wav", "song_v2.wav")
    drain(src.toString, store, accepted, ckpt)
    assert(acceptedFiles(accepted) ===
      Set("a_base.bmp", "u1.bmp", "u2.bmp", "song.wav"))

    // re-drain with nothing new: no change (checkpoint idempotence)
    drain(src.toString, store, accepted, ckpt)
    assert(acceptedFiles(accepted) ===
      Set("a_base.bmp", "u1.bmp", "u2.bmp", "song.wav"))

    // REPLAY the batch that accepted u2/song: with its own ingest
    // partition excluded from the decision, the re-run derives the
    // same survivors and overwrites only its own output bit-for-bit
    val ingestKeys = new java.io.File(accepted).listFiles()
      .map(_.getName).filter(_.startsWith("ingest=")).sorted
    val u2Key = ingestKeys.find { k =>
      spark.read.parquet(s"$accepted/$k")
        .filter(col("doc").endsWith("u2.bmp")).count() > 0
    }.get.stripPrefix("ingest=")
    val batch2 = Multimodal.readBinaryDir(spark, src.toString, "*")
      .filter(col("path").endsWith("neardup.bmp") ||
        col("path").endsWith("u2.bmp") || col("path").endsWith("song.wav"))
    def snapshot() = (
      spark.read.parquet(store).collect().map(_.toString).sorted.toSeq,
      spark.read.parquet(accepted).collect().map(_.toString).sorted.toSeq)
    val before = snapshot()
    MediaDedupStore.processBatch(batch2, u2Key, store, accepted, 3)
    assert(snapshot() === before)
  }
}
