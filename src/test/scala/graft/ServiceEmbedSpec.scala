package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import graft.functions.{TextOps, VectorOps}
import graft.operators.{EmbedTransport, EmbedTransportFactory, HashEmbedTransportFactory, NoiseFilter, ServiceEmbed}

/** V2' service-embed transport (`ServiceEmbed.withEmbedding`) — the
  * reference's per-row HTTP embed (src/rag/dataframes.rs:113-151) as a
  * mapPartitions operator. Asserts the three scaladoc claims: kernel
  * bit-identity, noise-filtered rows never reach the transport, and
  * batching/retry/close behavior via counting fakes.
  */
/** Counting fake transport: records every text seen, fails the first
  * `failFirst` embedBatch calls, counts opens/batches/closes. Top-level
  * (NOT nested in the suite) so serializing it does not drag the
  * non-serializable ScalaTest outer instance into the task closure. */
private class CountingFactory(dim: Int, failFirst: Int = 0) extends EmbedTransportFactory {
  override def open(): EmbedTransport = {
    CountingFactory.opens.incrementAndGet()
    new EmbedTransport {
      private val inner = new HashEmbedTransportFactory(dim).open()
      override def embedBatch(texts: Seq[String]): Seq[Array[Double]] = {
        if (CountingFactory.calls.incrementAndGet() <= failFirst)
          throw new RuntimeException("transient service error")
        texts.foreach(t => CountingFactory.seen.add(t))
        CountingFactory.batches.incrementAndGet()
        CountingFactory.maxBatch.updateAndGet(m => math.max(m, texts.length))
        inner.embedBatch(texts)
      }
      override def close(): Unit = CountingFactory.closes.incrementAndGet()
    }
  }
}

/** Static so executor-side mutations are visible to the driver in
  * local mode (the factory itself is serialized per task). */
private object CountingFactory {
  val opens = new AtomicInteger(0)
  val calls = new AtomicInteger(0)
  val batches = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
  val maxBatch = new AtomicInteger(0)
  val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def reset(): Unit = {
    opens.set(0); calls.set(0); batches.set(0); closes.set(0); maxBatch.set(0)
    seen.clear()
  }
}

class ServiceEmbedSpec extends SparkSpec {
  import spark.implicits._

  test("transport embedding is bit-identical to the HashEmbed kernel") {
    val docs = Tables.documents(spark, sf).filter($"text".isNotNull)
    val viaKernel = docs
      .select($"doc_id", VectorOps.hashEmbed(TextOps.words($"text"), 64).as("embedding"))
      .as[(Long, Array[Double])].collect().toMap
    val viaTransport = ServiceEmbed
      .withEmbedding(docs.select($"doc_id", $"text"), "text", new HashEmbedTransportFactory(64))
      .select($"doc_id", $"embedding")
      .as[(Long, Array[Double])].collect().toMap
    assert(viaTransport.keySet === viaKernel.keySet)
    // bit-for-bit: exact double equality, no tolerance
    viaKernel.foreach { case (id, v) => assert(viaTransport(id).sameElements(v), s"doc $id") }
  }

  test("noise-filtered rows never reach the transport (filter stays upstream)") {
    CountingFactory.reset()
    val raw = Seq(
      (1L, "a real message body"),
      (2L, "is typing..."), // noise literal — dropped before the service call
      (3L, "got Read receipt for 12345"), // noise prefix
      (4L, "another kept body")).toDF("id", "body")
    val kept = NoiseFilter(raw, "body")
    val out = ServiceEmbed.withEmbedding(kept, "body", new CountingFactory(8))
    assert(out.count() === 2)
    assert(CountingFactory.seen.size() === 2)
    assert(!CountingFactory.seen.contains("is typing..."))
    assert(CountingFactory.seen.contains("a real message body"))
  }

  test("batching groups rows per request and close fires once per partition") {
    CountingFactory.reset()
    val df = (1 to 10).map(i => (i.toLong, s"text number $i")).toDF("id", "t").repartition(1)
    val n = ServiceEmbed.withEmbedding(df, "t", new CountingFactory(8), batchSize = 4).count()
    assert(n === 10)
    assert(CountingFactory.batches.get() === 3) // 4 + 4 + 2
    assert(CountingFactory.maxBatch.get() === 4)
    assert(CountingFactory.opens.get() === 1)
    assert(CountingFactory.closes.get() === 1)
  }

  test("transient failures are retried; batch succeeds without data loss") {
    CountingFactory.reset()
    val df = (1 to 6).map(i => (i.toLong, s"retry text $i")).toDF("id", "t").repartition(1)
    val out = ServiceEmbed.withEmbedding(df, "t",
      new CountingFactory(8, failFirst = 2), batchSize = 10, maxRetries = 3)
    assert(out.count() === 6)
    assert(CountingFactory.calls.get() === 3) // 2 failures + 1 success
    assert(CountingFactory.seen.size() === 6)
  }

  test("retries exhausted → the task fails (errors are not swallowed)") {
    CountingFactory.reset()
    val df = Seq((1L, "doomed")).toDF("id", "t")
    val ex = intercept[Exception] {
      ServiceEmbed.withEmbedding(df, "t",
        new CountingFactory(8, failFirst = 100), maxRetries = 1).count()
    }
    assert(ex.getMessage != null)
  }

  test("client is closed even when downstream stops early (limit)") {
    CountingFactory.reset()
    val df = (1 to 100).map(i => (i.toLong, s"t $i")).toDF("id", "t").repartition(1)
    val got = ServiceEmbed.withEmbedding(df, "t", new CountingFactory(8), batchSize = 5)
      .limit(3).collect()
    assert(got.length === 3)
    // task-completion listener fires on early abort; close exactly once
    assert(CountingFactory.closes.get() === 1)
  }

  test("null text embeds as empty string (reference empty-guard arm)") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("id", "t")
    val vecs = ServiceEmbed.withEmbedding(df, "t", new HashEmbedTransportFactory(8))
      .select($"id", $"embedding").as[(Long, Array[Double])].collect().toMap
    assert(vecs(1L).sameElements(vecs(2L)))
  }

  test("flagship pipeline via service transport equals the kernel pipeline") {
    val docs = Tables.documents(spark, sf)
    val probe = "query filter join aggregate window shuffle"
    val viaKernel = graft.operators.EmbedPipeline
      .topKForProbe(spark, docs, "text", probe, dim = 64, k = 10)
      .collect().toSeq
    val viaService = graft.operators.EmbedPipeline
      .topKForProbeService(spark, docs, "text", probe,
        new HashEmbedTransportFactory(64), dim = 64, k = 10)
      .collect().toSeq
    assert(viaService === viaKernel)
    assert(viaService.nonEmpty)
  }

  test("q59 digest equals q26's on non-null texts") {
    val q26 = SparkEntry.queries("q26_hash_embed")(spark, sf)
      .filter($"norm".isNotNull).collect().toSeq
    val q59 = SparkEntry.queries("q59_service_embed")(spark, sf).collect().toSeq
    assert(q59 === q26)
  }
}
