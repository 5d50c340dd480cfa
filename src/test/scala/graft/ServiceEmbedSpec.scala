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

  test("null text yields null embedding (kernel parity) and never reaches the service") {
    CountingFactory.reset()
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "some text"))
      .toDF("id", "t")
    val rows = ServiceEmbed.withEmbedding(df, "t", new CountingFactory(8))
      .select($"id", $"embedding").collect()
    val got = rows.map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(got(1L) == null)
    assert(got(2L) != null && got(3L) != null)
    assert(CountingFactory.seen.size() === 2) // the null row was skipped
    // kernel parity including the null arm
    val kernel = df.select($"id",
        VectorOps.hashEmbed(TextOps.words($"t"), 8).as("e")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert((kernel(1L) == null) === (got(1L) == null))
    assert(kernel(2L) === got(2L) && kernel(3L) === got(3L))
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

  test("q59 digest equals q26's row-for-row (null-text rows included)") {
    val q26 = SparkEntry.queries("q26_hash_embed")(spark, sf).collect().toSeq
    val q59 = SparkEntry.queries("q59_service_embed")(spark, sf).collect().toSeq
    assert(q59 === q26)
  }

  // --- live HTTP transport against an in-process stub server ----------

  /** Stub speaking the reference's wire shape: POST {"model","prompt"}
    * → {"embedding":[len(prompt), count('a')]}. Records every prompt /
    * model / Content-Type; returns 500 for the first `failFirst`
    * requests to drive the operator's retry. Driver-side only — the
    * serialized factory carries just the endpoint string. */
  private def withStubServer(failFirst: Int = 0)(
      body: (String, java.util.Queue[(String, String, String)]) => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
    val fails = new AtomicInteger(failFirst)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    server.createContext("/api/embeddings", { exchange =>
      val req = mapper.readTree(exchange.getRequestBody.readAllBytes())
      val prompt = req.get("prompt").asText()
      seen.add((prompt, req.get("model").asText(),
        exchange.getRequestHeaders.getFirst("Content-Type")))
      if (fails.getAndDecrement() > 0) {
        exchange.sendResponseHeaders(500, -1)
      } else {
        val emb = s"""{"embedding":[${prompt.length}.0,${prompt.count(_ == 'a')}.0]}"""
        val bytes = emb.getBytes("UTF-8")
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
      }
      exchange.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/api/embeddings", seen)
    finally server.stop(0)
  }

  test("HTTP transport: reference wire shape round-trips; newlines normalized") {
    withStubServer() { (endpoint, seen) =>
      val df = Seq((1L, "hello world"), (2L, "line1\nline2"), (3L, "banana"))
        .toDF("id", "t").repartition(1)
      val got = ServiceEmbed.withEmbedding(df, "t",
          new graft.operators.HttpEmbedTransportFactory(endpoint, "stub-model"))
        .select($"id", $"embedding").as[(Long, Array[Double])].collect().toMap
      assert(got(1L).sameElements(Array(11.0, 0.0)))
      assert(got(2L).sameElements(Array(11.0, 0.0))) // "line1 line2"
      assert(got(3L).sameElements(Array(6.0, 3.0)))
      val prompts = seen.toArray.map(_.asInstanceOf[(String, String, String)])
      assert(prompts.map(_._1).contains("line1 line2")) // \n → space, per reference
      assert(prompts.forall(_._2 == "stub-model"))
      assert(prompts.forall(_._3 == "application/json")) // not the reference's body-Type typo
    }
  }

  test("HTTP transport: 5xx is retried by the operator and recovers without loss") {
    withStubServer(failFirst = 2) { (endpoint, seen) =>
      val df = (1 to 5).map(i => (i.toLong, s"text $i")).toDF("id", "t").repartition(1)
      val n = ServiceEmbed.withEmbedding(df, "t",
          new graft.operators.HttpEmbedTransportFactory(endpoint, "stub-model"),
        batchSize = 10, maxRetries = 3).count()
      assert(n === 5)
      assert(seen.size() > 5) // failed requests were re-sent
    }
  }

  test("HTTP transport: sends overlap up to maxInFlight; order is preserved") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    val cur = new AtomicInteger
    val maxSeen = new AtomicInteger
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    server.createContext("/api/embeddings", { exchange =>
      val now = cur.incrementAndGet()
      maxSeen.updateAndGet(m => math.max(m, now))
      Thread.sleep(100) // hold the request open so windows overlap
      val prompt = mapper.readTree(exchange.getRequestBody.readAllBytes())
        .get("prompt").asText()
      val bytes = s"""{"embedding":[${prompt.length}.0]}""".getBytes("UTF-8")
      exchange.sendResponseHeaders(200, bytes.length.toLong)
      exchange.getResponseBody.write(bytes)
      cur.decrementAndGet()
      exchange.close()
    })
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/api/embeddings"
      val transport = new graft.operators.HttpEmbedTransportFactory(
        endpoint, "m", maxInFlight = 4).open()
      val texts = (1 to 8).map("x" * _)
      val out = transport.embedBatch(texts)
      assert(out.map(_.head.toInt) === (1 to 8)) // order preserved
      assert(maxSeen.get() >= 3, s"observed concurrency ${maxSeen.get()}")
      assert(maxSeen.get() <= 4) // bounded by the window
    } finally server.stop(0)
  }

  test("HTTP transport: persistent 5xx exhausts retries and fails the task") {
    withStubServer(failFirst = 1000) { (endpoint, _) =>
      val df = Seq((1L, "doomed")).toDF("id", "t")
      intercept[Exception] {
        ServiceEmbed.withEmbedding(df, "t",
          new graft.operators.HttpEmbedTransportFactory(endpoint, "stub-model"),
          maxRetries = 1).count()
      }
    }
  }
}
