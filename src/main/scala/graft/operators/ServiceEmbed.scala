package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** The reference's one real data-plane external call, as an operator:
  * per-row HTTP embedding against a model service
  * (`src/rag/dataframes.rs:113-151` — an Ollama client is built once,
  * then each text is POSTed and the vector written back). Restated for
  * a cluster: `mapPartitions` with ONE client per PARTITION (not per
  * row, not per executor-lifetime-global), request batching, bounded
  * retry with backoff, and an injectable transport so tests and
  * offline runs need no service.
  *
  * Plan semantics: the embed call is opaque to Catalyst (an object
  * `MapPartitions` boundary), so predicates are NOT pushed through it —
  * upstream filters (the noise filter) stay upstream, and the service
  * is never called for rows the pipeline would discard (asserted in
  * ServiceEmbedSpec). At 100 TB the operator scales with partitions:
  * no shuffle is introduced, batching amortizes per-request overhead,
  * and client construction cost is paid once per partition.
  */
trait EmbedTransport extends Serializable {
  /** Embed a batch of texts; must return exactly one vector per text,
    * in order. Throwing is allowed — the operator retries. */
  def embedBatch(texts: Seq[String]): Seq[Array[Double]]
  /** Release connections; called once when the partition is drained. */
  def close(): Unit = ()
}

/** Serializable factory shipped to executors; `open()` runs once per
  * partition (the reference builds its client once per process,
  * `src/rag/dataframes.rs:117`). */
trait EmbedTransportFactory extends Serializable {
  def open(): EmbedTransport
}

/** Offline/test transport computing the SAME deterministic hash
  * embedding as the `HashEmbed` kernel (murmur3 seed-42 bucket counts,
  * L2-normalized) — bit-identical by construction, asserted in
  * ServiceEmbedSpec. The production swap-in is an HTTP transport with
  * the identical interface. */
class HashEmbedTransportFactory(dim: Int) extends EmbedTransportFactory {
  override def open(): EmbedTransport = new EmbedTransport {
    override def embedBatch(texts: Seq[String]): Seq[Array[Double]] =
      texts.map { t =>
        val counts = new Array[Double](dim)
        t.trim.split("\\s+").foreach { w =>
          val u = org.apache.spark.unsafe.types.UTF8String.fromString(w)
          val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
            .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42)
          counts(java.lang.Math.floorMod(h, dim)) += 1.0
        }
        var ss = 0.0
        var i = 0
        while (i < dim) { ss += counts(i) * counts(i); i += 1 }
        if (ss > 0.0) {
          val norm = java.lang.Math.sqrt(ss)
          i = 0
          while (i < dim) { counts(i) /= norm; i += 1 }
        }
        counts
      }
  }
}

/** Live HTTP transport speaking the reference's embedding wire shape
  * (`src/rag/dataframes.rs:113-151`): POST `{"model":...,"prompt":...}`
  * (newlines in the prompt normalized to spaces, as the reference
  * does) and read back `{"embedding":[...]}`. One prompt per request —
  * the Ollama-style endpoint has no batch form — but ONE shared client
  * per transport, and up to `maxInFlight` requests ride concurrently
  * per batch (`sendAsync` windows, order-preserving), so a batch pays
  * ~ceil(n/maxInFlight) round-trips instead of n. The reference's
  * client-per-call, its `body-Type` header typo, and its embed-twice
  * pipeline bug are deliberately not reproduced. Non-2xx responses and
  * malformed bodies throw, which the operator's per-batch
  * retry/backoff handles; the spec drives this against an in-process
  * stub server (5xx-then-recover, concurrency observed). Java 17's
  * HttpClient has no close() — connections die with the executor. */
class HttpEmbedTransportFactory(endpoint: String, model: String,
    connectTimeoutMs: Long = 5000, requestTimeoutMs: Long = 30000,
    maxInFlight: Int = 4)
    extends EmbedTransportFactory {
  override def open(): EmbedTransport = new EmbedTransport {
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs))
      .build()

    private def request(t: String): java.net.http.HttpRequest = {
      val payload = mapper.createObjectNode()
      payload.put("model", model)
      payload.put("prompt", t.replace("\n", " "))
      java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers
          .ofString(mapper.writeValueAsString(payload)))
        .build()
    }

    private def parse(resp: java.net.http.HttpResponse[String]): Array[Double] = {
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"embed service HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
      val emb = mapper.readTree(resp.body()).get("embedding")
      if (emb == null || !emb.isArray)
        throw new java.io.IOException("embedding not found in response")
      val out = new Array[Double](emb.size())
      var i = 0
      while (i < emb.size()) { out(i) = emb.get(i).asDouble(); i += 1 }
      out
    }

    override def embedBatch(texts: Seq[String]): Seq[Array[Double]] =
      texts.grouped(math.max(1, maxInFlight)).flatMap { window =>
        val inFlight = window.map(t => client.sendAsync(request(t),
          java.net.http.HttpResponse.BodyHandlers.ofString()))
        inFlight.map { f =>
          val resp =
            try f.join()
            catch {
              // surface the transport failure the way the sync path
              // did, so the operator's retry/backoff sees the cause
              case e: java.util.concurrent.CompletionException
                  if e.getCause != null =>
                throw e.getCause
            }
          parse(resp)
        }
      }.toSeq
  }
}

object ServiceEmbed {

  /** Append `outCol` (ARRAY<DOUBLE>) computed by the service transport:
    * one client per partition, `batchSize` texts per request, up to
    * `maxRetries` retries with exponential backoff per batch. Null
    * texts yield a null embedding and are never sent to the service —
    * the same null propagation as the `HashEmbed` kernel, so the two
    * paths agree row-for-row (asserted in ServiceEmbedSpec). All input
    * columns pass through unchanged. */
  def withEmbedding(df: DataFrame, textCol: String,
      factory: EmbedTransportFactory, batchSize: Int = 32,
      maxRetries: Int = 3, outCol: String = "embedding"): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(DoubleType, containsNull = false))
    val ti = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      val client = factory.open()
      val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def closeOnce(): Unit = if (closed.compareAndSet(false, true)) client.close()
      // Close on task completion (covers limit/take early-abort and task
      // failure — exhaustion-based close alone leaks the client there);
      // TaskContext is null when the iterator runs outside a task (tests).
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      val mapped = rows.grouped(batchSize).flatMap { batch =>
        val texts = batch.filterNot(_.isNullAt(ti)).map(_.getString(ti))
        val vecs =
          if (texts.isEmpty) Seq.empty
          else withRetry(maxRetries) { client.embedBatch(texts) }
        require(vecs.length == texts.length,
          s"transport returned ${vecs.length} vectors for ${texts.length} texts")
        val vi = vecs.iterator
        batch.map { r =>
          val v = if (r.isNullAt(ti)) null else vi.next().toSeq
          Row.fromSeq(r.toSeq :+ v)
        }
      }
      closeOnExhaustion(mapped, closeOnce _)
    }(Encoders.row(outSchema))
  }

  private def withRetry[T](maxRetries: Int)(f: => T): T = {
    var attempt = 0
    var out: Option[T] = None
    while (out.isEmpty) {
      try out = Some(f)
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt > maxRetries) throw e
          Thread.sleep(math.min(1000L, 50L << (attempt - 1)))
      }
    }
    out.get
  }

  private def closeOnExhaustion[T](it: Iterator[T], closeOnce: () => Unit): Iterator[T] =
    new Iterator[T] {
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) closeOnce()
        h
      }
      override def next(): T = it.next()
    }
}
