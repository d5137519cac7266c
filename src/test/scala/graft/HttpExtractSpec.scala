package graft

import graft.etl._
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** The production HTTP extract client against a local stub server:
  * retry/backoff schedule, Retry-After, token pagination, fail-fast on
  * permanent errors, and the full Pipeline composition (paginated
  * extract → land → flatten → dedup-append) the reference runs as a
  * scheduled job (ETL_pipeline_countries.py:28-50, 144-147).
  */
class HttpExtractSpec extends SparkSpec {

  /** Serve `routes` on an ephemeral port; returns (baseUrl, stop). */
  private def withServer(routes: (String, HttpExchange => Unit)*)(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit =
          try h(ex) finally ex.close()
      })
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: String,
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def noSleepCfg(waits: collection.mutable.Buffer[Long]) =
    HttpExtract.Config(sleeper = waits += _)

  test("retries 5xx with doubling backoff, then succeeds") {
    val calls = new AtomicInteger(0)
    withServer("/flaky" -> { ex =>
      if (calls.incrementAndGet() <= 2) respond(ex, 503, "busy")
      else respond(ex, 200, """{"ok":true}""")
    }) { base =>
      val waits = collection.mutable.Buffer.empty[Long]
      val body = HttpExtract.get(s"$base/flaky", noSleepCfg(waits))
      assert(body == """{"ok":true}""")
      assert(calls.get() == 3)
      assert(waits.toSeq == Seq(200L, 400L), "exponential schedule")
    }
  }

  test("Retry-After overrides the computed backoff") {
    val calls = new AtomicInteger(0)
    withServer("/limited" -> { ex =>
      if (calls.incrementAndGet() == 1)
        respond(ex, 429, "slow down", Map("Retry-After" -> "3"))
      else respond(ex, 200, "fine")
    }) { base =>
      val waits = collection.mutable.Buffer.empty[Long]
      assert(HttpExtract.get(s"$base/limited", noSleepCfg(waits)) == "fine")
      assert(waits.toSeq == Seq(3000L), "Retry-After seconds honored")
    }
  }

  test("retry budget exhausts with an informative failure") {
    val calls = new AtomicInteger(0)
    withServer("/down" -> { ex =>
      calls.incrementAndGet(); respond(ex, 500, "nope")
    }) { base =>
      val waits = collection.mutable.Buffer.empty[Long]
      val e = intercept[java.io.IOException] {
        HttpExtract.get(s"$base/down",
          noSleepCfg(waits).copy(maxRetries = 2))
      }
      assert(calls.get() == 3, "initial attempt + 2 retries")
      assert(e.getMessage.contains("after 3 attempts"))
    }
  }

  test("permanent status fails fast — no retry on 404") {
    val calls = new AtomicInteger(0)
    withServer("/missing" -> { ex =>
      calls.incrementAndGet(); respond(ex, 404, "not here")
    }) { base =>
      val e = intercept[HttpExtract.HttpStatusException] {
        HttpExtract.get(s"$base/missing",
          noSleepCfg(collection.mutable.Buffer.empty))
      }
      assert(e.status == 404 && calls.get() == 1)
    }
  }

  /** Three-page token-paginated API in the reference's response shape. */
  private def pagedHandler(pages: Int): HttpExchange => Unit = { ex =>
    val q = Option(ex.getRequestURI.getQuery).getOrElse("")
    val page = q.split('&').collectFirst {
      case s if s.startsWith("pageToken=") => s.stripPrefix("pageToken=").toInt
    }.getOrElse(0)
    val items = s"""[{"id":{"videoId":"v$page"},"snippet":{"title":"t$page"}}]"""
    val token =
      if (page + 1 < pages) s""","nextPageToken":"${page + 1}"""" else ""
    respond(ex, 200, s"""{"page":$page,"items":$items$token}""")
  }

  test("token pagination follows nextPageToken to the last page") {
    withServer("/api" -> pagedHandler(3)) { base =>
      val pages = HttpExtract.paginate(
        s"$base/api",
        b => HttpExtract.stringField(b, "nextPageToken")
          .map(t => s"$base/api?pageToken=$t"),
        noSleepCfg(collection.mutable.Buffer.empty))
      assert(pages.size == 3)
      assert(pages.zipWithIndex.forall { case (p, i) =>
        p.contains(s""""page":$i""") })
    }
  }

  test("page budget stops an API that never exhausts its tokens") {
    val calls = new AtomicInteger(0)
    withServer("/loop" -> { ex =>
      calls.incrementAndGet()
      respond(ex, 200, """{"x":1,"nextPageToken":"again"}""")
    }) { base =>
      val pages = HttpExtract.paginate(s"$base/loop",
        _ => Some(s"$base/loop"),
        noSleepCfg(collection.mutable.Buffer.empty), maxPages = 5)
      assert(pages.size == 5 && calls.get() == 5)
    }
  }

  test("gzip responses decode transparently (JDK client does not)") {
    val payload = """{"ok":"gzipped","n":42}"""
    withServer("/gz" -> { ex =>
      assert(Option(ex.getRequestHeaders.getFirst("Accept-Encoding"))
        .exists(_.contains("gzip")), "client must offer gzip")
      val raw = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(raw)
      gz.write(payload.getBytes(StandardCharsets.UTF_8)); gz.close()
      ex.getResponseHeaders.set("Content-Encoding", "gzip")
      val bytes = raw.toByteArray
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
    }) { base =>
      assert(HttpExtract.get(s"$base/gz",
        noSleepCfg(collection.mutable.Buffer.empty)) == payload)
    }
  }

  test("stringField pulls flat tokens, handles escapes and absence") {
    assert(HttpExtract.stringField("""{"a":"b","tok":"CAUQAA"}""", "tok")
      .contains("CAUQAA"))
    assert(HttpExtract.stringField("""{"tok":"a\"b\\c"}""", "tok")
      .contains("a\"b\\c"))
    assert(HttpExtract.stringField("""{"other":"x"}""", "tok").isEmpty)
    // single-pass unescape: an escaped backslash followed by a literal
    // 'n' (wire bytes \\n) must decode to backslash+n, NOT collapse
    // into a newline (the chained-replace hazard)
    assert(HttpExtract.stringField("""{"tok":"a\\nb"}""", "tok")
      .contains("a" + '\\' + "nb"))
    // a real \n escape decodes to an actual newline
    assert(HttpExtract.stringField("""{"tok":"x\ny"}""", "tok")
      .contains("x" + '\n' + "y"))
    assert(HttpExtract.stringField("""{"tok":null}""", "tok").isEmpty)
    // a valid \uXXXX escape decodes (built by concat so the SCALA
    // lexer never sees a \u sequence)
    assert(HttpExtract.stringField(
      "{\"tok\":\"a" + '\\' + "u0041b\"}", "tok").contains("aAb"))
    // a MALFORMED \uXXXX (non-hex digits) in an untrusted external body
    // must stay verbatim, not abort the extract with a
    // NumberFormatException
    assert(HttpExtract.stringField(
      "{\"tok\":\"a" + '\\' + "uZZZZb\"}", "tok")
      .contains("a" + '\\' + "uZZZZb"))
    // malformed escape at end-of-string (fewer than 4 chars left)
    assert(HttpExtract.stringField(
      "{\"tok\":\"a" + '\\' + "u1\"}", "tok")
      .contains("a" + '\\' + "u1"))
  }

  test("paginated extract composes into the Pipeline end-to-end") {
    import org.apache.spark.sql.functions._
    withServer("/api" -> pagedHandler(3)) { base =>
      val extract = HttpExtract.paginatedExtract(
        s"$base/api",
        b => HttpExtract.stringField(b, "nextPageToken")
          .map(t => s"$base/api?pageToken=$t"),
        noSleepCfg(collection.mutable.Buffer.empty))
      val root = Files.createTempDirectory("graft-http-tbl").toString
      val table = DeltaLite(spark, root)
      val pipeline = new Pipeline(spark, extract,
        Files.createTempDirectory("graft-http-raw").toString,
        df => JsonIngest.flatten(df)
          .select(col("items_id_videoId").as("video_id"),
            col("items_snippet_title").as("title"), col("page")),
        table, dedupKey = "video_id")
      val (_, v1) = pipeline.run("batch1")
      assert(v1 == 0)
      val got = table.read().orderBy("page")
        .select("video_id", "title", "page")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(got.toSeq == Seq(("v0", "t0", 0L), ("v1", "t1", 1L),
        ("v2", "t2", 2L)), "one row per landed page, flattened")
      // a rerun of the same extract dedup-appends nothing new
      val (_, v2) = pipeline.run("batch2")
      assert(v2 >= v1 && table.read().count() == 3)
    }
  }
}
