package graft.etl

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Production HTTP extract client for [[Pipeline]]'s `extract` seam.
  *
  * The reference's extract step is a live REST call with token-based
  * pagination (/root/reference/ETL_pipeline_countries.py:28-50: one
  * `search().list()` request per page, chained on `nextPageToken`).
  * [[Pipeline]] deliberately injects `extract: () => String` so the
  * engine tests offline; this is the production client to wire into
  * that seam: bounded retry with exponential backoff + jitterless
  * deterministic schedule, `Retry-After` honored, token pagination,
  * and a page budget so a misbehaving API can't loop forever.
  *
  * Driver-side by design — extraction of a single API payload is not
  * distributed work; the DATA becomes distributed when the landed file
  * enters Spark. Nothing here touches a SparkSession.
  *
  * Retry policy: 429 and 5xx are transient (retried, backoff doubling
  * from `initialBackoffMs`, capped at `maxBackoffMs`; a parseable
  * `Retry-After: <seconds>` overrides the computed wait). Connect/read
  * failures (IOException) retry the same way. Any other status is a
  * permanent error and fails fast — retrying a 401/404 only hides
  * misconfiguration. `sleeper` is injectable so specs assert the exact
  * backoff schedule without real sleeping.
  */
object HttpExtract {

  final case class Config(
      maxRetries: Int = 4,
      initialBackoffMs: Long = 200L,
      maxBackoffMs: Long = 10000L,
      timeoutMs: Long = 30000L,
      headers: Map[String, String] = Map.empty,
      sleeper: Long => Unit = Thread.sleep)

  final class HttpStatusException(val status: Int, val url: String,
      val body: String)
    extends RuntimeException(s"HTTP $status from $url: ${body.take(200)}")

  private def transient(status: Int): Boolean =
    status == 429 || (status >= 500 && status < 600)

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  /** Decode the response body, honoring `Content-Encoding: gzip` —
    * the JDK HttpClient does NOT transparently decompress, and most
    * public APIs compress when offered.
    */
  private def decodeBody(resp: HttpResponse[Array[Byte]]): String = {
    val gzipped = resp.headers().firstValue("Content-Encoding")
      .map[Boolean](_.equalsIgnoreCase("gzip")).orElse(false)
    val bytes =
      if (!gzipped) resp.body()
      else {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(resp.body()))
        try in.readAllBytes() finally in.close()
      }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** GET `url` with bounded retry; returns the response body. */
  def get(url: String, cfg: Config = Config()): String = {
    var attempt = 0
    var backoff = cfg.initialBackoffMs
    while (true) {
      val outcome: Either[(Option[Long], String), String] =
        try {
          val b = HttpRequest.newBuilder(URI.create(url))
            .timeout(Duration.ofMillis(cfg.timeoutMs))
            .header("Accept-Encoding", "gzip").GET()
          cfg.headers.foreach { case (k, v) => b.header(k, v) }
          val resp = client.send(b.build(),
            HttpResponse.BodyHandlers.ofByteArray())
          val status = resp.statusCode()
          if (status >= 200 && status < 300) Right(decodeBody(resp))
          else if (transient(status)) {
            val ra = resp.headers().firstValue("Retry-After")
            val retryAfter =
              if (ra.isPresent) ra.get().toLongOption.map(_ * 1000L)
              else None
            Left((retryAfter, s"HTTP $status"))
          } else throw new HttpStatusException(status, url, decodeBody(resp))
        } catch {
          case e: java.io.IOException => Left((None, e.toString))
          case e: InterruptedException => throw e
        }
      outcome match {
        case Right(body) => return body
        case Left((retryAfter, why)) =>
          if (attempt >= cfg.maxRetries)
            throw new java.io.IOException(
              s"GET $url failed after ${attempt + 1} attempts: $why")
          cfg.sleeper(retryAfter.getOrElse(backoff))
          backoff = math.min(backoff * 2, cfg.maxBackoffMs)
          attempt += 1
      }
    }
    sys.error("unreachable")
  }

  /** Token pagination: fetch `firstUrl`, then follow `nextUrl(page)`
    * until it returns None or `maxPages` is reached (the budget stops
    * an API that keeps issuing tokens). Returns the page bodies in
    * order. `nextUrl` inspects each body — typically via
    * [[stringField]] on the reference's `nextPageToken` — and builds
    * the next request URL.
    */
  def paginate(firstUrl: String, nextUrl: String => Option[String],
      cfg: Config = Config(), maxPages: Int = 100): Seq[String] = {
    val pages = Seq.newBuilder[String]
    var url = Option(firstUrl)
    var n = 0
    while (url.isDefined && n < maxPages) {
      val body = get(url.get, cfg)
      pages += body
      url = nextUrl(body)
      n += 1
    }
    pages.result()
  }

  /** Top-level string field from a JSON object body (`"name":"value"`,
    * unescaping the common escapes) — enough to pull a pagination
    * token without a parser dependency; None if absent/null. NOT a
    * general JSON path — nested extraction belongs in Spark
    * ([[JsonIngest.flatten]]) after landing.
    */
  def stringField(body: String, name: String): Option[String] = {
    val re = ("\"" + java.util.regex.Pattern.quote(name) +
      "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
    re.findFirstMatchIn(body).map(m => unescapeJson(m.group(1)))
  }

  /** Single-pass JSON string unescape — chained replaces are
    * order-dependent for adjacent escapes (`\\n` in the wire bytes is
    * an escaped backslash followed by a literal 'n', but a
    * replace-backslashes-then-newlines chain turns it into a newline).
    * A token value containing backslashes must round-trip exactly.
    */
  private def unescapeJson(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => b.append('"'); i += 2
          case '\\' => b.append('\\'); i += 2
          case '/' => b.append('/'); i += 2
          case 'n' => b.append('\n'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 'b' => b.append('\b'); i += 2
          case 'f' => b.append('\f'); i += 2
          case 'u' if i + 5 < s.length &&
              s.substring(i + 2, i + 6).forall(ch =>
                Character.digit(ch, 16) >= 0) =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          // malformed \uXXXX (non-hex digits) in an UNTRUSTED external
          // body: keep the escape verbatim instead of aborting the
          // whole extract with a NumberFormatException
          case 'u' => b.append(c).append('u'); i += 2
          case other => b.append(c).append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** `extract` thunk for [[Pipeline]]: fetches all pages and lands
    * them as ONE JSON array (`[page1,page2,...]`) — the shape
    * [[JsonIngest.readMultiline]] turns into one row per page, so the
    * downstream flatten/tag/cast plan is identical whether the API
    * answered in one page or fifty.
    */
  def paginatedExtract(firstUrl: String, nextUrl: String => Option[String],
      cfg: Config = Config(), maxPages: Int = 100): () => String =
    () => paginate(firstUrl, nextUrl, cfg, maxPages)
      .mkString("[", ",", "]")
}
