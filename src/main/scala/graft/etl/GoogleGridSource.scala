package graft.etl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.{KeyFactory, Signature}
import java.security.spec.PKCS8EncodedKeySpec
import java.time.Duration
import java.util.Base64
import scala.jdk.CollectionConverters._

/** HTTP boundary, injectable so the Google source is fully unit-testable
  * with canned responses under zero egress. Status 0 = transport error.
  */
trait HttpTransport {
  def get(url: String, headers: Map[String, String]): HttpTransport.Response
  def postForm(url: String, form: Map[String, String]): HttpTransport.Response
}

object HttpTransport {
  final case class Response(status: Int, body: String)

  /** java.net.http-backed transport with the reference's 10 s timeouts
    * (src/GoogleSheetsAgent.php:62-63).
    */
  final class Default extends HttpTransport {
    private val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(10)).build()
    private def send(b: HttpRequest.Builder): Response =
      try {
        val r = client.send(b.timeout(Duration.ofSeconds(10)).build(),
          HttpResponse.BodyHandlers.ofString())
        Response(r.statusCode(), r.body())
      } catch { case e: java.io.IOException => Response(0, e.getMessage) }
    def get(url: String, headers: Map[String, String]): Response = {
      val b = HttpRequest.newBuilder(java.net.URI.create(url)).GET()
      headers.foreach { case (k, v) => b.header(k, v) }
      send(b)
    }
    def postForm(url: String, form: Map[String, String]): Response = {
      val body = form.map { case (k, v) =>
        s"$k=${URLEncoder.encode(v, UTF_8)}" }.mkString("&")
      send(HttpRequest.newBuilder(java.net.URI.create(url))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(body)))
    }
  }
}

/** Service-account credentials (R5; reference:
  * src/GoogleSheetsAgent.php:24-27,70-74): validates the key JSON at
  * construction; `accountName` is the client email.
  */
final case class ServiceAccount(clientEmail: String, privateKeyPem: String,
    tokenUri: String)

object ServiceAccount {
  def fromJson(json: String): ServiceAccount = {
    val n = new ObjectMapper().readTree(json)
    def req(f: String): String = {
      val v = n.get(f)
      require(v != null, s"Google key JSON missing field: $f")
      v.asText()
    }
    ServiceAccount(req("client_email"), req("private_key"),
      Option(n.get("token_uri")).map(_.asText())
        .getOrElse("https://oauth2.googleapis.com/token"))
  }
}

/** OAuth2 JWT-bearer token flow for service accounts: RS256-signed JWT
  * exchanged for a bearer token; cached until near expiry.
  */
final class TokenProvider(account: ServiceAccount, transport: HttpTransport,
    scope: String = "https://www.googleapis.com/auth/drive.readonly " +
      "https://www.googleapis.com/auth/spreadsheets.readonly",
    now: () => Long = () => System.currentTimeMillis() / 1000) {

  private val mapper = new ObjectMapper()
  @volatile private var cached: Option[(String, Long)] = None

  private def b64(s: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(s)

  private[etl] def signedJwt(iat: Long): String = {
    val header = b64("""{"alg":"RS256","typ":"JWT"}""".getBytes(UTF_8))
    val claims = b64(
      s"""{"iss":"${account.clientEmail}","scope":"$scope",
         |"aud":"${account.tokenUri}","iat":$iat,"exp":${iat + 3600}}"""
        .stripMargin.replace("\n", "").getBytes(UTF_8))
    val signingInput = s"$header.$claims"
    val der = Base64.getDecoder.decode(
      account.privateKeyPem.replaceAll("-----[A-Z ]+-----", "").replaceAll("\\s", ""))
    val key = KeyFactory.getInstance("RSA")
      .generatePrivate(new PKCS8EncodedKeySpec(der))
    val sig = Signature.getInstance("SHA256withRSA")
    sig.initSign(key)
    sig.update(signingInput.getBytes(UTF_8))
    s"$signingInput.${b64(sig.sign())}"
  }

  def token(): String = cached match {
    case Some((t, exp)) if now() < exp - 60 => t
    case _ =>
      val resp = transport.postForm(account.tokenUri, Map(
        "grant_type" -> "urn:ietf:params:oauth:grant-type:jwt-bearer",
        "assertion" -> signedJwt(now())))
      require(resp.status == 200, s"token exchange failed: ${resp.status}")
      val n = mapper.readTree(resp.body)
      val t = n.get("access_token").asText()
      cached = Some((t, now() + n.get("expires_in").asLong()))
      t
  }
}

/** REST-backed [[GridSource]] over the Google Drive + Sheets APIs
  * (R1–R4; reference: src/GoogleSheetsAgent.php). Pure driver-side — one
  * whole-grid fetch per sheet, which is the reference's own model; the
  * Spark boundary stays `SheetGrid` → `createDataFrame`.
  *
  * Retries: ≤5 with exponential backoff + jitter on 429/5xx/transport
  * errors ([[Retry]]; reference :30-64). Predicate/field pushdown into the
  * API query mirrors the reference exactly: `modifiedTime >= cursor` and
  * `fields=` projections (reference :102-113,141).
  */
final class GoogleGridSource(account: ServiceAccount, transport: HttpTransport,
    sleep: Long => Unit = Thread.sleep) extends GridSource {

  private val mapper = new ObjectMapper()
  private val tokens = new TokenProvider(account, transport)

  def accountName: String = account.clientEmail

  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)

  private final class RetryableStatus(val status: Int)
    extends RuntimeException(s"retryable http $status")

  private def getJson(url: String): JsonNode = {
    val resp = Retry(
      isRetryable = { case e: RetryableStatus => true; case _ => false },
      sleep = sleep) {
      val r = transport.get(url,
        Map("Authorization" -> s"Bearer ${tokens.token()}"))
      if (r.status == 0 || Retry.RetryStatuses.contains(r.status))
        throw new RetryableStatus(r.status)
      r
    }
    if (resp.status == 404) throw new NoSuchElementException("File not found")
    require(resp.status == 200, s"http ${resp.status}: ${resp.body.take(200)}")
    mapper.readTree(resp.body)
  }

  /** R1: discovery scan with server-side predicate + order pushdown and the
    * client-side keyset tuple re-filter (reference :114-121).
    */
  override def list(cursorModified: String, cursorId: String,
      count: Int): Seq[SpreadsheetMeta] = {
    val q = "mimeType='application/vnd.google-apps.spreadsheet' " +
      s"and modifiedTime >= '$cursorModified'"
    val url = "https://www.googleapis.com/drive/v3/files" +
      s"?q=${enc(q)}&orderBy=modifiedTime&pageSize=${math.min(count, 1000)}" +
      s"&fields=${enc("files(id,modifiedTime,name)")}" +
      "&supportsAllDrives=true&includeItemsFromAllDrives=true&corpora=allDrives"
    val files = getJson(url).path("files").elements().asScala.map { f =>
      SpreadsheetMeta(f.get("id").asText(), f.get("modifiedTime").asText(),
        f.get("name").asText())
    }.toSeq
    files.filter(m => m.modifiedTime > cursorModified ||
        (m.modifiedTime == cursorModified && m.id >= cursorId))
      .sortBy(m => (m.modifiedTime, m.id))
      .take(count)
  }

  /** R2: single-file metadata; None ⇔ inaccessible ("File not found"). */
  override def meta(id: String): Option[SpreadsheetMeta] =
    try {
      val f = getJson("https://www.googleapis.com/drive/v3/files/" +
        s"${enc(id)}?fields=${enc("id,modifiedTime,name")}&supportsAllDrives=true")
      Some(SpreadsheetMeta(f.get("id").asText(),
        f.get("modifiedTime").asText(), f.get("name").asText()))
    } catch { case _: NoSuchElementException => None }

  /** R3: whole-grid fetch + content hash (via [[SheetGrid.fromValues]]). */
  override def grid(id: String, sheetName: String): SheetGrid = {
    val n = getJson("https://sheets.googleapis.com/v4/spreadsheets/" +
      s"${enc(id)}/values/${enc(s"'$sheetName'")}?majorDimension=ROWS")
    val values = n.path("values").elements().asScala.map(row =>
      row.elements().asScala.map(_.asText()).toSeq).toSeq
    SheetGrid.fromValues(values)
  }
}
