package graft.sources

import java.util.concurrent.ConcurrentHashMap

/** `{vault:path}` placeholder resolution in connection strings — the reference's
  * `ConnectionStringBuilder` (`/root/reference/src/Infrastructure/Services/
  * ConnectionStringBuilder.cs:17-68`: regex `\{vault:([^}]+)\}`, resolve each
  * path via a vault service, replace inline) with its 5-minute resolution cache
  * (`:77-103`).
  *
  * The HTTP vault backends (Securitas bearer-token, EVA X-API-Key, the
  * reference's `src/Infrastructure/Vault` sources) are deployment-specific credential plumbing,
  * out of scope for the lake engine — the seam is [[SecretResolver]]; env- and
  * map-backed implementations cover tests and most Spark deployments (secrets
  * arrive via env/secret-files on executors).
  */
trait SecretResolver {
  def resolve(path: String): Option[String]
}

object SecretResolver {
  /** Environment-variable-backed: `{vault:DB_PASSWORD}` → env `DB_PASSWORD`. */
  object FromEnv extends SecretResolver {
    def resolve(path: String): Option[String] = sys.env.get(path)
  }
  final case class FromMap(secrets: Map[String, String]) extends SecretResolver {
    def resolve(path: String): Option[String] = secrets.get(path)
  }

  /** Bearer-token HTTP vault (the Securitas shape: `Authorization: Bearer …`,
    * `SecuritasVaultService.cs:59-112`). */
  def bearer(baseUrl: String, token: String,
             jsonField: Option[String] = None): SecretResolver =
    new HttpSecretResolver(baseUrl,
      Map("Authorization" -> s"Bearer $token"), jsonField)

  /** API-key-header HTTP vault (the EVA shape: `X-API-Key: …`,
    * `EvaVaultService.cs:33-69`). */
  def apiKey(baseUrl: String, key: String, headerName: String = "X-API-Key",
             jsonField: Option[String] = None): SecretResolver =
    new HttpSecretResolver(baseUrl, Map(headerName -> key), jsonField)
}

/** Generic HTTP secret backend: GET `baseUrl/<urlencoded path>` with caller-
  * supplied auth headers; a 2xx body is the secret (or one JSON string field
  * of it when `jsonField` is set — both reference vaults return JSON
  * envelopes). Deliberately NOT a reimplementation of any proprietary vault
  * wire protocol: header name/value and envelope field are configuration,
  * which covers the bearer-token and api-key shapes the reference's factory
  * dispatches between (`VaultServiceFactory.cs:23-42`). Non-2xx, transport
  * errors, and a missing JSON field resolve to None — the
  * [[ConnectionStringBuilder]] then throws its uniform unresolvable error, so
  * a half-built connection string can never escape. Freshness/TTL is the
  * builder's 5-minute cache; this class is stateless per call. */
final class HttpSecretResolver(baseUrl: String,
                               headers: Map[String, String] = Map.empty,
                               jsonField: Option[String] = None,
                               timeoutMs: Long = 10000,
                               ssl: Option[javax.net.ssl.SSLContext] = None)
    extends SecretResolver {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  private lazy val client = {
    val b = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
    ssl.foreach(b.sslContext) // mTLS: client cert + pinned trust (CertStore)
    b.build()
  }

  def resolve(path: String): Option[String] = {
    // encode per segment: vault paths ("db/pass") keep their slashes
    val enc = path.split("/").map(java.net.URLEncoder.encode(_, "UTF-8"))
      .mkString("/")
    val req = headers.foldLeft(
        HttpRequest.newBuilder(java.net.URI.create(
            s"${baseUrl.stripSuffix("/")}/$enc"))
          .timeout(java.time.Duration.ofMillis(timeoutMs))) {
        case (b, (k, v)) => b.header(k, v)
      }.GET().build()
    val resp =
      try client.send(req, HttpResponse.BodyHandlers.ofString())
      catch { case scala.util.control.NonFatal(_) => return None }
    if (resp.statusCode() / 100 != 2) None
    else jsonField match {
      case None => Some(resp.body())
      case Some(f) =>
        try {
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(resp.body())
          Option(node.get(f)).filter(_.isTextual).map(_.asText())
        } catch { case scala.util.control.NonFatal(_) => None }
    }
  }
}

final class ConnectionStringBuilder(resolver: SecretResolver,
                                    cacheTtlMs: Long = 5 * 60 * 1000,
                                    clock: () => Long = System.currentTimeMillis) {
  private val pattern = raw"\{vault:([^}]+)\}".r
  private val cache = new ConcurrentHashMap[String, (String, Long)]()

  /** Replace every `{vault:...}` placeholder; unresolvable paths throw, as the
    * reference does (a half-built connection string must never leave here). */
  def build(template: String): String =
    pattern.replaceAllIn(template, m => {
      val path = m.group(1)
      java.util.regex.Matcher.quoteReplacement(cached(path))
    })

  private def cached(path: String): String = {
    val now = clock()
    val hit = cache.get(path)
    if (hit != null && now - hit._2 < cacheTtlMs) hit._1
    else {
      val v = resolver.resolve(path).getOrElse(
        throw new IllegalArgumentException(s"Unresolvable vault path: $path"))
      cache.put(path, (v, now))
      v
    }
  }
}
