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
