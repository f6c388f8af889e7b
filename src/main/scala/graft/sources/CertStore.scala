package graft.sources

import java.io.FileInputStream
import java.security.{KeyStore, MessageDigest}
import java.security.cert.X509Certificate
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** Certificate store for mTLS-authenticated vault/upload endpoints — the
  * reference's `LocalCertificateService` contract (`/root/reference/src/
  * Infrastructure/Certificate/LocalCertificateService.cs:28-80`: X509 lookup
  * by thumbprint or subject from a certificate store, result cached)
  * re-expressed on the JVM's public keystore APIs.
  *
  * The OS certificate store is platform plumbing; the portable JVM analogue
  * is a keystore FILE (PKCS12/JKS — what every Spark deployment already
  * mounts for TLS). Lookup semantics match the reference: by alias (the
  * store key), by SHA-1 thumbprint (hex, case-insensitive — the .NET
  * `X509Certificate2.Thumbprint` form), or by subject DN substring.
  * Loaded stores are cached per (path, mtime), so repeated resolutions (one
  * per pipeline stage) don't re-read the file; a rotated file busts the
  * cache by mtime, the same freshness story as the secret TTL cache.
  *
  * [[sslContext]] builds the client-side mTLS material: the keystore's key
  * entries authenticate us, `trustStorePath` (or the JVM default trust
  * anchors when absent) authenticates the server. The result plugs into
  * [[HttpSecretResolver]]'s `ssl` parameter.
  */
object CertStore {

  final case class Entry(alias: String, cert: X509Certificate, thumbprint: String)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Vector[Entry]]()

  private def mtime(path: String): Long =
    try java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(path)).toMillis
    catch { case _: java.io.IOException => -1L }

  /** Hex SHA-1 of the DER encoding — the standard X509 thumbprint form. */
  def thumbprint(cert: X509Certificate): String =
    MessageDigest.getInstance("SHA-1").digest(cert.getEncoded)
      .map(b => f"$b%02x").mkString

  def load(path: String, password: Array[Char],
           storeType: String = "PKCS12"): KeyStore = {
    val ks = KeyStore.getInstance(storeType)
    val in = new FileInputStream(path)
    try ks.load(in, password) finally in.close()
    ks
  }

  private def entries(path: String, password: Array[Char],
                      storeType: String): Vector[Entry] =
    cache.computeIfAbsent((path, mtime(path)), { _ =>
      val ks = load(path, password, storeType)
      val aliases = ks.aliases()
      val out = Vector.newBuilder[Entry]
      while (aliases.hasMoreElements) {
        val a = aliases.nextElement()
        ks.getCertificate(a) match {
          case c: X509Certificate => out += Entry(a, c, thumbprint(c))
          case _ =>
        }
      }
      out.result()
    })

  /** Find by alias, SHA-1 thumbprint (hex, any case), or subject DN
    * substring — tried in that order, same resolution ladder as the
    * reference's find-by-thumbprint / find-by-subject pair. */
  def find(path: String, password: Array[Char], key: String,
           storeType: String = "PKCS12"): Option[Entry] = {
    val es = entries(path, password, storeType)
    es.find(_.alias == key)
      .orElse(es.find(_.thumbprint.equalsIgnoreCase(key)))
      .orElse(es.find(_.cert.getSubjectX500Principal.getName.contains(key)))
  }

  /** Client SSLContext for mTLS: key material from `keyStorePath`, server
    * trust from `trustStorePath` (JVM default anchors when None). */
  def sslContext(keyStorePath: String, keyStorePassword: Array[Char],
                 trustStorePath: Option[String] = None,
                 trustStorePassword: Array[Char] = Array.emptyCharArray,
                 storeType: String = "PKCS12"): SSLContext = {
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(load(keyStorePath, keyStorePassword, storeType), keyStorePassword)
    val tms = trustStorePath match {
      case Some(p) =>
        val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(load(p, trustStorePassword, storeType))
        tmf.getTrustManagers
      case None => null
    }
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tms, null)
    ctx
  }
}
