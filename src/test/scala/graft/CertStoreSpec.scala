package graft

import graft.sources.{CertStore, ConnectionStringBuilder, HttpSecretResolver}
import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

/** Certificate store + mTLS vault resolution — keytool-generated PKCS12
  * fixtures, an in-process HTTPS server requiring client certificates. */
class CertStoreSpec extends AnyFunSuite {

  private val pw = "changeit"
  private lazy val dir: String = {
    val d = graft.util.Scratch.dir("certs").toString
    def kt(args: String*): Unit = {
      val cmd = Seq("keytool") ++ args
      assert(cmd.! == 0, s"keytool failed: ${cmd.mkString(" ")}")
    }
    // server identity (SAN pins 127.0.0.1 so hostname verification passes)
    kt("-genkeypair", "-alias", "server", "-keyalg", "RSA", "-keysize", "2048",
      "-validity", "1", "-storetype", "PKCS12",
      "-keystore", s"$d/server.p12", "-storepass", pw,
      "-dname", "CN=localhost", "-ext", "SAN=ip:127.0.0.1,dns:localhost")
    // client identity
    kt("-genkeypair", "-alias", "client", "-keyalg", "RSA", "-keysize", "2048",
      "-validity", "1", "-storetype", "PKCS12",
      "-keystore", s"$d/client.p12", "-storepass", pw,
      "-dname", "CN=graft-client,O=Graft")
    // cross-trust: each side trusts the other's self-signed cert
    kt("-exportcert", "-alias", "server", "-keystore", s"$d/server.p12",
      "-storepass", pw, "-file", s"$d/server.cer")
    kt("-exportcert", "-alias", "client", "-keystore", s"$d/client.p12",
      "-storepass", pw, "-file", s"$d/client.cer")
    kt("-importcert", "-noprompt", "-alias", "server", "-file", s"$d/server.cer",
      "-storetype", "PKCS12", "-keystore", s"$d/client-trust.p12", "-storepass", pw)
    kt("-importcert", "-noprompt", "-alias", "client", "-file", s"$d/client.cer",
      "-storetype", "PKCS12", "-keystore", s"$d/server-trust.p12", "-storepass", pw)
    d
  }

  test("find resolves by alias, thumbprint, and subject substring") {
    val byAlias = CertStore.find(s"$dir/client.p12", pw.toCharArray, "client")
    assert(byAlias.isDefined)
    assert(byAlias.get.cert.getSubjectX500Principal.getName.contains("CN=graft-client"))
    // thumbprint lookup, case-insensitive (the .NET Thumbprint form)
    val tp = byAlias.get.thumbprint
    assert(tp.matches("[0-9a-f]{40}"))
    assert(CertStore.find(s"$dir/client.p12", pw.toCharArray, tp.toUpperCase)
      .exists(_.alias == "client"))
    // subject DN substring
    assert(CertStore.find(s"$dir/client.p12", pw.toCharArray, "O=Graft")
      .exists(_.alias == "client"))
    assert(CertStore.find(s"$dir/client.p12", pw.toCharArray, "no-such").isEmpty)
  }

  test("mTLS vault: client-cert-authenticated HTTPS resolution end to end") {
    import com.sun.net.httpserver.{HttpsConfigurator, HttpsParameters, HttpsServer}
    import java.net.InetSocketAddress

    val serverCtx = CertStore.sslContext(s"$dir/server.p12", pw.toCharArray,
      trustStorePath = Some(s"$dir/server-trust.p12"),
      trustStorePassword = pw.toCharArray)
    val server = HttpsServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setHttpsConfigurator(new HttpsConfigurator(serverCtx) {
      override def configure(params: HttpsParameters): Unit = {
        val sp = serverCtx.getDefaultSSLParameters
        sp.setNeedClientAuth(true) // mTLS: reject bare-TLS clients
        params.setSSLParameters(sp)
      }
    })
    server.createContext("/v1/secret/", { ex =>
      val body = """{"value":"tls-s3cr3t"}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val base = s"https://127.0.0.1:${server.getAddress.getPort}/v1/secret"
      val clientCtx = CertStore.sslContext(s"$dir/client.p12", pw.toCharArray,
        trustStorePath = Some(s"$dir/client-trust.p12"),
        trustStorePassword = pw.toCharArray)
      val r = new HttpSecretResolver(base,
        Map("Authorization" -> "Bearer t"), jsonField = Some("value"),
        ssl = Some(clientCtx))
      val b = new ConnectionStringBuilder(r)
      assert(b.build("Password={vault:db/pass}") == "Password=tls-s3cr3t")

      // trust without key material: server demands a client cert, handshake
      // fails, and the resolver surfaces the uniform unresolvable error
      val trustOnly = {
        val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
          javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(CertStore.load(s"$dir/client-trust.p12", pw.toCharArray))
        val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
        ctx.init(null, tmf.getTrustManagers, null)
        ctx
      }
      val bare = new HttpSecretResolver(base, ssl = Some(trustOnly))
      assert(bare.resolve("db/pass").isEmpty)
    } finally server.stop(0)
  }
}
