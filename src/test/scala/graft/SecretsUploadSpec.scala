package graft

import graft.config.UploadConfig
import graft.sinks.Upload
import graft.sources.{ConnectionStringBuilder, SecretResolver}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SecretsSpec extends AnyFunSuite {

  test("vault placeholders resolve inline, multiple per template") {
    val b = new ConnectionStringBuilder(SecretResolver.FromMap(
      Map("db/user" -> "svc", "db/pass" -> "p@{ss}")))
    assert(b.build("Server=x;User={vault:db/user};Password={vault:db/pass}") ==
      "Server=x;User=svc;Password=p@{ss}")
  }

  test("unresolvable path throws; plain strings pass through") {
    val b = new ConnectionStringBuilder(SecretResolver.FromMap(Map.empty))
    assert(b.build("Server=x;Trusted=true") == "Server=x;Trusted=true")
    intercept[IllegalArgumentException](b.build("{vault:missing}"))
  }

  test("resolution cache honors the 5-minute TTL") {
    var now = 0L
    var calls = 0
    val r = new SecretResolver {
      def resolve(p: String): Option[String] = { calls += 1; Some(s"v$calls") }
    }
    val b = new ConnectionStringBuilder(r, cacheTtlMs = 300000, clock = () => now)
    assert(b.build("{vault:k}") == "v1")
    now = 299999
    assert(b.build("{vault:k}") == "v1") // cached
    now = 300001
    assert(b.build("{vault:k}") == "v2") // expired -> re-resolved
  }
  test("HTTP vault: bearer-token GET over live HTTP resolves {vault:...} paths") {
    import com.sun.net.httpserver.HttpServer
    import java.net.InetSocketAddress
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/secret/", { ex =>
      hits.incrementAndGet()
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      val path = ex.getRequestURI.getPath.stripPrefix("/v1/secret/")
      val (code, body) =
        if (auth != "Bearer tok-123") (403, "forbidden")
        else path match {
          case "db/pass" => (200, """{"value":"s3cr3t","lease":60}""")
          case _           => (404, "not found")
        }
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/v1/secret"
      val b = new ConnectionStringBuilder(
        SecretResolver.bearer(base, "tok-123", jsonField = Some("value")))
      assert(b.build("Server=x;Password={vault:db/pass}") ==
        "Server=x;Password=s3cr3t")
      // second build inside the TTL: served from the builder cache, no HTTP
      assert(b.build("{vault:db/pass}") == "s3cr3t")
      assert(hits.get() == 1)
      // missing path and bad token surface as the uniform unresolvable error
      intercept[IllegalArgumentException](b.build("{vault:nope}"))
      val bad = new ConnectionStringBuilder(
        SecretResolver.bearer(base, "wrong", jsonField = Some("value")))
      intercept[IllegalArgumentException](bad.build("{vault:db/pass}"))
    } finally server.stop(0)
  }

  test("HTTP vault: api-key header shape and raw-body (non-JSON) responses") {
    import com.sun.net.httpserver.HttpServer
    import java.net.InetSocketAddress
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/kv/", { ex =>
      val key = ex.getRequestHeaders.getFirst("X-API-Key")
      val body = if (key == "k-9") "raw-secret-bytes" else "nope"
      val code = if (key == "k-9") 200 else 401
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/kv"
      val r = SecretResolver.apiKey(base, "k-9")
      assert(r.resolve("any/path").contains("raw-secret-bytes"))
      assert(SecretResolver.apiKey(base, "bad").resolve("any").isEmpty)
    } finally server.stop(0)
  }
}

class UploadSpec extends SparkSpec {

  private def mkFile(dir: String, name: String, content: String): String = {
    val p = java.nio.file.Paths.get(dir, name)
    Files.writeString(p, content)
    p.toString
  }

  test("place moves the file to the destination with overwrite") {
    val src = graft.util.Scratch.dir("up-src").toString
    val dst = graft.util.Scratch.dir("up-dst").toString
    val f = mkFile(src, "data.parquet", "content-1")
    val res = Upload.place(spark, f, dst, "out.parquet",
      UploadConfig(overwriteExisting = true))
    assert(res.attempts == 1)
    assert(Files.readString(java.nio.file.Paths.get(dst, "out.parquet")) == "content-1")
    // overwrite with new content
    val f2 = mkFile(src, "data2.parquet", "content-2")
    Upload.place(spark, f2, dst, "out.parquet", UploadConfig(overwriteExisting = true))
    assert(Files.readString(java.nio.file.Paths.get(dst, "out.parquet")) == "content-2")
  }

  test("overwriteExisting=false refuses without retrying") {
    val src = graft.util.Scratch.dir("up-src2").toString
    val dst = graft.util.Scratch.dir("up-dst2").toString
    val f = mkFile(src, "a", "x")
    Upload.place(spark, f, dst, "out", UploadConfig(overwriteExisting = true))
    val e = intercept[IllegalStateException] {
      Upload.place(spark, f, dst, "out",
        UploadConfig(overwriteExisting = false, enableRetry = true, maxRetries = 3))
    }
    assert(e.getMessage.contains("overwriteExisting=false"))
  }

  test("transient failures retry up to maxRetries (missing source appears late)") {
    val src = graft.util.Scratch.dir("up-src3").toString
    val dst = graft.util.Scratch.dir("up-dst3").toString
    val missing = src + "/ghost"
    var slept = 0
    // first two attempts fail (no file); create it during the second backoff
    val e = intercept[RuntimeException] {
      Upload.place(spark, missing, dst, "out",
        UploadConfig(overwriteExisting = true, enableRetry = true, maxRetries = 2),
        sleep = _ => slept += 1)
    }
    assert(slept == 1) // maxRetries=2 -> one backoff between two attempts
    assert(e.getMessage.contains("after 2 attempts"))
    mkFile(src, "ghost", "late")
    val res = Upload.place(spark, missing, dst, "out",
      UploadConfig(overwriteExisting = true, enableRetry = true, maxRetries = 2))
    assert(res.bytes == 4)
  }

  test("azureContainerUri substitutes the container into the template") {
    assert(Upload.azureContainerUri(
      "abfss://{container}@acct.dfs.core.windows.net", "raw") ==
      "abfss://raw@acct.dfs.core.windows.net")
    intercept[IllegalArgumentException](Upload.azureContainerUri("x", ""))
  }

  test("keepLocalCopy writes a secondary copy, non-fatal if impossible") {
    val src = graft.util.Scratch.dir("up-src4").toString
    val dst = graft.util.Scratch.dir("up-dst4").toString
    val lc = graft.util.Scratch.dir("up-lc").toString
    val f = mkFile(src, "a", "data")
    val res = Upload.place(spark, f, dst, "out",
      UploadConfig(overwriteExisting = true, keepLocalCopy = true, localCopyPath = lc))
    assert(res.localCopy.isDefined)
    assert(Files.readString(java.nio.file.Paths.get(lc, "out")) == "data")
  }
}
