package graft

import java.nio.file.Files
import graft.model.{StacAsset, StacCatalog, StacCollection, StacItem}
import graft.pipeline.Ingest
import graft.sink.StacJsonSink
import graft.source.ZarrProbe

/** S9/J3/J4/K6 — ingest semantics against an in-memory pgSTAC client
  * (no database in this environment; the contract under test is key
  * fetching, skip logic, FK ordering, and the exact SQL), plus the S7
  * zarr probe.
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._


  private def writeCatalog(): String = {
    val root = Files.createTempDirectory("graft-ingest").toString
    val items = Seq("i1", "i2", "i3").map { id =>
      StacItem(id, "c1", """{"type": "Polygon", "coordinates": []}""",
        Seq(0.0, 0.0, 1.0, 1.0), "2025-01-01T00:00:00Z",
        Map("forecast:leadtime_length" -> "3"),
        Seq(StacAsset("data", s"./x/$id.nc", "application/x-netcdf", "t",
          Seq("data"), null, -1L, Map.empty)))
    }
    StacJsonSink.write(root, StacCatalog("cat", "d", Seq("c1")),
      Seq(StacCollection("c1", "c1", "d", "CC-BY-4.0",
        Seq(0.0, 0.0, 1.0, 1.0), "2025-01-01T00:00:00Z",
        "2025-01-03T00:00:00Z", Map.empty)),
      items.toDS())
    root
  }

  test("J3 skip-existing: present collections and items are not reloaded") {
    val root = writeCatalog()
    val client = new FakeClient(colls = Set("c1"),
      items = Set(("c1", "i1"), ("c1", "i3"))); FakeClient.reset()
    val res = Ingest.run(spark, root, client)
    assert(res.collectionsLoaded === 0 && res.collectionsSkipped === 1)
    assert(res.itemsLoaded === 1 && res.itemsSkipped === 2)
    val stmts = client.all
    assert(stmts.count(_.startsWith("INSERT INTO items")) === 1)
    assert(stmts.exists(_.contains("'i2'")))
  }

  test("J4 overwrite: everything loads with ON CONFLICT DO UPDATE") {
    val root = writeCatalog()
    val client = new FakeClient(colls = Set("c1"), items = Set(("c1", "i1")))
    FakeClient.reset()
    val res = Ingest.run(spark, root, client, overwrite = true)
    assert(res.collectionsLoaded === 1 && res.itemsLoaded === 3)
    assert(client.all.forall(_.contains("DO UPDATE SET content")))
  }

  test("K6 FK order: collections batch executes before any item batch") {
    val root = writeCatalog()
    val client = new FakeClient(); FakeClient.reset()
    Ingest.run(spark, root, client)
    val kinds = client.all.map(s =>
      if (s.startsWith("INSERT INTO collections")) "c" else "i")
    assert(kinds.head === "c")
    assert(kinds.dropWhile(_ == "c").forall(_ == "i"))
  }

  test("SQL escaping: single quotes in values are doubled") {
    assert(Ingest.sqlQuote("o'brien") === "'o''brien'")
    val it = StacItem("id'1", "c", "{}", Seq(0.0), "2025-01-01T00:00:00Z",
      Map.empty, Seq.empty)
    assert(Ingest.itemSql(it, overwrite = false).contains("'id''1'"))
  }

  test("J3 consumes the key RELATION, never the driver-side Set") {
    // a client whose Set accessor explodes but whose DataFrame works:
    // run() must succeed, proving the anti-join is fed by the relation
    // (the JDBC client's partitioned executor-side read at scale)
    val root = writeCatalog()
    val client = new RelationOnlyClient(Set(("c1", "i2"))); FakeClient.reset()
    val res = Ingest.run(spark, root, client)
    assert(res.itemsLoaded === 2 && res.itemsSkipped === 1)
  }

  test("S9 key-read predicates: NUL-free valid UTF-8, pg-shaped syntax") {
    // The round-5/6 production bug: a raw 0x00 inside the hashtext
    // separator literal, which PostgreSQL rejects in any string literal
    // (`invalid byte sequence for encoding "UTF8"`). Render EVERY
    // predicate the client can issue and assert it is clean text.
    for (n <- Seq(1, 7, 16); pred <- Ingest.keyReadPredicates(n)) {
      assert(!pred.exists(_ < ' '), s"control byte in predicate: $pred")
      val bytes = pred.getBytes("UTF-8")
      assert(new String(bytes, "UTF-8") === pred) // round-trips as UTF-8
      assert(!bytes.contains(0.toByte))
      // pg-syntax-shaped: must parse as a SQL boolean expression
      // (hashtext/chr resolve server-side; parse is the local gate)
      spark.sessionState.sqlParser.parseExpression(pred)
    }
    // the upsert surface too — no batch statement may carry control bytes
    val it = StacItem("i", "c", "{}", Seq(0.0), "2025-01-01T00:00:00Z",
      Map("k" -> "v"), Seq.empty)
    for (s <- Seq(Ingest.itemSql(it, overwrite = false),
                  Ingest.itemSql(it, overwrite = true),
                  Ingest.collectionSql(StacCollection("c", "t", "d", "l",
                    Seq(0.0), "a", "b", Map.empty), overwrite = true)))
      assert(!s.exists(_ < ' '), s"control byte in statement: $s")
  }

  test("S9 key-read predicates partition every row exactly once") {
    // Execute the predicate SQL through a real engine (Spark accepts the
    // same `abs(h(...)) % n = i` shape; `chr` is evaluated engine-side
    // exactly as pg would) with a stand-in hashtext. Coverage must be a
    // partition: each key matches exactly ONE slice, slices sum to all.
    spark.udf.register("hashtext", (s: String) => s.hashCode)
    Seq(("c1", "i1"), ("c1", "i2"), ("c2", "i1"), ("c'3", "x||y"))
      .toDF("collection", "id").createOrReplaceTempView("existing_keys_t")
    val n = 7
    val counts = Ingest.keyReadPredicates(n).map(p =>
      spark.sql(s"SELECT count(*) FROM existing_keys_t WHERE $p")
        .head().getLong(0))
    assert(counts.sum === 4L)
    val perRow = Ingest.keyReadPredicates(n).map(p =>
      spark.sql(s"SELECT collection, id FROM existing_keys_t WHERE $p")
        .collect().toSeq).toSeq.flatten
    assert(perRow.distinct.size === 4) // no row lands in two slices
  }

  test("S9/S10 legacy API mode: existence probes route through the STAC " +
    "API, writes through the wrapped client (dataloader.py:54-100)") {
    // stub STAC API on an ephemeral port: c1 and (c1, i1) exist
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    server.createContext("/", { exchange =>
      val p = exchange.getRequestURI.getPath
      hits.add(p)
      val code = p match {
        case "/" | "/collections/c1" | "/collections/c1/items/i1" => 200
        case _ => 404
      }
      exchange.sendResponseHeaders(code, -1)
      exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val root = writeCatalog()
      val writes = new FakeClient(); FakeClient.reset()
      val client = Ingest.ApiModeClient.connect(base, writes,
        retries = 3, delayMs = 1)
      val res = Ingest.run(spark, root, client)
      // c1 exists (200) → skipped; i1 exists → skipped, i2/i3 load
      assert(res.collectionsLoaded === 0 && res.collectionsSkipped === 1)
      assert(res.itemsLoaded === 2 && res.itemsSkipped === 1)
      val stmts = writes.all
      assert(stmts.count(_.startsWith("INSERT INTO items")) === 2)
      assert(!stmts.exists(_.contains("'i1'")))
      // the probes actually went over HTTP, one GET per entity
      import scala.jdk.CollectionConverters._
      val paths = hits.iterator().asScala.toSet
      assert(paths.contains("/collections/c1"))
      assert(paths.contains("/collections/c1/items/i2"))
      // overwrite skips every probe: only the readiness GET again
      hits.clear(); FakeClient.reset()
      val res2 = Ingest.run(spark, root,
        Ingest.ApiModeClient.connect(base, writes, retries = 1, delayMs = 1),
        overwrite = true)
      assert(res2.collectionsLoaded === 1 && res2.itemsLoaded === 3)
      assert(hits.iterator().asScala.toSet === Set("/"))
    } finally server.stop(0)
  }

  test("S10 readiness gate: unreachable API fails the connect after the " +
    "retry budget (dataloader.py:49-51 exit(1))") {
    val boom = new Ingest.StacApiProbe {
      def getStatus(url: String): Int = throw new java.io.IOException("down")
    }
    val e = intercept[IllegalStateException] {
      Ingest.ApiModeClient.connect("http://127.0.0.1:1", new FakeClient(),
        probe = boom, retries = 2, delayMs = 1)
    }
    assert(e.getMessage.contains("2 attempts"))
  }

  test("S7 zarr probe: dtype from .zarray, recursive size sum") {
    val store = Files.createTempDirectory("graft-zarr")
    Files.createDirectories(store.resolve("var"))
    Files.writeString(store.resolve("var/.zarray"),
      """{"dtype": "<f8", "shape": [4, 4], "chunks": [2, 2]}""")
    Files.write(store.resolve("var/0.0"), new Array[Byte](32))
    Files.write(store.resolve("var/0.1"), new Array[Byte](32))
    val info = ZarrProbe.probe(store).get
    assert(info.dataType === "float64" && info.bitDepth === 64)
    assert(info.byteOrder === "little-endian")
    assert(info.totalSize > 64) // chunks + .zarray json
    assert(ZarrProbe.parseDtype(">i4") === (("int32", 32, "big-endian")))
    assert(ZarrProbe.probe(store.resolve("nope")).isEmpty)
  }
}

/** Top-level (serializable, no suite capture); executed statements land
  * in a JVM-static buffer — valid in local mode where executor tasks
  * share the JVM.
  */
class FakeClient(colls: Set[String] = Set.empty,
                 items: Set[(String, String)] = Set.empty)
    extends Ingest.PgStacClient {
  def existingCollectionIds(): Set[String] = colls
  def existingItemKeys(): Set[(String, String)] = items
  def execBatch(statements: Seq[String]): Unit =
    statements.foreach(FakeClient.executed.add)
  def all: Seq[String] = {
    import scala.jdk.CollectionConverters._
    FakeClient.executed.iterator().asScala.toSeq
  }
}

object FakeClient {
  val executed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def reset(): Unit = executed.clear()
}

/** Provides keys only as a DataFrame; the Set accessor throws so any
  * regression back to driver-side materialization fails loudly.
  */
class RelationOnlyClient(keys: Set[(String, String)])
    extends FakeClient(colls = Set("c1")) {
  override def existingItemKeys(): Set[(String, String)] =
    throw new UnsupportedOperationException(
      "item keys must be consumed as a relation")
  override def existingItemKeysDF(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    val sp = spark
    import sp.implicits._
    spark.createDataset(keys.toSeq).toDF("collection", "id")
  }
}
