package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.Json
import graft.model.{StacCollection, StacItem}
import graft.sink.StacJsonSink

/** Entry point 2 — `envstacgen ingest` (ref cli.py:55-66 →
  * ingest.py:11-65 → dataloader.py:102-194): load a generated STAC
  * catalog tree into pgSTAC with insert-vs-upsert semantics and
  * existence-based skip.
  *
  * The reference probes the DB once per entity (`SELECT EXISTS` per
  * collection/item — an N+1 the docstring itself complains about,
  * dataloader.py:22-25). Here existence is fetched ONCE as key sets and
  * the skip becomes a set-oriented anti-join (J3); writes are batched
  * per partition in FK order — collections before items
  * (dataloader.py:173-189).
  *
  * [[PgStacClient]] is the seam: `JdbcPgStacClient` for a real
  * PostgreSQL (driver must be on the executor classpath), an in-memory
  * fake in the tests — the environment here has no database, so the
  * tested contract is key fetching + skip logic + exact SQL text.
  */
object Ingest {

  trait PgStacClient extends Serializable {
    def existingCollectionIds(): Set[String]
    def existingItemKeys(): Set[(String, String)] // (collection, id)
    def execBatch(statements: Seq[String]): Unit
  }

  final case class Result(collectionsLoaded: Long, itemsLoaded: Long,
                          collectionsSkipped: Long, itemsSkipped: Long)

  def run(spark: SparkSession, catalogRoot: String, client: PgStacClient,
          overwrite: Boolean = false): Result = {
    val collections = StacJsonSink.readCollections(spark, catalogRoot).collect()
    val items = StacJsonSink.readItems(spark, catalogRoot)

    // J3 — skip-existing unless overwrite (dataloader.py:138-154)
    val existingColls = client.existingCollectionIds()
    val (collsToLoad, collsSkipped) =
      if (overwrite) (collections.toSeq, Seq.empty)
      else collections.toSeq.partition(c => !existingColls.contains(c.id))

    // FK order: collections first (dataloader.py:173)
    client.execBatch(collsToLoad.map(collectionSql(_, overwrite)))

    val existingKeys = client.existingItemKeys()
    val toLoad =
      if (overwrite) items
      else {
        import spark.implicits._
        val existingDs = spark.createDataset(existingKeys.toSeq)
          .toDF("collection", "id")
        // broadcast anti-join: the existing key set is small relative to
        // the item stream; at pgSTAC scale this becomes a JDBC-read
        // key-set join instead of a collected Set
        items.join(org.apache.spark.sql.functions.broadcast(existingDs),
          Seq("collection", "id"), "left_anti").as[StacItem]
      }
    val nSkipped = items.count() - toLoad.count()

    val ow = overwrite
    val loaded = spark.sparkContext.longAccumulator("items_loaded")
    toLoad.foreachPartition { part: Iterator[StacItem] =>
      val stmts = part.map(itemSql(_, ow)).toSeq
      if (stmts.nonEmpty) client.execBatch(stmts)
      loaded.add(stmts.size)
    }
    Result(collsToLoad.size.toLong, loaded.value,
      collsSkipped.size.toLong, nSkipped)
  }

  /** pgSTAC collection load: insert, or upsert when overwrite —
    * `Methods.upsert` vs `Methods.insert` (dataloader.py:171).
    */
  def collectionSql(c: StacCollection, overwrite: Boolean): String = {
    val content = Json.obj(Seq(
      "id" -> Json.quote(c.id),
      "title" -> Json.quote(c.title),
      "description" -> Json.quote(c.description),
      "license" -> Json.quote(c.license)))
    val conflict =
      if (overwrite) "ON CONFLICT (id) DO UPDATE SET content = EXCLUDED.content"
      else "ON CONFLICT (id) DO NOTHING"
    s"INSERT INTO collections (id, content) VALUES (${sqlQuote(c.id)}, " +
      s"${sqlQuote(content)}::jsonb) $conflict"
  }

  def itemSql(it: StacItem, overwrite: Boolean): String = {
    val content = Json.obj(Seq(
      "id" -> Json.quote(it.id),
      "collection" -> Json.quote(it.collection),
      "geometry" -> it.geometry,
      "bbox" -> it.bbox.map(Json.dbl).mkString("[", ",", "]"),
      "properties" -> Json.obj(
        it.properties.toSeq.sortBy(_._1).map { case (k, v) => k -> Json.quote(v) })))
    val conflict =
      if (overwrite)
        "ON CONFLICT (id, collection) DO UPDATE SET content = EXCLUDED.content"
      else "ON CONFLICT (id, collection) DO NOTHING"
    s"INSERT INTO items (id, collection, datetime, content) VALUES (" +
      s"${sqlQuote(it.id)}, ${sqlQuote(it.collection)}, " +
      s"${sqlQuote(it.datetime)}::timestamptz, ${sqlQuote(content)}::jsonb) " +
      conflict
  }

  /** SQL string literal: single quotes doubled (no driver param binding
    * in the batch path, so escaping is on us).
    */
  def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Dry-run client: pre-seeded key sets, statements counted but not
    * executed anywhere — the `--dry-run` analogue for validating an
    * ingest (what loads, what skips, what SQL) without a database.
    * Counters are JVM-static, valid in local mode.
    */
  final class DryRunClient(colls: Set[String], items: Set[(String, String)])
      extends PgStacClient {
    def existingCollectionIds(): Set[String] = colls
    def existingItemKeys(): Set[(String, String)] = items
    def execBatch(statements: Seq[String]): Unit =
      DryRunClient.statements.addAndGet(statements.size)
  }
  object DryRunClient {
    val statements = new java.util.concurrent.atomic.AtomicLong()
    def reset(): Unit = statements.set(0)
  }

  /** Real pgSTAC client over plain JDBC (needs the PostgreSQL driver on
    * the classpath; matches the reference's direct-DB fast path,
    * dataloader.py:54-100).
    */
  final class JdbcPgStacClient(url: String) extends PgStacClient {
    private def withConn[T](f: java.sql.Connection => T): T = {
      val c = java.sql.DriverManager.getConnection(url)
      try f(c) finally c.close()
    }
    def existingCollectionIds(): Set[String] = withConn { c =>
      val rs = c.createStatement().executeQuery("SELECT id FROM collections")
      Iterator.continually(rs).takeWhile(_.next()).map(_.getString(1)).toSet
    }
    def existingItemKeys(): Set[(String, String)] = withConn { c =>
      val rs = c.createStatement()
        .executeQuery("SELECT collection, id FROM items")
      Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getString(1), r.getString(2))).toSet
    }
    def execBatch(statements: Seq[String]): Unit = withConn { c =>
      val st = c.createStatement()
      statements.foreach(st.addBatch)
      st.executeBatch()
    }
  }
}
