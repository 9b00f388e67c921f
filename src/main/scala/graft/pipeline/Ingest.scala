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
    /** Existing item keys as a DataFrame. The skip anti-join consumes
      * THIS — never a driver-side Set — so a pgSTAC with 10⁹ items
      * streams through executors instead of materializing on the
      * driver. Default adapts the Set for small/dry-run backends; the
      * JDBC client overrides with a partitioned server-side read.
      */
    def existingItemKeysDF(spark: SparkSession): org.apache.spark.sql.DataFrame = {
      val sp = spark
      import sp.implicits._
      spark.createDataset(existingItemKeys().toSeq).toDF("collection", "id")
    }
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

    val ow = overwrite
    val loaded = spark.sparkContext.longAccumulator("items_loaded")
    val skipped = spark.sparkContext.longAccumulator("items_skipped")
    if (overwrite) {
      items.foreachPartition { part: Iterator[StacItem] =>
        val stmts = part.map(itemSql(_, ow)).toSeq
        if (stmts.nonEmpty) client.execBatch(stmts)
        loaded.add(stmts.size)
      }
    } else {
      // J3 as a distributed join: existing keys come in as a relation
      // (JDBC partitioned read for a real pgSTAC), never a collected
      // Set. No broadcast hint — AQE broadcasts when the key side turns
      // out small and shuffles when it doesn't, which is exactly the
      // scale behavior wanted at 10⁹ existing items. A MARKED left-outer
      // join (null right = not yet in pgSTAC) instead of an anti-join
      // lets ONE action both write the new items and count the skipped
      // ones — the previous shape re-ran the catalog scan and the join
      // twice more just for `items.count() - toLoad.count()`. Key
      // uniqueness ((collection, id) is the pgSTAC primary key) means
      // the join cannot fan out.
      val existing = client.existingItemKeysDF(spark)
        .select("collection", "id")
      val marked = items.joinWith(existing,
        items("collection") === existing("collection") &&
          items("id") === existing("id"), "left_outer")
      marked.foreachPartition {
        part: Iterator[(StacItem, org.apache.spark.sql.Row)] =>
          val stmts = scala.collection.mutable.ArrayBuffer.empty[String]
          part.foreach { case (it, ex) =>
            if (ex == null) stmts += itemSql(it, ow) else skipped.add(1)
          }
          if (stmts.nonEmpty) client.execBatch(stmts.toSeq)
          loaded.add(stmts.size)
      }
    }
    Result(collsToLoad.size.toLong, loaded.value,
      collsSkipped.size.toLong, skipped.value)
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

  /** The `hashtext`-sliced partition predicates for the distributed key
    * read. The separator is `chr(1)` — computed by PostgreSQL, never
    * embedded in the literal — because pg rejects NUL (0x00) inside
    * string literals (`invalid byte sequence for encoding "UTF8"`), and
    * any raw control byte makes the SQL text fragile in transit. Each
    * row matches exactly one predicate for ANY separator, so the choice
    * only shapes hash balance, never coverage.
    */
  def keyReadPredicates(n: Int): Array[String] =
    Array.tabulate(n)(i =>
      s"abs(hashtext(collection || chr(1) || id)) % $n = $i")

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
    /** Partitioned executor-side key read: each task issues its own
      * `hashtext`-sliced predicate, so no single JVM ever holds the full
      * key set (the driver holds only the 16 predicate strings).
      */
    override def existingItemKeysDF(spark: SparkSession)
        : org.apache.spark.sql.DataFrame = {
      val n = math.min(spark.sparkContext.defaultParallelism, 16)
      val predicates = keyReadPredicates(n)
      spark.read.jdbc(url,
        "(SELECT collection, id FROM items) AS existing_keys",
        predicates, new java.util.Properties())
    }
    def execBatch(statements: Seq[String]): Unit = withConn { c =>
      val st = c.createStatement()
      statements.foreach(st.addBatch)
      st.executeBatch()
    }
  }
}
