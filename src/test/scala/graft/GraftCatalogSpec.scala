package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.ops.SnapshotTable
import graft.source.v2.GraftTableSource

/** The snapshot table as a Spark SQL catalog: CREATE TABLE (with
  * partition transforms + layout TBLPROPERTIES), INSERT INTO routed
  * through the commit protocol, SELECT with manifest pruning, VERSION
  * AS OF / TIMESTAMP AS OF, metadata-only ALTERs, SHOW TABLES, DROP.
  */
class GraftCatalogSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("gcat").toString
    spark.conf.set("spark.sql.catalog.graft",
      "graft.source.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", r)
    r
  }

  test("CREATE / INSERT / SELECT / time travel / ALTER / DROP — " +
      "the whole lifecycle in pure SQL") {
    root
    spark.sql("""CREATE TABLE graft.db.t (k BIGINT, v BIGINT, tag STRING)
      PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('stats_col'='v')""")
    // a created-but-never-written table scans as zero rows
    assert(spark.sql("SELECT * FROM graft.db.t").count() === 0)
    assert(spark.table("graft.db.t").columns.toSeq
      === Seq("k", "v", "tag"))

    spark.sql("INSERT INTO graft.db.t " +
      "SELECT id AS k, id * 2 AS v, 'a' AS tag FROM range(100)")
    assert(spark.sql("SELECT count(*) FROM graft.db.t")
      .head.getLong(0) === 100)
    spark.sql("INSERT INTO graft.db.t " +
      "SELECT id, id * 2, 'b' FROM range(100, 150)")
    assert(spark.sql("SELECT sum(v) FROM graft.db.t")
      .head.getLong(0) === (0L until 150L).map(_ * 2).sum)

    // the marker's layout reached the manifest: bucket partitioning
    // prunes a SQL equality, stats prune a range
    val p = s"$root/db/t"
    val ver = SnapshotTable.readVersion(spark,
      p, SnapshotTable.latestVersion(p))
    assert(ver.part.exists(_.transform == "bucket"))
    assert(ver.stats.exists(_.col == "v"))
    GraftTableSource.lastPlan.set((-1, -1))
    assert(spark.sql("SELECT * FROM graft.db.t WHERE k = 7").count() === 1)
    val (planned, total) = GraftTableSource.lastPlan.get()
    assert(planned < total, s"bucket pruning failed: $planned of $total")

    // time travel: version and wall clock
    assert(spark.sql("SELECT count(*) FROM graft.db.t VERSION AS OF 1")
      .head.getLong(0) === 100)
    assert(spark.sql("SELECT count(*) FROM graft.db.t " +
      "TIMESTAMP AS OF '2099-01-01 00:00:00'").head.getLong(0) === 150)

    // metadata-only ALTERs by field id
    spark.sql("ALTER TABLE graft.db.t RENAME COLUMN tag TO label")
    assert(spark.sql("SELECT label FROM graft.db.t WHERE label = 'b'")
      .count() === 50)
    spark.sql("ALTER TABLE graft.db.t DROP COLUMN label")
    assert(spark.table("graft.db.t").columns.toSeq === Seq("k", "v"))
    // old version still reads under its own names
    assert(spark.sql("SELECT tag FROM graft.db.t VERSION AS OF 1")
      .where("tag = 'a'").count() === 100)

    assert(spark.sql("SHOW TABLES IN graft.db").collect()
      .map(_.getString(1)).contains("t"))
    spark.sql("DROP TABLE graft.db.t")
    assert(!spark.catalog.tableExists("graft.db.t"))
  }

  test("DELETE FROM folds a DV commit into a bounded rewrite; " +
      "TRUNCATE TABLE is a zero-file metadata commit — both travel") {
    root
    spark.sql("""CREATE TABLE graft.db.d (k BIGINT, v BIGINT, tag STRING)
      TBLPROPERTIES ('stats_col'='k')""")
    spark.sql("INSERT INTO graft.db.d " +
      "SELECT id, id * 2, concat('t', CAST(id % 3 AS STRING)) " +
      "FROM range(300)")
    spark.sql("DELETE FROM graft.db.d WHERE k >= 100 AND tag = 't1'")
    val after = spark.sql(
      "SELECT count(*) AS n, sum(v) AS sv FROM graft.db.d").head
    val survivors = (0L until 300L)
      .filterNot(k => k >= 100 && k % 3 == 1)
    assert(after.getLong(0) === survivors.length)
    assert(after.getLong(1) === survivors.map(_ * 2).sum)
    // the delete landed as DELETE + OPTIMIZE (fold) — the reader
    // never sees deletion vectors
    val p = s"$root/db/d"
    val latest = SnapshotTable.latestVersion(p)
    val ver = SnapshotTable.readVersion(spark, p, latest)
    assert(ver.dvFiles.isEmpty && ver.op === "OPTIMIZE")
    // v1 still serves the pre-delete table
    assert(spark.sql("SELECT count(*) FROM graft.db.d VERSION AS OF 1")
      .head.getLong(0) === 300)

    spark.sql("TRUNCATE TABLE graft.db.d")
    assert(spark.sql("SELECT * FROM graft.db.d").count() === 0)
    // schema (names AND types) survives the zero-file version
    assert(spark.table("graft.db.d").schema.map(f =>
      (f.name, f.dataType.typeName)).toSeq
      === Seq(("k", "long"), ("v", "long"), ("tag", "string")))
    val tver = SnapshotTable.readVersion(spark, p,
      SnapshotTable.latestVersion(p))
    assert(tver.files.isEmpty && tver.op === "TRUNCATE")
    // a post-truncate insert starts the table again — and the stats
    // LAYOUT survived the truncate, so the new files are indexed
    spark.sql("INSERT INTO graft.db.d SELECT id, id, 'x' FROM range(5)")
    assert(spark.sql("SELECT count(*) FROM graft.db.d")
      .head.getLong(0) === 5)
    assert(SnapshotTable.readVersion(spark, p,
      SnapshotTable.latestVersion(p)).stats.exists(_.col == "k"),
      "stats layout lost across TRUNCATE")
    // an unconditional (or all-matching) DELETE routes to the
    // zero-file commit instead of a rewrite-to-nothing
    spark.sql("DELETE FROM graft.db.d WHERE k >= 0")
    assert(spark.sql("SELECT count(*) FROM graft.db.d")
      .head.getLong(0) === 0)
    assert(SnapshotTable.readVersion(spark, p,
      SnapshotTable.latestVersion(p)).op === "TRUNCATE")
    spark.sql("DROP TABLE graft.db.d")
  }

  test("bucket-partitioned catalog tables storage-partition-join: " +
      "the FunctionCatalog proves both sides agree, no shuffle") {
    root
    spark.sql("""CREATE TABLE graft.db.f1 (k BIGINT, v BIGINT)
      PARTITIONED BY (bucket(8, k))""")
    spark.sql("""CREATE TABLE graft.db.f2 (k BIGINT, w BIGINT)
      PARTITIONED BY (bucket(8, k))""")
    spark.sql("INSERT INTO graft.db.f1 SELECT id, id * 2 FROM range(400)")
    spark.sql("INSERT INTO graft.db.f2 " +
      "SELECT id % 100, id * 10 FROM range(400)")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql("""SELECT f1.k, f1.v, f2.w
        FROM graft.db.f1 f1 JOIN graft.db.f2 f2 ON f1.k = f2.k""")
      assert(j.collect().length === 400) // each f2 row matches one f1.k
      val phys = j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val plan = phys.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucket SPJ still shuffles:\n$plan")
      // not vacuous: it IS a join of the two scans, planned key-grouped
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), s"unexpected join shape:\n$plan")
      // both scans present (not a collapsed/broadcast shape), and the
      // stage's partitioning is the key-grouped one SPJ planned on
      assert("BatchScan graft_table".r.findAllIn(plan).length === 2, plan)
      val leafParts = phys.collectLeaves()
        .map(_.outputPartitioning.getClass.getSimpleName)
      assert(leafParts.forall(_.contains("KeyGroupedPartitioning")),
        s"stage did not carry key-grouped partitioning: $leafParts\n$plan")
    }
    spark.sql("DROP TABLE graft.db.f1")
    spark.sql("DROP TABLE graft.db.f2")
  }

  test("spark.readStream.table tails a catalog table: the commit log " +
      "as a stream, addressed by name") {
    root
    spark.sql("CREATE TABLE graft.db.s (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.db.s SELECT id, id * 2 FROM range(50)")
    val ckpt = Files.createTempDirectory("gcat-ck").toString
    val out = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.table("graft.db.s")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => out.add(r.getLong(0)))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(out.asScala.toSet === (0L until 50L).toSet)
    spark.sql("INSERT INTO graft.db.s SELECT id, id * 2 FROM range(50, 80)")
    val q2 = spark.readStream.table("graft.db.s")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => out.add(r.getLong(0)))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)
    // exactly-once across the restart: only the appended rows arrived
    assert(out.asScala.toSet === (0L until 80L).toSet)
    assert(out.size === 80)
    spark.sql("DROP TABLE graft.db.s")
  }

  test("metadata tables: t.history and t.files serve the log as " +
      "SQL relations") {
    root
    spark.sql("""CREATE TABLE graft.db.h (k BIGINT, v BIGINT)
      TBLPROPERTIES ('stats_col'='k')""")
    spark.sql("INSERT INTO graft.db.h SELECT id, id FROM range(100)")
    spark.sql("INSERT INTO graft.db.h SELECT id, id FROM range(100, 130)")
    spark.sql("DELETE FROM graft.db.h WHERE k < 10")
    val hist = spark.sql(
      "SELECT version, op, rows FROM graft.db.h.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(hist.map(_._2).toSeq
      === Seq("APPEND", "APPEND", "DELETE", "OPTIMIZE"))
    assert(hist.last._3 === 120)
    // files: inventory of the CURRENT version with stats bounds
    val files = spark.sql("SELECT * FROM graft.db.h.files")
    assert(files.count() ===
      SnapshotTable.readVersion(spark, s"$root/db/h", 4).files.length)
    assert(files.agg(org.apache.spark.sql.functions.sum("rows"))
      .head.getLong(0) === 120)
    assert(files.agg(org.apache.spark.sql.functions.min("stats_min"))
      .head.getLong(0) === 10)
    // joinable like any relation
    assert(spark.sql("""SELECT count(*) FROM graft.db.h.files f
      JOIN graft.db.h.history v ON f.rows <= v.rows""").head.getLong(0)
      > 0)
    spark.sql("DROP TABLE graft.db.h")
  }

  test("DataFrameWriterV2: writeTo(...).append() / .overwritePartitions " +
      "route through the same commit protocol") {
    import spark.implicits._
    root
    spark.sql("""CREATE TABLE graft.db.w (k BIGINT, v BIGINT)
      TBLPROPERTIES ('stats_col'='k')""")
    (1L to 60L).map(k => (k, k * 3)).toDF("k", "v")
      .writeTo("graft.db.w").append()
    assert(spark.table("graft.db.w").count() === 60)
    // byName resolution: reordered columns land correctly
    (61L to 70L).map(k => (k * 3, k)).toDF("v", "k")
      .writeTo("graft.db.w").append()
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.w WHERE v = k * 3")
      .head.getLong(0) === 70)
    val ver = SnapshotTable.readVersion(spark, s"$root/db/w", 2)
    assert(ver.stats.exists(_.col == "k"))
    spark.sql("DROP TABLE graft.db.w")
  }

  test("MERGE INTO and UPDATE: group-based copy-on-write in pure SQL, " +
      "groups pruned to the affected files") {
    import spark.implicits._
    root
    spark.sql("""CREATE TABLE graft.db.g (k BIGINT, v BIGINT)
      TBLPROPERTIES ('stats_col'='k')""")
    spark.sql("INSERT INTO graft.db.g SELECT id, id FROM range(100)")
    val p = s"$root/db/g"
    val filesBefore = SnapshotTable.readVersion(spark, p, 1).files.length

    ((50L to 54L).map(k => (k, 1000L + k)) ++
      (200L to 202L).map(k => (k, k)))
      .toDF("k", "v").createOrReplaceTempView("g_src")
    // the static range in ON bounds the GROUP set: manifest stats
    // prune the rewrite to the files that can hold matched keys (the
    // Delta/Iceberg-documented pattern for scale-safe merges)
    spark.sql("""MERGE INTO graft.db.g t
      USING g_src s ON t.k = s.k AND t.k BETWEEN 48 AND 60
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")

    assert(spark.sql("SELECT count(*) FROM graft.db.g")
      .head.getLong(0) === 103)
    assert(spark.sql("SELECT sum(v) FROM graft.db.g WHERE k BETWEEN 50 AND 54")
      .head.getLong(0) === (50L to 54L).map(1000L + _).sum)
    assert(spark.sql("SELECT count(*) FROM graft.db.g WHERE k >= 200")
      .head.getLong(0) === 3)
    // untouched rows intact
    assert(spark.sql("SELECT sum(v) FROM graft.db.g WHERE k < 50")
      .head.getLong(0) === (0L until 50L).sum)
    val v2 = SnapshotTable.readVersion(spark, p, 2)
    assert(v2.op === "MERGE" && v2.rows === 103)
    // group pruning: only the files holding k∈[50,54] were replaced —
    // the rest of v1 carried by reference
    val v1files = SnapshotTable.readVersion(spark, p, 1).files.toSet
    val carried = v2.files.count(v1files)
    assert(carried > 0 && carried < filesBefore,
      s"group rewrite replaced $carried-carried of $filesBefore files")
    // stats survived the swap (pruning still works)
    assert(v2.stats.exists(st => st.col == "k" &&
      st.mins.length == v2.files.length))
    // time travel across the merge
    assert(spark.sql("SELECT count(*) FROM graft.db.g VERSION AS OF 1")
      .head.getLong(0) === 100)

    // UPDATE rides the same machinery — and records its own op
    spark.sql("UPDATE graft.db.g SET v = 0 WHERE k = 10")
    assert(spark.sql("SELECT v FROM graft.db.g WHERE k = 10")
      .head.getLong(0) === 0)
    assert(spark.sql("SELECT count(*) FROM graft.db.g")
      .head.getLong(0) === 103)
    assert(SnapshotTable.readVersion(spark, p,
      SnapshotTable.latestVersion(p)).op === "UPDATE")
    // CHECK constraints gate the rewritten batch: a violating UPDATE
    // aborts and the table stays at its prior version
    SnapshotTable.setConstraints(p,
      Seq(SnapshotTable.Constraint("v_nonneg", "v >= 0")))
    val before = SnapshotTable.latestVersion(p)
    val e = intercept[Exception] {
      spark.sql("UPDATE graft.db.g SET v = -5 WHERE k = 11")
    }
    assert(e.getMessage.contains("constraint") ||
      e.getCause != null &&
        String.valueOf(e.getCause.getMessage).contains("constraint"))
    assert(SnapshotTable.latestVersion(p) === before)
    assert(spark.sql("SELECT v FROM graft.db.g WHERE k = 11")
      .head.getLong(0) === 11)
    spark.sql("DROP TABLE graft.db.g")
  }

  test("namespaces are directories: CREATE / SHOW / DROP NAMESPACE " +
      "with a non-empty guard") {
    root
    spark.sql("CREATE NAMESPACE graft.nsx")
    assert(spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).contains("nsx"))
    spark.sql("CREATE TABLE graft.nsx.t1 (a BIGINT)")
    assert(spark.sql("SHOW TABLES IN graft.nsx").collect()
      .map(_.getString(1)) === Array("t1"))
    intercept[Exception] { spark.sql("DROP NAMESPACE graft.nsx") }
    spark.sql("DROP NAMESPACE graft.nsx CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).contains("nsx"))
  }

  test("pre-commit ALTER rewrites the CREATE marker and keeps the " +
      "declared layout consistent; bad layouts reject at CREATE") {
    root
    spark.sql("""CREATE TABLE graft.db.m (a BIGINT, b BIGINT)
      PARTITIONED BY (a) TBLPROPERTIES ('bloom_col'='b')""")
    spark.sql("ALTER TABLE graft.db.m RENAME COLUMN a TO key")
    assert(spark.table("graft.db.m").columns.toSeq === Seq("key", "b"))
    // first insert honors the renamed layout
    spark.sql("INSERT INTO graft.db.m SELECT id, id FROM range(40)")
    val p = s"$root/db/m"
    val ver = SnapshotTable.readVersion(spark, p, 1)
    assert(ver.part.exists(sp =>
      sp.source == "key" && sp.transform == "identity"))
    assert(ver.bloom.exists(_.col == "b"))
    spark.sql("DROP TABLE graft.db.m")

    // a non-BIGINT partition source rejects at CREATE
    val e = intercept[Exception] {
      spark.sql("""CREATE TABLE graft.db.bad (s STRING, x BIGINT)
        PARTITIONED BY (s)""")
    }
    assert(e.getMessage.contains("BIGINT"))
    // unsupported column types reject at CREATE
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE graft.db.bad2 (m MAP<STRING,STRING>)")
    }
    assert(e2.getMessage.contains("unsupported type"))
  }
}
