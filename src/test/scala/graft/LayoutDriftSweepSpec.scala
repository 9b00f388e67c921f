package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.ops.SnapshotTable
import graft.source.v2.GraftTableSource

/** Layout drift under a LIVE stream (the per-epoch validation in
  * [[SnapshotTable.commitAppendFiles]]), the spec-pinned ALTER COLUMN
  * TYPE rejection, and the orphan-segment garbage sweep — the failure
  * modes and sweeps around the table's layout metadata.
  */
class LayoutDriftSweepSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("ldrift").toString

  private def waitFor(what: String, timeoutMs: Long = 60000)
                     (cond: => Boolean): Unit = {
    val t0 = System.currentTimeMillis()
    while (!cond) {
      require(System.currentTimeMillis() - t0 < timeoutMs,
        s"timed out waiting for $what")
      Thread.sleep(100)
    }
  }

  test("renaming the STATS column under a live stream fails the next " +
      "epoch with the mid-stream message and commits nothing partial") {
    import spark.implicits._
    val root = freshDir()
    val src = s"$root/src"
    val sink = s"$root/sink"
    SnapshotTable.append((1L to 50L).map(k => (k, k * 2)).toDF("k", "v"),
      src, 1)
    val q = spark.readStream.format("graft_table").option("path", src)
      .load()
      .writeStream.format("graft_table")
      .option("path", sink)
      .option("stats_col", "k")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      waitFor("first epoch commit")(
        SnapshotTable.latestVersion(sink) >= 1)
      // the stream resolved (stats_col = k) at start; rename under it
      SnapshotTable.renameColumn(spark, sink, "k", "kk")
      val vAfterRename = SnapshotTable.latestVersion(sink)
      val rowsAfterRename = SnapshotTable.readVersion(spark, sink,
        vAfterRename).rows
      // feed the next epoch — its commit must fail the validation
      SnapshotTable.append(
        (51L to 60L).map(k => (k, k * 2)).toDF("k", "v"), src, 1)
      val e = intercept[StreamingQueryException] {
        q.awaitTermination(120000); ()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("changed mid-stream")),
        s"wrong failure: ${msgs(e).mkString(" | ")}")
      // no partial commit: the table is exactly the post-rename state
      assert(SnapshotTable.latestVersion(sink) === vAfterRename)
      assert(SnapshotTable.readVersion(spark, sink, vAfterRename).rows
        === rowsAfterRename)
    } finally if (q.isActive) q.stop()
  }

  test("renaming the PARTITION SOURCE under a live stream fails the " +
      "next epoch with the layout message and commits nothing partial") {
    import spark.implicits._
    val root = freshDir()
    val src = s"$root/src"
    val sink = s"$root/sink"
    SnapshotTable.append((1L to 50L).map(k => (k, k * 2)).toDF("k", "v"),
      src, 1)
    SnapshotTable.appendPartitioned(
      (1L to 20L).map(k => (k, k)).toDF("k", "v"), sink,
      SnapshotTable.PartSpec("k", "bucket", 4))
    val q = spark.readStream.format("graft_table").option("path", src)
      .load()
      .writeStream.format("graft_table")
      .option("path", sink)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      waitFor("first streamed epoch")(
        SnapshotTable.latestVersion(sink) >= 2)
      SnapshotTable.renameColumn(spark, sink, "k", "kk")
      val vAfterRename = SnapshotTable.latestVersion(sink)
      SnapshotTable.append(
        (51L to 60L).map(k => (k, k * 2)).toDF("k", "v"), src, 1)
      val e = intercept[StreamingQueryException] {
        q.awaitTermination(120000); ()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      // the sink write re-resolves the table per epoch: the renamed
      // spec no longer matches the stream's columns and the epoch
      // fails at RESOLUTION (before any file lands); a drift that
      // slipped past resolution would still die on the commit guard's
      // "partition layout changed mid-stream"
      assert(msgs(e).exists(m =>
        m.contains("partition layout changed under the writer") ||
          m.contains("partition layout changed mid-stream")),
        s"wrong failure: ${msgs(e).mkString(" | ")}")
      assert(SnapshotTable.latestVersion(sink) === vAfterRename)
    } finally if (q.isActive) q.stop()
  }

  test("ALTER COLUMN TYPE: safe widenings (int→bigint) are " +
      "metadata-only; everything else rejects loudly with the RTAS " +
      "workaround — committed files keep their written physical type") {
    val r = freshDir()
    spark.conf.set("spark.sql.catalog.graft_ld",
      "graft.source.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ld.root", r)
    spark.sql("CREATE TABLE graft_ld.db.w (a INT, b BIGINT)")
    spark.sql("INSERT INTO graft_ld.db.w SELECT CAST(id AS INT), id " +
      "FROM range(10)")
    val p = s"$r/db/w"
    val v1 = SnapshotTable.readVersion(spark, p, 1)
    // the safe widen: one manifest write, zero files touched (r19)
    spark.sql("ALTER TABLE graft_ld.db.w ALTER COLUMN a TYPE BIGINT")
    val v2 = SnapshotTable.readVersion(spark, p, 2)
    assert(v2.files === v1.files, "widen must not rewrite data")
    assert(spark.table("graft_ld.db.w").schema("a").dataType
      === org.apache.spark.sql.types.LongType)
    assert(spark.sql("SELECT sum(a) FROM graft_ld.db.w")
      .head.getLong(0) === 45)
    // NARROWING never reaches the catalog: Spark's analyzer itself
    // rejects non-up-casts (NOT_SUPPORTED_CHANGE_COLUMN)
    val n = intercept[Exception] {
      spark.sql("ALTER TABLE graft_ld.db.w ALTER COLUMN b TYPE INT")
    }
    assert(n.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
    // an up-cast Catalyst allows but the table format does NOT
    // (long→double changes the physical family) rejects with the
    // atomic-RTAS workaround named
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft_ld.db.w ALTER COLUMN b TYPE DOUBLE")
    }
    assert(e.getMessage.contains("REPLACE TABLE") &&
      e.getMessage.contains("CAST(b AS double)"),
      s"rejection must name the RTAS workaround, got: ${e.getMessage}")
    // the named workaround actually works
    spark.sql("""REPLACE TABLE graft_ld.db.w AS
      SELECT a, CAST(b AS DOUBLE) AS b FROM graft_ld.db.w""")
    assert(spark.table("graft_ld.db.w").schema("b").dataType
      === org.apache.spark.sql.types.DoubleType)
    spark.sql("DROP TABLE graft_ld.db.w")
  }

  test("segment sweep: orphan segments from an abandoned render are " +
      "vacuumed; every segment a retained version references survives; " +
      "expire turns a version's last reference into a sweepable orphan") {
    import spark.implicits._
    val root = freshDir()
    val path = s"$root/t"
    withSQLConf("spark.graft.manifest.segmentThreshold" -> "1") {
      SnapshotTable.append((1L to 30L).map(k => (k, k)).toDF("k", "v"),
        path, 1, statsCol = Some("k"))
      SnapshotTable.append((31L to 60L).map(k => (k, k)).toDF("k", "v"),
        path, 1)
      // a COMPACT rewrites: v3 references a fresh segment, v1/v2's
      // remain referenced only by the retained history
      SnapshotTable.compact(spark, path, targetBytes = 1L << 30)
      val segsOf = (1L to 3L).map(v =>
        SnapshotTable.readVersion(spark, path, v)
          .segRefs.getOrElse(Seq.empty).map(_.name).toSet)
      assert(segsOf.forall(_.nonEmpty), "expected segmented manifests")
      def segFiles(): Set[String] = {
        val d = java.nio.file.Paths.get(path, "log")
        val it = java.nio.file.Files.list(d).iterator()
        val buf = scala.collection.mutable.Set.empty[String]
        it.forEachRemaining { p =>
          val n = p.getFileName.toString
          if (n.startsWith("seg-")) buf += n
        }
        buf.toSet
      }
      // an abandoned render: a valid segment file no header references
      val orphan = "seg-orphan-test.json"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path, "log", orphan),
        """{"files":["/nowhere/x.parquet"],"file_rows":[1],""" +
          """"file_bytes":[10]}""")
      assert(segFiles().contains(orphan))
      val r1 = SnapshotTable.vacuum(spark, path, olderThanMs = 0L)
      val after1 = segFiles()
      assert(!after1.contains(orphan),
        s"orphan segment survived the sweep ($r1)")
      assert(segsOf.flatten.toSet.subsetOf(after1),
        "the sweep deleted a segment a retained version references")
      // history still reads through its segments
      assert(SnapshotTable.readVersion(spark, path, 1).rows === 30)
      // expire v1/v2 → their exclusive segments become orphans
      SnapshotTable.expire(spark, path, keepFrom = 3L)
      SnapshotTable.vacuum(spark, path, olderThanMs = 0L)
      val after2 = segFiles()
      val v3Segs = segsOf(2)
      assert(v3Segs.subsetOf(after2),
        "expire+vacuum deleted a live segment")
      val exclusives = (segsOf(0) ++ segsOf(1)) -- v3Segs
      assert(exclusives.forall(!after2.contains(_)),
        s"expired-only segments not swept: ${exclusives & after2}")
      // the surviving table is intact
      assert(spark.read.format("graft_table").option("path", path)
        .load().count() === 60)
    }
  }
}
