package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.SnapshotTable

/** Snapshot-table commit log: version numbering, complete-manifest
  * contents, time-travel isolation (old versions never see newer
  * files), manifest-vs-scan row agreement, and the missing-version
  * guard. q148 oracle-gates the scan arithmetic cross-engine.
  */
class SnapshotTableSpec extends SparkSpec {

  private def freshPath(): String =
    Files.createTempDirectory("snap").toString + "/t"

  test("append assigns consecutive versions and accumulates files") {
    import spark.implicits._
    val path = freshPath()
    val v1 = SnapshotTable.append((1 to 10).toDF("x"), path, 2)
    val v2 = SnapshotTable.append((11 to 13).toDF("x"), path, 1)
    assert(v1 === 1 && v2 === 2)
    assert(SnapshotTable.latestVersion(path) === 2)
    val m1 = SnapshotTable.readVersion(spark, path, 1)
    val m2 = SnapshotTable.readVersion(spark, path, 2)
    assert(m1.rows === 10 && m2.rows === 13)
    assert(m1.files.toSet.subsetOf(m2.files.toSet))
    assert(m2.files.size > m1.files.size)
  }

  test("time travel: v1 scan sees exactly v1's rows after an append") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append((1 to 100).toDF("x"), path, 4)
    SnapshotTable.append((101 to 250).toDF("x"), path, 4)
    val (s1, f1, r1) = SnapshotTable.scanAt(spark, path, 1)
    val (s2, f2, r2) = SnapshotTable.scanAt(spark, path, 2)
    assert(r1 === 100 && r2 === 250)
    assert(f1 < f2)
    assert(s1.count() === 100)
    assert(s2.count() === 250)
    assert(s1.agg(sum("x")).collect().head.getLong(0) === 5050)
  }

  test("a version is readable even while later versions accumulate") {
    import spark.implicits._
    val path = freshPath()
    for (i <- 1 to 5)
      SnapshotTable.append(Seq(i).toDF("x"), path, 1)
    for (v <- 1 to 5) {
      val (scan, _, rows) = SnapshotTable.scanAt(spark, path, v)
      assert(rows === v && scan.count() === v)
    }
  }

  test("column stats prune files and never drop qualifying rows") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append((0L until 1000L).toDF("day"), path, 10,
      statsCol = Some("day"))
    val (scan, read, total) =
      SnapshotTable.scanStatsRange(spark, path, 1, 250, 349)
    assert(total === 10)
    assert(read > 0 && read < total, s"read $read of $total")
    val got = scan.select("day").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (250L to 349L))
    // out-of-domain range: empty relation, zero files
    val (empty, r0, _) =
      SnapshotTable.scanStatsRange(spark, path, 1, 5000, 6000)
    assert(r0 === 0 && empty.count() === 0)
    // a version without stats rejects the stats scan loudly
    val plain = freshPath()
    SnapshotTable.append(Seq(1L).toDF("day"), plain, 1)
    intercept[IllegalArgumentException] {
      SnapshotTable.scanStatsRange(spark, plain, 1, 0, 1)
    }
  }

  test("stats accumulate across appends on the same column") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append((0L until 100L).toDF("day"), path, 2,
      statsCol = Some("day"))
    SnapshotTable.append((100L until 200L).toDF("day"), path, 2,
      statsCol = Some("day"))
    val v2 = SnapshotTable.readVersion(spark, path, 2)
    assert(v2.stats.get.mins.length === v2.files.length)
    val (scan, read, total) =
      SnapshotTable.scanStatsRange(spark, path, 2, 150, 199)
    assert(read < total)
    assert(scan.count() === 50)
  }

  test("copy-on-write delete rewrites only intersecting files and " +
    "preserves time travel") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append((0L until 1000L).toDF("day"), path, 10,
      statsCol = Some("day"))
    val (v2, rewritten, total) =
      SnapshotTable.deleteStatsRange(spark, path, 250, 349)
    assert(v2 === 2 && total === 10)
    assert(rewritten > 0 && rewritten < total, s"rewrote $rewritten")
    val (s2, _, rows2) = SnapshotTable.scanAt(spark, path, 2)
    assert(rows2 === 900 && s2.count() === 900)
    assert(s2.filter(col("day").between(250, 349)).isEmpty)
    // v1 still reads the pre-delete table
    val (s1, _, rows1) = SnapshotTable.scanAt(spark, path, 1)
    assert(rows1 === 1000 && s1.count() === 1000)
    // boundary survivors of the rewritten files are intact
    assert(s2.filter(col("day").between(200, 249)).count() === 50)
    assert(s2.filter(col("day").between(350, 399)).count() === 50)
  }

  test("delete of a non-intersecting range carries all files forward") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append((0L until 100L).toDF("day"), path, 4,
      statsCol = Some("day"))
    val (v2, rewritten, total) =
      SnapshotTable.deleteStatsRange(spark, path, 5000, 6000)
    assert(v2 === 2 && rewritten === 0)
    val (s2, f2, rows2) = SnapshotTable.scanAt(spark, path, 2)
    assert(f2 === total && rows2 === 100 && s2.count() === 100)
  }

  test("schema evolution: an appended column reads as null from old " +
    "files") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append(Seq((1L, 10L)).toDF("k", "a"), path, 1)
    SnapshotTable.append(Seq((2L, 20L, 7L)).toDF("k", "a", "b"), path, 1)
    val (scan, _, _) = SnapshotTable.scanAt(spark, path, 2)
    val rows = scan.orderBy("k").collect()
    assert(rows.length === 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("b")))
    assert(rows(1).getLong(rows(1).fieldIndex("b")) === 7L)
  }

  test("missing version and missing table are loud") {
    import spark.implicits._
    val path = freshPath()
    intercept[IllegalArgumentException] {
      SnapshotTable.readVersion(spark, path, 1)
    }
    SnapshotTable.append(Seq(1).toDF("x"), path, 1)
    intercept[IllegalArgumentException] {
      SnapshotTable.scanAt(spark, path, 7)
    }
  }
}
