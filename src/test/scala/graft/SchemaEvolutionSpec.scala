package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.SnapshotTable

/** Field-id schema evolution on the snapshot table: rename and drop as
  * metadata-only commits, id-based scan resolution across naming
  * epochs, the never-recycled id fence, the physical-uniformity guard
  * on rewrite ops, and materializeSchema as the uniformity-restoring
  * rewrite. q183 oracle-gates the lifecycle cross-engine.
  */
class SchemaEvolutionSpec extends SparkSpec {

  private def freshPath(): String =
    Files.createTempDirectory("sev").toString + "/t"

  test("add → rename → drop lifecycle: every version scans under its " +
      "own schema, old files serve renamed columns by field id") {
    import spark.implicits._
    val path = freshPath()
    // v1: (k, a)
    SnapshotTable.append(
      (1L to 10L).map(k => (k, k * 10)).toDF("k", "a"), path, 2)
    // v2: adds b — additive, raw mergeSchema fast path stays
    SnapshotTable.append(
      (11L to 20L).map(k => (k, k * 10, k * 100)).toDF("k", "a", "b"),
      path, 2)
    assert(!SnapshotTable.readVersion(spark, path, 2).needsResolve)
    // v3: rename a → a2 (metadata-only: zero data files written)
    val dataFiles = SnapshotTable.readVersion(spark, path, 2).files.toSet
    val v3 = SnapshotTable.renameColumn(spark, path, "a", "a2")
    assert(SnapshotTable.readVersion(spark, path, v3).files.toSet
      === dataFiles)
    // v4: drop b
    val v4 = SnapshotTable.dropColumn(spark, path, "b")

    val (s1, _, _) = SnapshotTable.scanAt(spark, path, 1)
    assert(s1.columns.toSeq === Seq("k", "a"))
    assert(s1.agg(sum("a")).head.getLong(0) === (1L to 10L).map(_ * 10).sum)
    val (s2, _, _) = SnapshotTable.scanAt(spark, path, 2)
    assert(s2.columns.toSeq === Seq("k", "a", "b"))
    assert(s2.filter(col("b").isNull).count() === 10)
    val (s3, _, _) = SnapshotTable.scanAt(spark, path, v3)
    assert(s3.columns.toSeq === Seq("k", "a2", "b"))
    // the OLD files' a-bytes serve a2 — no old-null/new-null fork
    assert(s3.agg(sum("a2")).head.getLong(0)
      === (1L to 20L).map(_ * 10).sum)
    assert(s3.filter(col("a2").isNull).count() === 0)
    val (s4, _, _) = SnapshotTable.scanAt(spark, path, v4)
    assert(s4.columns.toSeq === Seq("k", "a2"))
    assert(s4.count() === 20)
    // history records the ALTERs
    val ops = SnapshotTable.history(spark, path)
      .select("op").as[String].collect()
    assert(ops.count(_ == "ALTER") === 2)
  }

  test("append after rename writes under the new naming and the " +
      "resolved scan unifies epochs; stats pruning survives under " +
      "the renamed layout column") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append(
      (1L to 100L).map(k => (k, k * 2)).toDF("k", "v"), path, 4,
      statsCol = Some("k"))
    SnapshotTable.renameColumn(spark, path, "k", "key")
    // the layout column followed the rename
    assert(SnapshotTable.readVersion(spark, path, 2).stats.get.col
      === "key")
    // post-rename ingest uses the new name
    SnapshotTable.append(
      (101L to 120L).map(k => (k, k * 2)).toDF("key", "v"), path, 1,
      statsCol = Some("key"))
    val (scan, _, _) = SnapshotTable.scanAt(spark, path, 3)
    assert(scan.columns.toSeq === Seq("key", "v"))
    assert(scan.count() === 120)
    assert(scan.agg(sum("key")).head.getLong(0) === (1L to 120L).sum)
    // stats pruning under the new name, across both epochs
    val (pruned, read, total) =
      SnapshotTable.scanStatsRange(spark, path, 3, 101, 120)
    assert(read < total)
    assert(pruned.agg(count(lit(1))).head.getLong(0) === 20)
    assert(pruned.columns.contains("key"))
  }

  test("rename collision and unknown columns are loud") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append(
      Seq((1L, 2L, 3L)).toDF("k", "a", "b"), path, 1)
    val collide = intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(spark, path, "a", "b")
    }
    assert(collide.getMessage.contains("already exists"))
    intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(spark, path, "zz", "y")
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(spark, path, "a", "a")
    }
    // a rename INTO a dropped name is legal: the name is free again
    SnapshotTable.dropColumn(spark, path, "b")
    SnapshotTable.renameColumn(spark, path, "a", "b")
    val (s, _, _) =
      SnapshotTable.scanAt(spark, path, SnapshotTable.latestVersion(path))
    assert(s.columns.toSeq === Seq("k", "b"))
    assert(s.head.getLong(1) === 2L) // a's bytes, never the dropped b's
  }

  test("the id fence: re-adding a dropped column's NAME is a fresh " +
      "id that reads NULL from files predating it — never the " +
      "dropped bytes") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append(
      (1L to 5L).map(k => (k, k * 7)).toDF("k", "b"), path, 1)
    SnapshotTable.dropColumn(spark, path, "b")
    // re-add "b" with different content in a new batch
    SnapshotTable.append(
      (6L to 10L).map(k => (k, k * 1000)).toDF("k", "b"), path, 1)
    val head = SnapshotTable.latestVersion(path)
    val (s, _, _) = SnapshotTable.scanAt(spark, path, head)
    val old = s.filter(col("k") <= 5)
    assert(old.filter(col("b").isNull).count() === 5,
      "dropped bytes resurrected under the re-added name")
    assert(s.filter(col("k") > 5).agg(sum("b")).head.getLong(0)
      === (6L to 10L).map(_ * 1000).sum)
  }

  test("rewrite ops refuse on an altered table and work again after " +
      "materializeSchema; materialize preserves rows, layout and " +
      "folds the ALTERs into physical uniformity") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append(
      (1L to 100L).map(k => (k, k * 2)).toDF("k", "v"), path, 4,
      statsCol = Some("k"))
    SnapshotTable.renameColumn(spark, path, "v", "val")
    val cow = intercept[IllegalArgumentException] {
      SnapshotTable.deleteStatsRange(spark, path, 1, 10)
    }
    assert(cow.getMessage.contains("materializeSchema"))
    intercept[IllegalArgumentException] {
      SnapshotTable.compact(spark, path, 1L << 20)
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.deleteRowsWhere(spark, path, "k <= 3")
    }
    val before = SnapshotTable.scanAt(spark, path,
      SnapshotTable.latestVersion(path))._1
      .orderBy("k").collect().map(_.toSeq)
    val res = SnapshotTable.materializeSchema(spark, path)
    val ver = SnapshotTable.readVersion(spark, path, res.version)
    assert(!ver.needsResolve && ver.epoch > 0)
    assert(ver.stats.get.col === "k")
    val after = SnapshotTable.scanAt(spark, path, res.version)._1
      .orderBy("k").collect().map(_.toSeq)
    assert(after.toSeq === before.toSeq)
    // rewrite ops re-open
    val (v, _, _) = SnapshotTable.deleteStatsRange(spark, path, 1, 10)
    assert(SnapshotTable.scanAt(spark, path, v)._1.count() === 90)
  }

  test("change feed across ALTERs: rename-only interval is empty; " +
      "post-rename appends feed normally; pre-rename churn demands " +
      "segmentation") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append(
      (1L to 10L).map(k => (k, k)).toDF("k", "v"), path, 2,
      statsCol = Some("k"))
    val v2 = SnapshotTable.renameColumn(spark, path, "v", "val")
    assert(SnapshotTable.changes(spark, path, 1, v2).count() === 0)
    // post-rename append: the delta reads fine (current-epoch churn)
    SnapshotTable.append(
      (11L to 15L).map(k => (k, k)).toDF("k", "val"), path, 1,
      statsCol = Some("k"))
    val feed = SnapshotTable.changes(spark, path, v2, v2 + 1)
    assert(feed.filter(col("_change") === "insert").count() === 5)
    assert(feed.columns.contains("val"))
    // churn that PREDATES the rename cannot diff under current naming
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.changes(spark, path, 1, v2 + 1)
    }
    assert(e.getMessage.contains("ALTER"))
  }

  test("clone and restore carry field-id schema; time travel across " +
      "a restore shows each version's own names") {
    import spark.implicits._
    val src = freshPath()
    val dst = freshPath()
    SnapshotTable.append(
      (1L to 10L).map(k => (k, k)).toDF("k", "v"), src, 1)
    val v2 = SnapshotTable.renameColumn(spark, src, "v", "w")
    SnapshotTable.cloneAt(spark, src, dst)
    val (cs, _, _) = SnapshotTable.scanAt(spark, dst, 1)
    assert(cs.columns.toSeq === Seq("k", "w"))
    assert(cs.agg(sum("w")).head.getLong(0) === 55L)
    // restore src to v1: old names come back, id fence holds
    val v3 = SnapshotTable.restore(spark, src, 1)
    val (rs, _, _) = SnapshotTable.scanAt(spark, src, v3)
    assert(rs.columns.toSeq === Seq("k", "v"))
    val (ts, _, _) = SnapshotTable.scanAt(spark, src, v2)
    assert(ts.columns.toSeq === Seq("k", "w"))
  }

  test("dropping layout columns and the last column is refused") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append(
      (1L to 10L).map(k => (k, k)).toDF("k", "v"), path, 1,
      statsCol = Some("k"), bloomCol = Some("k"))
    val st = intercept[IllegalArgumentException] {
      SnapshotTable.dropColumn(spark, path, "k")
    }
    assert(st.getMessage.contains("layout") ||
      st.getMessage.contains("bloom"))
    SnapshotTable.dropColumn(spark, path, "v")
    intercept[IllegalArgumentException] {
      SnapshotTable.dropColumn(spark, path, "k")
    }
  }
}
