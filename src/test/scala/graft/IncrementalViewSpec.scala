package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.{IncrementalView, SnapshotTable}

/** Incremental view maintenance over the snapshot table's change feed:
  * full first build, delta refreshes under append/delete/merge, group
  * death, idempotent no-op, and equality with a from-scratch recompute
  * after every refresh. q164 oracle-gates the arithmetic cross-engine.
  */
class IncrementalViewSpec extends SparkSpec {

  private def fresh(): (String, String) = {
    val d = Files.createTempDirectory("ivm").toString
    (d + "/t", d + "/view")
  }

  private def recomputed(path: String): Map[Long, (Long, Long)] = {
    val v = SnapshotTable.latestVersion(path)
    SnapshotTable.scanAt(spark, path, v)._1
      .groupBy("g").agg(count(lit(1)).as("cnt"),
        sum("x").cast("long").as("sx"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
  }

  private def viewRows(viewPath: String): Map[Long, (Long, Long)] =
    IncrementalView.read(spark, viewPath)
      .collect().map { r =>
        (r.getAs[Long]("g"), (r.getAs[Long]("cnt"), r.getAs[Long]("sx")))
      }.toMap

  test("a refresh that crashed mid-write (state dir without _SUCCESS) " +
      "does not wedge the view — the re-run converges") {
    import spark.implicits._
    val (path, view) = fresh()
    SnapshotTable.append((0L until 100L).map(i => (i, i % 4, i))
      .toDF("day", "g", "x"), path, 2, statsCol = Some("day"))
    // simulate the crash: a partial state-v1 with data but no _SUCCESS
    val partial = java.nio.file.Paths.get(view, "state-v1")
    Files.createDirectories(partial)
    Files.write(partial.resolve("part-00000.parquet"),
      Array[Byte](1, 2, 3))
    val r = IncrementalView.refresh(spark, path, view,
      Seq("g"), Seq("x" -> "sx"))
    assert(r.mode === "full" && r.groups === 4)
  }

  test("full build, then delta refreshes track append and delete") {
    import spark.implicits._
    val (path, view) = fresh()
    val base = (0L until 400L).map(i => (i, i % 8, i * 3))
      .toDF("day", "g", "x")
    SnapshotTable.append(base, path, 4, statsCol = Some("day"))
    val r1 = IncrementalView.refresh(spark, path, view,
      Seq("g"), Seq("x" -> "sx"))
    assert(r1.mode === "full" && r1.tableVersion === 1 && r1.groups === 8)
    assert(viewRows(view) === recomputed(path))

    // append churns only the new files
    SnapshotTable.append(
      (400L until 500L).map(i => (i, i % 8, i * 3)).toDF("day", "g", "x"),
      path, 2, statsCol = Some("day"))
    val r2 = IncrementalView.refresh(spark, path, view,
      Seq("g"), Seq("x" -> "sx"))
    assert(r2.mode === "incremental" && r2.tableVersion === 2)
    assert(viewRows(view) === recomputed(path))

    // delete subtracts
    SnapshotTable.deleteStatsRange(spark, path, 100L, 299L)
    val r3 = IncrementalView.refresh(spark, path, view,
      Seq("g"), Seq("x" -> "sx"))
    assert(r3.mode === "incremental" && r3.tableVersion === 3)
    assert(viewRows(view) === recomputed(path))

    // refresh at head is a no-op
    val r4 = IncrementalView.refresh(spark, path, view,
      Seq("g"), Seq("x" -> "sx"))
    assert(r4.mode === "noop" && r4.tableVersion === 3)
  }

  test("a group whose rows all die leaves the view") {
    import spark.implicits._
    val (path, view) = fresh()
    // group 9 lives only in days 0-9
    val df = (0L until 100L).map(i => (i, if (i < 10) 9L else i % 3, i))
      .toDF("day", "g", "x")
    SnapshotTable.append(df, path, 4, statsCol = Some("day"))
    IncrementalView.refresh(spark, path, view, Seq("g"), Seq("x" -> "sx"))
    assert(viewRows(view).contains(9L))
    SnapshotTable.deleteStatsRange(spark, path, 0L, 9L)
    IncrementalView.refresh(spark, path, view, Seq("g"), Seq("x" -> "sx"))
    val rows = viewRows(view)
    assert(!rows.contains(9L), "dead group survived the refresh")
    assert(rows === recomputed(path))
  }

  test("multi-version catch-up applies the whole gap in one delta") {
    import spark.implicits._
    val (path, view) = fresh()
    SnapshotTable.append((0L until 50L).map(i => (i, i % 4, i))
      .toDF("day", "g", "x"), path, 2, statsCol = Some("day"))
    IncrementalView.refresh(spark, path, view, Seq("g"), Seq("x" -> "sx"))
    // three commits without refreshing
    SnapshotTable.append((50L until 80L).map(i => (i, i % 4, i))
      .toDF("day", "g", "x"), path, 1, statsCol = Some("day"))
    SnapshotTable.deleteStatsRange(spark, path, 10L, 19L)
    SnapshotTable.append((80L until 90L).map(i => (i, i % 4, i))
      .toDF("day", "g", "x"), path, 1, statsCol = Some("day"))
    val r = IncrementalView.refresh(spark, path, view,
      Seq("g"), Seq("x" -> "sx"))
    assert(r.mode === "incremental" && r.tableVersion === 4)
    assert(viewRows(view) === recomputed(path))
  }

  test("unrefreshed view and reserved names are loud") {
    import spark.implicits._
    val (path, view) = fresh()
    intercept[IllegalArgumentException] {
      IncrementalView.read(spark, view)
    }
    SnapshotTable.append(Seq((1L, 1L)).toDF("day", "cnt"), path, 1)
    intercept[IllegalArgumentException] {
      IncrementalView.refresh(spark, path, view, Seq("cnt"), Seq.empty)
    }
  }
}
