package graft

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

import org.apache.spark.sql.functions._

import graft.ops.SnapshotTable

/** The race matrix for PLAN-AGAINST-PREV mutations: a COW delete, a
  * merge, or a compaction that loses the version race must FAIL with
  * the conditional-put error — its file arithmetic is stale, and a
  * blind retry would commit a manifest computed against a version
  * that no longer is the base (silently dropping the interleaved
  * commit's rows). Each case asserts the loser throws
  * FileAlreadyExistsException AND that a re-run against the new base
  * lands the intended result with the interleaved commit intact —
  * no lost update under any interleaving.
  */
class RaceMatrixSpec extends SparkSpec {

  private def freshPath(): String =
    Files.createTempDirectory("race").toString + "/t"

  /** Batch directories currently under the table's data root. */
  private def batchDirs(path: String): Set[String] = {
    val root = java.nio.file.Paths.get(path, "files")
    if (!Files.isDirectory(root)) return Set.empty
    val st = Files.list(root)
    try {
      val b = scala.collection.mutable.Set.empty[String]
      st.iterator().forEachRemaining(p => b += p.getFileName.toString)
      b.toSet
    } finally st.close()
  }

  test("append vs COW delete: the delete that lost the version race " +
      "throws the conditional-put error; a re-run lands on the " +
      "appended base with no lost update") {
    import spark.implicits._
    val path = freshPath()
    // big enough that the delete's survivor rewrite far outlasts the
    // tiny interleaved append
    // a fat payload column gives the survivor rewrite real byte
    // weight (~500 MB shuffled+sorted+written) so the tiny interleaved
    // append always commits first
    SnapshotTable.append(
      spark.range(1, 2000001).select(col("id").as("k"),
        repeat(md5(col("id").cast("string")), 8).as("v")),
      path, 4, statsCol = Some("k"))
    val before = batchDirs(path)
    val err = new AtomicReference[Throwable]()
    val done = new AtomicBoolean(false)
    val t = new Thread(() => {
      try SnapshotTable.deleteStatsRange(spark, path, 1L, 500000L)
      catch { case e: Throwable => err.set(e) }
      finally done.set(true)
    })
    t.start()
    // wait until the delete has started materializing its survivor
    // batch — by then it has long since planned against v1
    val deadline = System.currentTimeMillis() + 60000
    while (batchDirs(path) == before && !done.get() &&
        System.currentTimeMillis() < deadline) Thread.sleep(10)
    assert(batchDirs(path) != before, "delete never started its rewrite")
    SnapshotTable.append(
      spark.range(2000001, 2000011).select(col("id").as("k"),
        repeat(md5(col("id").cast("string")), 8).as("v")),
      path, 1, statsCol = Some("k"))
    t.join(120000)
    assert(err.get() != null,
      "the delete must LOSE to the interleaved append and fail loudly")
    assert(err.get().isInstanceOf[java.nio.file.FileAlreadyExistsException],
      s"wrong failure: ${err.get()}")
    // v2 is the append's commit; the failed delete changed nothing
    assert(SnapshotTable.latestVersion(path) === 2L)
    assert(SnapshotTable.scanAt(spark, path, 2)._1.count() === 2000010L)
    // re-run against the new base: delete applies, appended rows stay
    val (v3, _, _) = SnapshotTable.deleteStatsRange(spark, path, 1L, 500000L)
    val (scan, _, rows) = SnapshotTable.scanAt(spark, path, v3)
    assert(rows === 1500010L && scan.count() === 1500010L)
    assert(scan.agg(min("k")).head.getLong(0) === 500001L)
    assert(scan.filter(col("k") > 2000000L).count() === 10L)
  }

  test("merge vs compact: the merge that lost to an interleaved " +
      "OPTIMIZE throws the conditional-put error; a re-run upserts " +
      "against the compacted base") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append((1L to 50000L).map(k => (k, k * 2))
      .toDF("k", "v"), path, 8, statsCol = Some("k"))
    // the merge's update batch trips a one-shot slow gate on first
    // evaluation: by then merge has read prev, and the main thread
    // can commit the conflicting compaction deterministically
    RaceMatrixSpec.gateSeen.set(false)
    val slowOnce = udf((x: Long) => {
      if (RaceMatrixSpec.gateSeen.compareAndSet(false, true))
        Thread.sleep(2500)
      x
    })
    val updates = Seq((777L, 0L)).toDF("k", "v")
      .withColumn("k", slowOnce(col("k")))
    val err = new AtomicReference[Throwable]()
    val t = new Thread(() => {
      try SnapshotTable.merge(spark, path, updates, "k")
      catch { case e: Throwable => err.set(e) }
    })
    t.start()
    val deadline = System.currentTimeMillis() + 60000
    while (!RaceMatrixSpec.gateSeen.get() &&
        System.currentTimeMillis() < deadline) Thread.sleep(5)
    assert(RaceMatrixSpec.gateSeen.get(), "merge never started planning")
    val res = SnapshotTable.compact(spark, path, targetBytes = 64L << 20)
    assert(res.version === 2L && res.rewritten > 0)
    t.join(120000)
    assert(err.get() != null,
      "the merge must LOSE to the interleaved compaction and fail loudly")
    assert(err.get().isInstanceOf[java.nio.file.FileAlreadyExistsException],
      s"wrong failure: ${err.get()}")
    // the compacted base is intact; the failed merge changed nothing
    assert(SnapshotTable.latestVersion(path) === 2L)
    assert(SnapshotTable.scanAt(spark, path, 2)._1
      .filter(col("k") === 777L).head.getLong(1) === 1554L)
    // re-run against the new base: the upsert lands once
    val m = SnapshotTable.merge(spark, path,
      Seq((777L, 0L)).toDF("k", "v"), "k")
    assert(m.rowsMatched === 1L && m.rowsInserted === 0L)
    val (scan, _, _) = SnapshotTable.scanAt(spark, path, m.version)
    val hits = scan.filter(col("k") === 777L).collect()
    assert(hits.length === 1 && hits.head.getLong(1) === 0L)
    assert(scan.count() === 50000L)
  }
  test("SQL MERGE vs INSERT INTO: a catalog-table merge that lost to " +
      "an interleaved insert surfaces the conditional-put error " +
      "through Spark's command exec; a re-run lands on the new base") {
    import spark.implicits._
    val root = Files.createTempDirectory("racesql").toString
    spark.conf.set("spark.sql.catalog.graft_race",
      "graft.source.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_race.root", root)
    spark.sql("""CREATE TABLE graft_race.db.t (k BIGINT, v BIGINT)
      TBLPROPERTIES ('stats_col'='k')""")
    spark.sql("INSERT INTO graft_race.db.t SELECT id, id * 2 FROM range(50000)")
    // a one-shot slow gate on the TARGET side of the ON condition: it
    // first evaluates inside the merge's EXECUTION (group-filter
    // subquery / rewrite join) — strictly after the operation resolved
    // and planned against v1 — so the main thread can land the
    // conflicting INSERT deterministically inside the merge's window.
    // (A gate on the source would fold at ConvertToLocalRelation,
    // BEFORE scan resolution, and the merge would legally re-plan.)
    RaceMatrixSpec.gateSeen.set(false)
    val slowOnce = udf((x: Long) => {
      if (RaceMatrixSpec.gateSeen.compareAndSet(false, true))
        Thread.sleep(8000)
      x
    })
    spark.udf.register("race_gate", slowOnce)
    Seq((777L, 0L)).toDF("k", "v").createOrReplaceTempView("race_src")
    val err = new AtomicReference[Throwable]()
    val t = new Thread(() => {
      try spark.sql("""MERGE INTO graft_race.db.t t USING race_src s
        ON t.k = s.k AND race_gate(t.v) = t.v
        WHEN MATCHED THEN UPDATE SET v = s.v""")
      catch { case e: Throwable => err.set(e) }
    })
    t.start()
    val deadline = System.currentTimeMillis() + 60000
    while (!RaceMatrixSpec.gateSeen.get() &&
        System.currentTimeMillis() < deadline) Thread.sleep(5)
    assert(RaceMatrixSpec.gateSeen.get(), "merge never started planning")
    spark.sql("INSERT INTO graft_race.db.t VALUES (999999, 1)")
    t.join(180000)
    assert(err.get() != null,
      "the SQL merge must LOSE to the interleaved insert and fail loudly")
    def chain(e: Throwable): Seq[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(err.get()).exists(
        _.isInstanceOf[java.nio.file.FileAlreadyExistsException]),
      s"conditional-put error did not surface: ${err.get()}")
    // v2 is the insert's commit; the failed merge changed nothing
    val p = s"$root/db/t"
    assert(SnapshotTable.latestVersion(p) === 2L)
    assert(spark.sql("SELECT count(*) FROM graft_race.db.t")
      .head.getLong(0) === 50001L)
    assert(spark.sql("SELECT v FROM graft_race.db.t WHERE k = 777")
      .head.getLong(0) === 1554L)
    // re-run against the new base: the update lands once, the
    // interleaved insert's row survives
    Seq((777L, 0L)).toDF("k", "v").createOrReplaceTempView("race_src2")
    spark.sql("""MERGE INTO graft_race.db.t t USING race_src2 s
      ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v""")
    assert(spark.sql("SELECT v FROM graft_race.db.t WHERE k = 777")
      .head.getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM graft_race.db.t")
      .head.getLong(0) === 50001L)
    assert(spark.sql("SELECT v FROM graft_race.db.t WHERE k = 999999")
      .head.getLong(0) === 1L)
    spark.sql("DROP TABLE graft_race.db.t")
  }
}

object RaceMatrixSpec {
  val gateSeen = new AtomicBoolean(false)
}
