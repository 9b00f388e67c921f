package graft

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

import org.apache.spark.sql.functions._

import graft.ops.SnapshotTable

/** The race matrix for PLAN-AGAINST-PREV mutations, under OCC
  * conflict detection: a COW delete, merge, or compaction that loses
  * the version race AUTO-REBASES when the winner's commit is provably
  * disjoint from its read set (an interleaved append elsewhere in the
  * key space — the rewrite re-commits against the new base, winner's
  * rows intact), and FAILS LOUDLY — ConcurrentModificationException
  * with the conditional-put loss as cause — when the winner touched
  * its inputs or offered no disjointness proof. Every interleaving
  * asserts no lost update.
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
      "to a DISJOINT append auto-rebases — one commit, appended rows " +
      "intact, no lost update") {
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
    // the appended keys [2000001, 2000010] are provably outside the
    // delete range [1, 500000] — the delete AUTO-REBASES onto the
    // appended base instead of failing
    assert(err.get() == null,
      s"a disjoint interleaved append must rebase, got ${err.get()}")
    assert(SnapshotTable.latestVersion(path) === 3L,
      "v2 = the append's commit, v3 = the rebased delete")
    assert(SnapshotTable.readVersion(spark, path, 3).op === "DELETE")
    val (scan, _, rows) = SnapshotTable.scanAt(spark, path, 3)
    assert(rows === 1500010L && scan.count() === 1500010L)
    assert(scan.agg(min("k")).head.getLong(0) === 500001L)
    assert(scan.filter(col("k") > 2000000L).count() === 10L,
      "the interleaved append's rows must survive the rebased delete")
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
    // the compaction REWROTE files the merge read: no rebase — the
    // conflict surfaces as ConcurrentModificationException with the
    // conditional-put loss as cause
    assert(err.get()
      .isInstanceOf[java.util.ConcurrentModificationException],
      s"wrong failure: ${err.get()}")
    assert(err.get().getCause
      .isInstanceOf[java.nio.file.FileAlreadyExistsException],
      s"missing conditional-put cause: ${err.get().getCause}")
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

  test("merge vs DISJOINT interleaved append: the merge auto-rebases " +
      "— upsert lands once, appended rows intact") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append((1L to 50000L).map(k => (k, k * 2))
      .toDF("k", "v"), path, 8, statsCol = Some("k"))
    RaceMatrixSpec.gateSeen.set(false)
    val slowOnce = udf((x: Long) => {
      if (RaceMatrixSpec.gateSeen.compareAndSet(false, true))
        Thread.sleep(2500)
      x
    })
    val updates = Seq((777L, 0L)).toDF("k", "v")
      .withColumn("k", slowOnce(col("k")))
    val err = new AtomicReference[Throwable]()
    val res = new AtomicReference[SnapshotTable.MergeResult]()
    val t = new Thread(() => {
      try res.set(SnapshotTable.merge(spark, path, updates, "k"))
      catch { case e: Throwable => err.set(e) }
    })
    t.start()
    val deadline = System.currentTimeMillis() + 60000
    while (!RaceMatrixSpec.gateSeen.get() &&
        System.currentTimeMillis() < deadline) Thread.sleep(5)
    assert(RaceMatrixSpec.gateSeen.get(), "merge never started planning")
    // the interleaved append's keys are far outside the update
    // batch's layout range [777, 777]
    SnapshotTable.append((900001L to 900010L).map(k => (k, k))
      .toDF("k", "v"), path, 1, statsCol = Some("k"))
    t.join(120000)
    assert(err.get() == null,
      s"a disjoint interleaved append must rebase, got ${err.get()}")
    assert(res.get().version === 3L,
      "v2 = the append's commit, v3 = the rebased merge")
    assert(res.get().rowsMatched === 1L && res.get().rowsInserted === 0L)
    val (scan, _, _) = SnapshotTable.scanAt(spark, path, 3)
    val hits = scan.filter(col("k") === 777L).collect()
    assert(hits.length === 1 && hits.head.getLong(1) === 0L,
      "the upsert must land exactly once")
    assert(scan.filter(col("k") > 900000L).count() === 10L,
      "the interleaved append's rows must survive the rebased merge")
    assert(scan.count() === 50010L)
  }

  test("compact vs interleaved append: compaction is predicate-free " +
      "— ANY disjoint append rebases; the appended file simply is " +
      "not compacted this pass") {
    import spark.implicits._
    val path = freshPath()
    // many small files so the compaction rewrite has real work
    (0 until 8).foreach { b =>
      SnapshotTable.append(
        spark.range(b * 100000L, (b + 1) * 100000L)
          .select(col("id").as("k"),
            repeat(md5(col("id").cast("string")), 4).as("v")),
        path, 2, statsCol = Some("k"))
    }
    val before = batchDirs(path)
    val err = new AtomicReference[Throwable]()
    val res = new AtomicReference[SnapshotTable.CompactResult]()
    val t = new Thread(() => {
      try res.set(SnapshotTable.compact(spark, path,
        targetBytes = 256L << 20))
      catch { case e: Throwable => err.set(e) }
    })
    t.start()
    val deadline = System.currentTimeMillis() + 60000
    var appended = false
    while (!appended && System.currentTimeMillis() < deadline) {
      if (batchDirs(path) != before) {
        SnapshotTable.append(
          spark.range(800000L, 800010L).select(col("id").as("k"),
            repeat(md5(col("id").cast("string")), 4).as("v")),
          path, 1, statsCol = Some("k"))
        appended = true
      } else Thread.sleep(5)
    }
    t.join(120000)
    if (appended && err.get() == null && res.get() != null &&
        res.get().version > 9L) {
      // the append won the race window: the compaction rebased
      assert(res.get().version === 10L)
    }
    assert(err.get() == null,
      s"an interleaved append must never fail a compaction, got " +
        s"${err.get()}")
    val latest = SnapshotTable.latestVersion(path)
    val (scan, _, rows) = SnapshotTable.scanAt(spark, path, latest)
    assert(rows === 800010L && scan.count() === 800010L,
      "every row — compacted and interleaved — must survive")
    assert(scan.agg(sum("k")).head.getLong(0)
      === (0L until 800000L).sum + (800000L until 800010L).sum)
  }

  test("two concurrent native streaming sinks on one table serialize " +
      "through the conditional put — both land, consecutive versions, " +
      "no lost epoch") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("race2s").toString
    val dst = s"$dir/dst"
    val srcA = s"$dir/srcA"
    val srcB = s"$dir/srcB"
    SnapshotTable.append((1L to 5000L).map(k => (k, k))
      .toDF("k", "v"), srcA, 4)
    SnapshotTable.append((5001L to 10000L).map(k => (k, k))
      .toDF("k", "v"), srcB, 4)
    SnapshotTable.append(Seq((0L, 0L)).toDF("k", "v"), dst, 1,
      statsCol = Some("k"))
    def start(src: String, ckpt: String) =
      spark.readStream.format("graft_table").option("path", src).load()
        .writeStream.format("graft_table")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
    val qa = start(srcA, s"$dir/ckptA")
    val qb = start(srcB, s"$dir/ckptB")
    qa.awaitTermination(120000)
    qb.awaitTermination(120000)
    val latest = SnapshotTable.latestVersion(dst)
    assert(latest === 3L,
      s"two epoch commits must land at consecutive versions, got $latest")
    val t = spark.read.format("graft_table").option("path", dst).load()
    assert(t.count() === 10001L)
    assert(t.agg(sum("k")).head.getLong(0) === (1L to 10000L).sum)
    // both writers' txn watermarks recorded — each stream is
    // independently replay-safe
    val txns = SnapshotTable.readVersion(spark, dst, latest).txns
    assert(txns.keys.count(_.startsWith("stream-")) === 2,
      s"both streaming writers must carry watermarks: $txns")
  }

  test("rebased merge never REGRESSES a writer's txn watermark: the " +
      "winner advanced it, the rebase keeps the per-writer max") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append((1L to 20000L).map(k => (k, k)).toDF("k", "v"),
      path, 4, statsCol = Some("k"), txn = Some(("w", 3L)))
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
      try SnapshotTable.merge(spark, path, updates, "k",
        txn = Some(("w", 4L)))
      catch { case e: Throwable => err.set(e) }
    })
    t.start()
    val deadline = System.currentTimeMillis() + 60000
    while (!RaceMatrixSpec.gateSeen.get() &&
        System.currentTimeMillis() < deadline) Thread.sleep(5)
    // the same writer's LATER batch wins the race with a disjoint key
    SnapshotTable.append(Seq((900001L, 1L)).toDF("k", "v"), path, 1,
      statsCol = Some("k"), txn = Some(("w", 5L)))
    t.join(120000)
    assert(err.get() == null,
      s"disjoint interleave must rebase, got ${err.get()}")
    val ver = SnapshotTable.readVersion(spark, path,
      SnapshotTable.latestVersion(path))
    assert(ver.txns("w") === 5L,
      s"rebase regressed the watermark to ${ver.txns("w")} — a " +
        "crash-recovery replay of batch 5 would re-apply it")
    // and the merge's own effect landed exactly once
    val (scan, _, _) = SnapshotTable.scanAt(spark, path, ver.version)
    assert(scan.filter(col("k") === 777L).head.getLong(1) === 0L)
  }

  test("append racing a FIRST analyzeStats declaration self-heals: " +
      "the blind retry recomputes its typed bounds against the new " +
      "declaration instead of committing a misaligned index") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append((0 until 1000).map(i => (i.toLong, i / 7.0))
      .toDF("k", "score"), path, 4, statsCol = Some("k"))
    RaceMatrixSpec.gateSeen.set(false)
    val slowOnce = udf((x: Long) => {
      if (RaceMatrixSpec.gateSeen.compareAndSet(false, true))
        Thread.sleep(2500)
      x
    })
    val batch = (1000 until 1200).map(i => (i.toLong, i / 7.0))
      .toDF("k", "score").withColumn("k", slowOnce(col("k")))
    val err = new AtomicReference[Throwable]()
    val t = new Thread(() => {
      try SnapshotTable.append(batch, path, 2, statsCol = Some("k"))
      catch { case e: Throwable => err.set(e) }
    })
    t.start()
    val deadline = System.currentTimeMillis() + 60000
    while (!RaceMatrixSpec.gateSeen.get() &&
        System.currentTimeMillis() < deadline) Thread.sleep(5)
    // the interleave DECLARES typed stats over existing data (v2)
    SnapshotTable.analyzeStats(spark, path, Seq("score"))
    t.join(120000)
    assert(err.get() == null,
      s"append must blind-retry through a stats declaration, got " +
        s"${err.get()}")
    val ver = SnapshotTable.readVersion(spark, path,
      SnapshotTable.latestVersion(path))
    assert(ver.colStats.map(_.col) === Seq("score"),
      "the declaration must survive the racing append")
    assert(ver.colStats.head.mins.length === ver.files.length,
      "the retried append must carry bounds for ITS files too — a " +
        "misaligned index would have failed the commit")
    val (scan, _, _) = SnapshotTable.scanAt(spark, path, ver.version)
    assert(scan.count() === 1200)
  }
}

object RaceMatrixSpec {
  val gateSeen = new AtomicBoolean(false)
}
