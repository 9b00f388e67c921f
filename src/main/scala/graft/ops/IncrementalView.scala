package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate over a
  * [[SnapshotTable]] — the downstream half of the change-data-feed
  * story: a dashboard/feature aggregate that stays current by applying
  * version DELTAS instead of re-scanning the table.
  *
  * Classic incremental view maintenance for distributive aggregates:
  * the view is `GROUP BY g → (count, sums)`, and a change feed row
  * contributes `+row` (insert) or `−row` (delete), so the refresh is
  * one aggregation over [[SnapshotTable.changes]] — which reads only
  * the files that CHURNED between the versions — merged into the prior
  * view state by a full-outer join on the group key. Cost scales with
  * churn + |view|, never with the table: correcting one bad ingest day
  * of a 100 TB table touches that day's files and the (small) view.
  * COUNT and SUM are subtractable so deletes maintain exactly; MIN/MAX
  * are deliberately not offered — a delete of the current extremum
  * cannot be repaired without re-scanning the group, which is the
  * standard IVM restriction, not an implementation gap.
  *
  * View state is itself versioned BY TABLE VERSION: refresh at table
  * version N writes `state-v{N}/` (immutable, `errorifexists` — a
  * racing refresher of the same version fails loudly rather than
  * silently double-writing) and readers pick the highest committed
  * state. A refresh is deterministic given the table history, so
  * re-running a crashed refresh converges. Groups whose count reaches
  * zero are dropped; a negative count is a drift bug and fails the
  * refresh (checked distributed, one filter over view-sized data).
  */
object IncrementalView {

  final case class RefreshResult(tableVersion: Long, mode: String,
                                 groups: Long)

  private def stateDir(viewPath: String, v: Long): String =
    s"$viewPath/state-v$v"

  /** Highest table version a committed state exists for, 0 if none. */
  def refreshedVersion(viewPath: String): Long = {
    val dir = Paths.get(viewPath)
    if (!Files.isDirectory(dir)) return 0L
    val st = Files.list(dir)
    try {
      var best = 0L
      st.iterator().forEachRemaining { p =>
        val n = p.getFileName.toString
        if (n.startsWith("state-v") &&
            Files.exists(p.resolve("_SUCCESS")))
          best = math.max(best, n.drop(7).toLong)
      }
      best
    } finally st.close()
  }

  /** The view at its latest refreshed state. */
  def read(spark: SparkSession, viewPath: String): DataFrame = {
    val v = refreshedVersion(viewPath)
    require(v > 0, s"view $viewPath has never been refreshed")
    spark.read.parquet(stateDir(viewPath, v))
  }

  /** Bring the view up to the table's latest version. First refresh is
    * a full build (one scan of the current version); later refreshes
    * aggregate the change feed and merge. `sumCols` maps data column →
    * view alias; the row count is always maintained as `cnt`.
    */
  def refresh(spark: SparkSession, tablePath: String, viewPath: String,
              groupCols: Seq[String], sumCols: Seq[(String, String)])
      : RefreshResult = {
    require(groupCols.nonEmpty, "view needs at least one group column")
    val reserved = (Seq("cnt") ++ sumCols.map(_._2)).toSet
    require(groupCols.forall(!reserved(_)),
      s"group columns collide with view aggregate names $reserved")
    val cur = SnapshotTable.latestVersion(tablePath)
    require(cur > 0, s"snapshot table $tablePath does not exist")
    val last = refreshedVersion(viewPath)
    if (last == cur)
      return RefreshResult(cur, "noop",
        read(spark, viewPath).count())
    require(last < cur,
      s"view at table version $last is AHEAD of the table ($cur) — " +
        "was the table log truncated?")
    val next =
      if (last == 0) {
        val (scan, _, _) = SnapshotTable.scanAt(spark, tablePath, cur)
        scan.groupBy(groupCols.map(col): _*)
          .agg(count(lit(1)).as("cnt"),
            sumCols.map { case (c, a) =>
              sum(col(c)).cast("long").as(a)
            }: _*)
      } else {
        val delta = SnapshotTable.changes(spark, tablePath, last, cur)
        val sign = when(col("_change") === "insert", 1L).otherwise(-1L)
        val deltaAgg = delta.groupBy(groupCols.map(col): _*)
          .agg(sum(sign).as("cnt"),
            sumCols.map { case (c, a) =>
              sum(sign * col(c)).cast("long").as(a)
            }: _*)
        val merged = read(spark, viewPath)
          .join(deltaAgg.withColumnsRenamed(
              (Seq("cnt" -> "__d_cnt") ++
                sumCols.map { case (_, a) => a -> s"__d_$a" }).toMap),
            groupCols, "full_outer")
        val summed = merged.select(
          groupCols.map(col) ++
            Seq((coalesce(col("cnt"), lit(0L)) +
              coalesce(col("__d_cnt"), lit(0L))).as("cnt")) ++
            sumCols.map { case (_, a) =>
              (coalesce(col(a), lit(0L)) +
                coalesce(col(s"__d_$a"), lit(0L))).as(a)
            }: _*)
        summed.filter(col("cnt") =!= 0)
      }
    val dir = stateDir(viewPath, cur)
    // write to a UNIQUE temp dir and atomically rename into place:
    // wiping a crashed state-v{cur} before an in-place write would
    // re-open the concurrent-refresh race (refresher B wipes A's
    // in-progress write, both then write the same directory) — with
    // rename-publish, a half-written state is only ever under a
    // nonced temp name and the loser's rename fails loudly
    val tmp = s"$viewPath/.state-v$cur." +
      java.util.UUID.randomUUID().toString.take(12) + ".tmp"
    next.write.mode("errorifexists").parquet(tmp)
    // drift check on the WRITTEN state (view-sized, one small read —
    // not a second pass over the churned table files): a negative count
    // means the change feed and the prior state disagree
    val bad = spark.read.parquet(tmp).filter(col("cnt") < 0).count()
    if (bad > 0) {
      graft.Work.wipe(Paths.get(tmp))
      throw new IllegalStateException(
        s"incremental refresh drove $bad group count(s) negative — " +
          "change feed and view state have drifted")
    }
    // a refresh that crashed mid-write under the PRE-rename scheme left
    // state-v{cur} without _SUCCESS; such a legacy leftover (never a
    // live write — live writes are under temp names now) still blocks
    // the rename, so clear it
    if (Files.isDirectory(Paths.get(dir)) &&
        !Files.exists(Paths.get(dir, "_SUCCESS")))
      graft.Work.wipe(Paths.get(dir))
    try Files.move(Paths.get(tmp), Paths.get(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileSystemException =>
        graft.Work.wipe(Paths.get(tmp))
        throw new IllegalStateException(
          s"concurrent refresh already committed $dir — " +
            "this refresher lost the publish race", e)
    }
    RefreshResult(cur, if (last == 0) "full" else "incremental",
      spark.read.parquet(dir).count())
  }
}
