package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProductExpr, VecStatsExpr}

/** Session extension injecting graft's native expressions into the SQL
  * function registry, so `spark.sql("SELECT vec_dot(a, b) ...")` works
  * exactly like the Column API (`DotProductExpr.dot`).
  *
  * Deployable both ways:
  *   - programmatic: `SparkSession.builder.withExtensions(new GraftExtensions)`
  *     (what GraftSession does);
  *   - config-driven: `--conf spark.sql.extensions=graft.GraftExtensions`
  *     on an existing cluster, which is why this is a zero-arg class
  *     implementing `SparkSessionExtensions => Unit` rather than an object.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // keyless range joins → binned equi-joins (opt-in via
    // spark.graft.rangeJoin.binWidth; see BinnedRangeJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
    register(ext, "vec_dot", "vec_dot(a, b) - dot product of two array<double>",
      { case Seq(a, b) => DotProductExpr(a, b) }, arity = 2)
    register(ext, "vec_stats",
      "vec_stats(a) - single-pass NaN-skipping stats struct over array<double>",
      { case Seq(a) => VecStatsExpr(a) }, arity = 1)
    register(ext, "graft_nfc",
      "graft_nfc(s) - Unicode NFC canonical normalization",
      { case Seq(a) => graft.functions.NfcNormalizeExpr(a) }, arity = 1)
    register(ext, "graft_top_k",
      "graft_top_k(key, k, capacity) - SpaceSaving heavy-hitters aggregate",
      { case Seq(key, k, cap) =>
        graft.functions.HeavyHittersAgg(key, foldInt("k", k),
          foldInt("capacity", cap)).toAggregateExpression() },
      arity = 3)
    register(ext, "graft_zorder",
      "graft_zorder(x, y, bits) - Morton Z-order interleave of two " +
        "quantized dimensions (BIGINT clustering key)",
      { case Seq(x, y, b) =>
        graft.functions.ZOrderExpr(x, y, foldInt("bits", b)) },
      arity = 3)
    register(ext, "graft_cms",
      "graft_cms(s, d, w) - Count-Min frequency sketch " +
        "(array<array<bigint>> counter grid) over a string key",
      { case Seq(key, d, w) =>
        graft.functions.CountMinAgg(key, foldInt("d", d), foldInt("w", w))
          .toAggregateExpression() },
      arity = 3)
    register(ext, "graft_hilbert",
      "graft_hilbert(x, y, bits) - Hilbert-curve index of a quantized " +
        "2-D cell (BIGINT clustering key with strict adjacency locality)",
      { case Seq(x, y, b) =>
        graft.functions.HilbertExpr(x, y, foldInt("bits", b)) },
      arity = 3)
    register(ext, "graft_zorder3",
      "graft_zorder3(x, y, t, bits) - 3-D Morton interleave (BIGINT " +
        "clustering key over three quantized dimensions, e.g. x/y/time)",
      { case Seq(x, y, t, b) =>
        graft.functions.ZOrder3Expr(x, y, t, foldInt("bits", b)) },
      arity = 4)
    register(ext, "graft_hilbert3",
      "graft_hilbert3(x, y, t, bits) - 3-D Hilbert index (Skilling " +
        "transpose construction; strict-adjacency BIGINT clustering key)",
      { case Seq(x, y, t, b) =>
        graft.functions.Hilbert3Expr(x, y, t, foldInt("bits", b)) },
      arity = 4)
    register(ext, "graft_winnow_anchors",
      "graft_winnow_anchors(text, k, w) - distinct robust-winnowing " +
        "anchor k-grams (array<binary> — byte grams): windowed minima of a rolling " +
        "k-gram hash, window w, rightmost tie-break",
      { case Seq(t, k, w) =>
        graft.functions.WinnowAnchorsExpr(t, foldInt("k", k),
          foldInt("w", w)) },
      arity = 3)
    register(ext, "graft_kmv_distinct",
      "graft_kmv_distinct(s, k) - KMV approximate-distinct sketch " +
        "(struct<est, kth>) over a string key",
      { case Seq(key, k) =>
        graft.functions.KmvDistinctAgg(key, foldInt("k", k))
          .toAggregateExpression() },
      arity = 2)
    register(ext, "graft_kmv_mins",
      "graft_kmv_mins(s, k) - the raw ascending k-minima of the KMV " +
        "sketch (array<bigint>), composable for set operations",
      { case Seq(key, k) =>
        graft.functions.KmvMinsAgg(key, foldInt("k", k))
          .toAggregateExpression() },
      arity = 2)
    register(ext, "graft_gram",
      "graft_gram(v, dim) - one-pass Gram matrix over array<bigint> " +
        "vectors (upper triangle as array<struct<i, j, g>>)",
      { case Seq(v, dim) =>
        graft.functions.GramAgg(v, foldInt("dim", dim))
          .toAggregateExpression() },
      arity = 2)
    // FROM-clause time travel: the snapshot-table layer surfaced as a
    // table-valued function, so plain SQL reads a committed version —
    // `SELECT ... FROM graft_snapshot('/path/t', 3)` — with the same
    // manifest-planned file list (never a directory listing) as the
    // programmatic scanAt. One argument = the latest version. The
    // returned relation is the analyzed plan of the manifest's file
    // scan, so pushdown/pruning over it behave exactly like any
    // parquet relation.
    ext.injectTableFunction((
      new FunctionIdentifier("graft_snapshot"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_snapshot",
        "graft_snapshot(path[, version]) - snapshot table at a " +
          "committed version (FROM-clause time travel)"),
      (args: Seq[Expression]) => {
        if (args.length < 1 || args.length > 2)
          throw new IllegalArgumentException(
            s"graft_snapshot expects (path[, version]), got ${args.length}")
        val path = foldString("path", args(0))
        val spark = org.apache.spark.sql.SparkSession.active
        val version =
          if (args.length == 2) foldLong("version", args(1))
          else graft.ops.SnapshotTable.latestVersion(path)
        graft.ops.SnapshotTable.scanAt(spark, path, version)
          ._1.queryExecution.analyzed
      }))
    // AS OF TIMESTAMP in the FROM clause: resolve a wall-clock instant
    // against the manifests' commit times, then serve that version's
    // manifest-planned scan — `graft_snapshot_at('/path/t', <ms>)`.
    ext.injectTableFunction((
      new FunctionIdentifier("graft_snapshot_at"),
      new ExpressionInfo(classOf[GraftExtensions].getName,
        "graft_snapshot_at",
        "graft_snapshot_at(path, tsMillis) - snapshot table AS OF a " +
          "wall-clock timestamp (newest version committed at or before)"),
      (args: Seq[Expression]) => {
        if (args.length != 2)
          throw new IllegalArgumentException(
            s"graft_snapshot_at expects (path, tsMillis), got ${args.length}")
        val path = foldString("path", args(0))
        val spark = org.apache.spark.sql.SparkSession.active
        val version = graft.ops.SnapshotTable.versionAsOf(spark, path,
          foldLong("tsMillis", args(1)))
        graft.ops.SnapshotTable.scanAt(spark, path, version)
          ._1.queryExecution.analyzed
      }))
    // The change feed as a FROM-clause relation:
    // `graft_changes('/path/t', 1, 3)` = every row-level difference
    // between the two committed versions, tagged `_change` ∈
    // {insert, delete} — SnapshotTable.changes' manifest-diff plan
    // (cost ∝ churned files, never the table), so SQL consumers can
    // aggregate/join a version delta without the Scala API.
    ext.injectTableFunction((
      new FunctionIdentifier("graft_changes"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_changes",
        "graft_changes(path, fromVersion, toVersion) - row-level " +
          "change feed between two committed snapshot-table versions"),
      (args: Seq[Expression]) => {
        if (args.length != 3)
          throw new IllegalArgumentException(
            s"graft_changes expects (path, fromV, toV), got ${args.length}")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.ops.SnapshotTable.changes(spark, foldString("path", args(0)),
            foldLong("fromVersion", args(1)), foldLong("toVersion", args(2)))
          .queryExecution.analyzed
      }))
    // DESCRIBE HISTORY as a FROM-clause relation:
    // `graft_history('/path/t')` = one row per surviving version with
    // the operation that committed it and the state it left — audit
    // queries ("what deleted rows last week?") in plain SQL.
    ext.injectTableFunction((
      new FunctionIdentifier("graft_history"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_history",
        "graft_history(path) - snapshot-table commit history " +
          "(version, op, committed_ms, rows, n_files, bytes)"),
      (args: Seq[Expression]) => {
        if (args.length != 1)
          throw new IllegalArgumentException(
            s"graft_history expects (path), got ${args.length}")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.ops.SnapshotTable.history(spark, foldString("path", args(0)))
          .queryExecution.analyzed
      }))
  }

  /** k/capacity are sketch SIZING, not data: they must be literals. */
  private def foldInt(what: String, e: Expression): Int =
    if (e.foldable) e.eval().asInstanceOf[Number].intValue()
    else throw new IllegalArgumentException(
      s"sketch sizing argument $what must be a literal integer")

  private def foldLong(what: String, e: Expression): Long =
    if (e.foldable) Option(e.eval()).map(_.asInstanceOf[Number].longValue())
      .getOrElse(throw new IllegalArgumentException(
        s"$what must not be null"))
    else throw new IllegalArgumentException(
      s"$what must be a literal integer")

  private def foldString(what: String, e: Expression): String =
    if (e.foldable) Option(e.eval()).map(_.toString).getOrElse(
      throw new IllegalArgumentException(s"$what must not be null"))
    else throw new IllegalArgumentException(
      s"$what must be a literal string")

  private def register(ext: SparkSessionExtensions, name: String, usage: String,
                       builder: PartialFunction[Seq[Expression], Expression],
                       arity: Int): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
      (args: Seq[Expression]) =>
        if (args.length == arity) builder(args)
        else throw new IllegalArgumentException(
          s"$name expects $arity argument(s), got ${args.length}")))
}
