package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.{NdvSketch, SnapshotTable}

/** Per-file NDV sketches in the manifest → optimizer column statistics
  * (r19): KMV minima ride next to the typed bounds for every declared
  * stats column, merge per scan over exactly the surviving files, and
  * serve `distinctCount` through `SupportsReportStatistics` — so under
  * CBO an equality filter is priced at rows/NDV and a join flips to
  * broadcast where the size-only estimate never would. Pinned here:
  * the exact regime (< k distinct → exact), the two producers' hash
  * mirror (batch-read aggregate vs writer-task tracker must build the
  * SAME union sketch), survival through compaction, per-slice merge,
  * and the broadcast flip itself.
  */
class NdvStatsSpec extends SparkSpec {

  private def freshPath(): String =
    Files.createTempDirectory("ndv").toString + "/t"

  test("exact regime: under k distinct values the served NDV is exact, " +
      "for long and string columns, across multiple files") {
    import spark.implicits._
    val path = freshPath()
    SnapshotTable.append(
      (0 until 1000).map(i => (i.toLong, i.toLong % 21, s"u${i % 13}"))
        .toDF("k", "v", "u"),
      path, 4, statsCol = Some("k"), statsCols = Seq("v", "u"))
    val ver = SnapshotTable.readVersion(spark, path, 1)
    val vStats = ver.colStats.find(_.col == "v").get
    val uStats = ver.colStats.find(_.col == "u").get
    assert(vStats.kmv.length === ver.files.length)
    assert(vStats.ndvOf(ver.files.indices) === Some(21L))
    assert(uStats.ndvOf(ver.files.indices) === Some(13L))
  }

  test("approximate regime: a high-cardinality column estimates within " +
      "the KMV error band, and a pruned slice serves the slice's NDV") {
    import spark.implicits._
    val path = freshPath()
    // k confined per file; v distinct per row in file 0 only
    SnapshotTable.append(
      (0 until 8000).map(i =>
        (i.toLong, if (i < 1000) i.toLong else 9999L))
        .toDF("k", "v"),
      path, 8, statsCol = Some("k"), statsCols = Seq("v"))
    val ver = SnapshotTable.readVersion(spark, path, 1)
    val cs = ver.colStats.head
    val all = cs.ndvOf(ver.files.indices).get
    assert(all > 700 && all < 1400, s"NDV(~1001 truth) estimated $all")
    // the slice holding only the constant files: NDV exactly 1
    val constIdx = ver.files.indices.filter(i =>
      ver.stats.get.mins(i) >= 2000)
    assert(constIdx.nonEmpty)
    assert(cs.ndvOf(constIdx) === Some(1L))
  }

  test("producer mirror: the batch-read aggregate (append) and the " +
      "writer-task tracker (DSv2 insert) build sketches that merge to " +
      "the SAME estimate, for every sketchable dtype") {
    import spark.implicits._
    val root = Files.createTempDirectory("ndvcat").toString
    spark.conf.set("spark.sql.catalog.graft_ndv",
      "graft.source.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ndv.root", root)
    val df = spark.range(0, 3000).select(
      col("id").as("k"),
      (col("id") % 777).as("v"),
      concat(lit("u"), (col("id") % 333).cast("string")).as("u"),
      date_add(lit("2024-01-01").cast("date"),
        (col("id") % 99).cast("int")).as("d"),
      timestamp_micros(col("id") % 555 * 1000000L).as("ts"))
    // path A: API append (computeColStats aggregate)
    val pa = freshPath()
    SnapshotTable.append(df, pa, 4, statsCol = Some("k"),
      statsCols = Seq("v", "u", "d", "ts"))
    // path B: SQL INSERT through the catalog (writer-task tracking)
    spark.sql("""CREATE TABLE graft_ndv.db.m
      (k BIGINT, v BIGINT, u STRING, d DATE, ts TIMESTAMP)
      TBLPROPERTIES('stats'='k', 'stats_cols'='v,u,d,ts')""")
    df.createOrReplaceTempView("ndv_src")
    spark.sql("INSERT INTO graft_ndv.db.m SELECT * FROM ndv_src")
    val va = SnapshotTable.readVersion(spark, pa, 1)
    val vb = SnapshotTable.readVersion(spark, s"$root/db/m", 1)
    for (c <- Seq("v", "u", "d", "ts")) {
      val a = va.colStats.find(_.col == c).get.ndvOf(va.files.indices)
      val b = vb.colStats.find(_.col == c).get.ndvOf(vb.files.indices)
      assert(a.isDefined, s"append path served no NDV for $c")
      assert(a === b,
        s"hash mirror broken for $c: append=$a, writer-task=$b — the " +
          "two producers canonicalize values differently")
    }
    spark.sql("DROP TABLE graft_ndv.db.m")
  }

  test("maintenance: compaction preserves the merged NDV (same value " +
      "set, recomputed sketches for rewritten files)") {
    import spark.implicits._
    val path = freshPath()
    (0 until 4).foreach(b => SnapshotTable.append(
      (b * 500 until b * 500 + 500).map(i => (i.toLong, (i % 97).toLong))
        .toDF("k", "v"),
      path, 2, statsCol = Some("k"), statsCols = Seq("v")))
    val before = SnapshotTable.readVersion(spark, path, 4)
    val ndvBefore = before.colStats.head.ndvOf(before.files.indices)
    // 97 distinct > k=32: approximate regime, truth within the band
    assert(ndvBefore.exists(e => e > 75 && e < 125),
      s"NDV(97 truth) estimated $ndvBefore")
    val r = SnapshotTable.compact(spark, path, targetBytes = 1L << 30)
    assert(r.rewritten > 0)
    val after = SnapshotTable.readVersion(spark, path, r.version)
    // the KMV union is GROUPING-INDEPENDENT (the k smallest hashes of
    // the set, however rows split into files), so a row-preserving
    // compaction must reproduce the estimate EXACTLY, not just nearly
    assert(after.colStats.head.ndvOf(after.files.indices) === ndvBefore,
      "NDV drifted across a row-preserving compaction")
  }

  test("min/max column stats: a RANGE filter prices at its fraction " +
      "of [min, max] under CBO and flips the join to broadcast; " +
      "size-only keeps the sort-merge") {
    import spark.implicits._
    val p1 = freshPath()
    val p2 = freshPath()
    SnapshotTable.append(
      spark.range(0, 20000).select(col("id").as("k"),
        concat(lit("pad"), col("id").cast("string"),
          lit("x" * 64)).as("pad1")),
      p1, 4, statsCol = Some("k"))
    // s scattered vs layout: per-file [min,max] span ~everything, so
    // static pruning keeps all files — only the CBO range estimate
    // over the SERVED global [min, max] can shrink the build side
    SnapshotTable.append(
      spark.range(0, 20000).select(col("id").as("u"),
        (col("id") * 2654435761L % 20000).as("s"),
        concat(lit("desc"), col("id").cast("string"),
          lit("y" * 64)).as("pad2")),
      p2, 4, statsCol = Some("u"), statsCols = Seq("s")) // stats on s
    def plan(cbo: Boolean): String = withSQLConf(
      "spark.sql.cbo.enabled" -> cbo.toString,
      "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024).toString,
      "spark.sql.adaptive.enabled" -> "false") {
      val fact = spark.read.format("graft_table").option("path", p1).load()
      val dim = spark.read.format("graft_table").option("path", p2).load()
        .filter(col("s").between(100, 140))
      fact.join(dim, col("k") === col("u"))
        .agg(count(lit(1)), max(length(col("pad1"))),
          max(length(col("pad2"))))
        .queryExecution.executedPlan.toString
    }
    val withCbo = plan(cbo = true)
    assert(withCbo.contains("BroadcastHashJoin"),
      s"range stats did not flip the join:\n${withCbo.take(1200)}")
    val withoutCbo = plan(cbo = false)
    assert(!withoutCbo.contains("BroadcastHashJoin"),
      "control broken: size-only already broadcasts\n" +
        withoutCbo.take(1200))
  }

  test("the broadcast flip: under CBO, the NDV-priced equality filter " +
      "shrinks the build side below the threshold and the join " +
      "broadcasts; size-only estimation (CBO off) sort-merges") {
    import spark.implicits._
    val p1 = freshPath()
    val p2 = freshPath()
    // fact: wide rows so neither side is broadcast-able by raw size
    SnapshotTable.append(
      spark.range(0, 20000).select(col("id").as("k"),
        concat(lit("pad"), col("id").cast("string"),
          lit("x" * 64)).as("pad1")),
      p1, 4, statsCol = Some("k"))
    // dim: the filter column `grp` is NOT the join key (so no
    // constraint transfers to the fact side) and is scattered across
    // every file (so static file pruning cannot shrink the scan —
    // only the CBO rows/NDV estimate can)
    SnapshotTable.append(
      spark.range(0, 20000).select(col("id").as("u"),
        (col("id") % 50).as("grp"),
        concat(lit("desc"), col("id").cast("string"),
          lit("y" * 64)).as("pad2")),
      p2, 4, statsCol = Some("u"), statsCols = Seq("u", "grp"))
    def plan(cbo: Boolean): String = withSQLConf(
      "spark.sql.cbo.enabled" -> cbo.toString,
      "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024).toString,
      "spark.sql.adaptive.enabled" -> "false") {
      val fact = spark.read.format("graft_table").option("path", p1).load()
      val dim = spark.read.format("graft_table").option("path", p2).load()
        .filter(col("grp") === 7)
      // the pads stay in the aggregate so column pruning cannot
      // shrink either scan below the threshold by itself
      val j = fact.join(dim, col("k") === col("u"))
        .agg(count(lit(1)), max(length(col("pad1"))),
          max(length(col("pad2"))))
      j.queryExecution.executedPlan.toString
    }
    val withCbo = plan(cbo = true)
    assert(withCbo.contains("BroadcastHashJoin"),
      s"NDV stats did not flip the join to broadcast:\n" +
        withCbo.take(1500))
    val withoutCbo = plan(cbo = false)
    assert(!withoutCbo.contains("BroadcastHashJoin"),
      "control broken: the size-only estimate already broadcasts — " +
        "the flip proves nothing\n" + withoutCbo.take(1500))
  }

  test("join reorder: NDV-derived cardinalities flip a 3-table star's " +
      "join ORDER under cbo.joinReorder; the size-only control keeps " +
      "the written (bad) order") {
    val pf = freshPath(); val pa = freshPath(); val pb = freshPath()
    // fact joins BOTH dims; the selective filter sits on dimA but the
    // query is WRITTEN with the wide dimB joined first
    SnapshotTable.append(
      spark.range(0, 20000).select(col("id").as("ko"),
        (col("id") % 2000).as("kp")),
      pf, 4, statsCol = Some("ko"), statsCols = Seq("kp"))
    SnapshotTable.append(
      spark.range(0, 20000).select(col("id").as("u"),
        (col("id") % 50).as("grp"),
        concat(lit("a" * 32), col("id").cast("string")).as("pada")),
      pa, 4, statsCol = Some("u"), statsCols = Seq("grp"))
    SnapshotTable.append(
      spark.range(0, 2000).select(col("id").as("w"),
        concat(lit("b" * 32), col("id").cast("string")).as("padb")),
      pb, 2, statsCol = Some("w"))
    def plan(cbo: Boolean): String = withSQLConf(
      "spark.sql.cbo.enabled" -> cbo.toString,
      "spark.sql.cbo.joinReorder.enabled" -> cbo.toString,
      "spark.sql.adaptive.enabled" -> "false") {
      val fact = spark.read.format("graft_table").option("path", pf).load()
      val dimA = spark.read.format("graft_table").option("path", pa)
        .load().filter(col("grp") === 7)
      val dimB = spark.read.format("graft_table").option("path", pb).load()
      val j = fact.join(dimB, col("kp") === col("w"))
        .join(dimA, col("ko") === col("u"))
        .agg(count(lit(1)), max(length(col("pada"))),
          max(length(col("padb"))))
      j.queryExecution.executedPlan.toString
    }
    // outer join prints first: reordered → the kp⋈w join is OUTER
    // (selective dim joined the fact first), syntactic → ko⋈u outer
    def order(p: String): (Int, Int) =
      (p.indexOf("Join [ko"), p.indexOf("Join [kp"))
    val (ko1, kp1) = order(plan(cbo = true))
    assert(ko1 >= 0 && kp1 >= 0 && kp1 < ko1,
      s"NDV stats did not reorder the star (ko@$ko1 kp@$kp1)")
    val (ko2, kp2) = order(plan(cbo = false))
    assert(ko2 >= 0 && kp2 >= 0 && ko2 < kp2,
      s"control broken: size-only plan already reordered " +
        s"(ko@$ko2 kp@$kp2)")
  }
}
