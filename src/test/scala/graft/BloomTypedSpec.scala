package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.{BloomIndex, SnapshotTable}

/** Typed bloom keys (r19): the per-file bloom index accepts STRING /
  * DATE / TIMESTAMP key columns natively — no 64-bit surrogate — with
  * build and probe agreeing on one canonical encoding per source type
  * (UTF-8 string via putString; DATE as epoch days; TIMESTAMP as epoch
  * micros; integrals as the long itself). q204 oracle-gates the STRING
  * plane cross-engine; this spec pins the encoding mirror, the
  * no-false-negative contract per type, null handling, the all-null
  * file completeness rule, and the float/double loud rejection.
  */
class BloomTypedSpec extends SparkSpec {

  private def freshPath(): String =
    Files.createTempDirectory("bloomtyped").toString + "/t"

  test("STRING keys: no false negatives, prunes on a localized layout") {
    import spark.implicits._
    // each url confined to one file's worth of sort positions
    val df = (0 until 4000).map { i => (i.toLong, s"https://ex.org/${i / 500}") }
      .toDF("s", "url")
    val path = freshPath()
    BloomIndex.write(df, path, col("s"), "url", numPartitions = 8,
      expectedPerFile = 4096)
    val (scan, read, total) = BloomIndex.scanKeysTyped(
      spark, path, "url", Seq("https://ex.org/3"))
    assert(total === 8)
    assert(read > 0 && read < total, s"expected pruning, read $read of $total")
    assert(scan.count() === 500)
    // absent key: zero rows whatever the bloom says (residual IN filters)
    val (miss, _, _) = BloomIndex.scanKeysTyped(
      spark, path, "url", Seq("https://ex.org/nope"))
    assert(miss.count() === 0)
    // every row of every probed key survives pruning
    val keys = Seq("https://ex.org/0", "https://ex.org/7")
    val (multi, _, _) = BloomIndex.scanKeysTyped(spark, path, "url", keys)
    assert(multi.count() === df.filter(col("url").isin(keys: _*)).count())
  }

  test("DATE keys: probe by java.sql.Date and LocalDate both hit the " +
    "epoch-days encoding the build side put") {
    import spark.implicits._
    val df = (0 until 2000).map { i =>
      (i.toLong, java.sql.Date.valueOf(java.time.LocalDate
        .of(2024, 1, 1).plusDays(i / 250)))
    }.toDF("s", "d")
    val path = freshPath()
    BloomIndex.write(df, path, col("s"), "d", numPartitions = 8,
      expectedPerFile = 4096)
    val want = java.time.LocalDate.of(2024, 1, 4)
    val (s1, r1, t1) = BloomIndex.scanKeysTyped(spark, path, "d",
      Seq(java.sql.Date.valueOf(want)))
    assert(r1 > 0 && r1 < t1, s"date probe read $r1 of $t1")
    assert(s1.count() === 250)
    val (s2, _, _) = BloomIndex.scanKeysTyped(spark, path, "d", Seq(want))
    assert(s2.count() === 250)
  }

  test("TIMESTAMP keys: probe by Timestamp and Instant both hit the " +
    "epoch-micros encoding") {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-06-01T00:00:00Z")
    val df = (0 until 2000).map { i =>
      (i.toLong, java.sql.Timestamp.from(base.plusSeconds((i / 250) * 3600L)))
    }.toDF("s", "ts")
    val path = freshPath()
    BloomIndex.write(df, path, col("s"), "ts", numPartitions = 8,
      expectedPerFile = 4096)
    val want = base.plusSeconds(5 * 3600L)
    val (s1, r1, t1) = BloomIndex.scanKeysTyped(spark, path, "ts",
      Seq(java.sql.Timestamp.from(want)))
    assert(r1 > 0 && r1 < t1, s"ts probe read $r1 of $t1")
    assert(s1.count() === 250)
    val (s2, _, _) = BloomIndex.scanKeysTyped(spark, path, "ts", Seq(want))
    assert(s2.count() === 250)
  }

  test("float/double bloom keys are rejected loudly at build") {
    import spark.implicits._
    val df = Seq((1L, 1.5), (2L, 2.5)).toDF("s", "x")
    val e = intercept[IllegalArgumentException] {
      BloomIndex.write(df, freshPath(), col("s"), "x",
        numPartitions = 1, expectedPerFile = 16)
    }
    assert(e.getMessage.contains("NaN"))
  }

  test("NULL keys never match; an all-null file still gets an index " +
    "row so completeness holds and it prunes on every probe") {
    import spark.implicits._
    // file 0: urls null; files 1..3: real urls (layout by s)
    val df = (0 until 400).map { i =>
      (i.toLong, if (i < 100) null else s"u${i / 100}")
    }.toDF("s", "url")
    val path = freshPath()
    BloomIndex.write(df, path, col("s"), "url", numPartitions = 4,
      expectedPerFile = 4096)
    // completeness: the index covers all 4 files (the all-null file got
    // an empty bloom), so pruning is TRUSTED and the null file prunes
    val (scan, read, total) = BloomIndex.scanKeysTyped(
      spark, path, "url", Seq("u2"))
    assert(total === 4, s"all-null file missing from index: $total of 4")
    assert(read < total, "the all-null file must prune on an equality probe")
    assert(scan.count() === 100)
    assert(scan.filter(col("url").isNull).count() === 0)
  }

  test("canonical encoding mirror: for every supported key type, a " +
    "bloom built on the column hits when probed with the JVM value " +
    "read back from parquet") {
    val path = Files.createTempDirectory("bloomtyped").toString + "/mirror"
    val df = spark.sql(
      """SELECT 42L AS l, 7 AS i, CAST(3 AS SHORT) AS sh,
        |  CAST(1 AS BYTE) AS b, 'hello' AS st,
        |  DATE'2024-03-15' AS d, TIMESTAMP'2024-03-15 12:30:45Z' AS ts
        |""".stripMargin)
    df.write.parquet(path)
    val row = spark.read.parquet(path).collect().head
    val sch = spark.read.parquet(path).schema
    // canonExpr is private; the mirror is asserted via probe
    // round-trip: build a 1-file bloom per column, probe with the
    // value Spark hands back — a build/probe encoding drift on any
    // type makes the probe miss (blooms have no false negatives)
    for (name <- sch.fieldNames) {
      val p = Files.createTempDirectory("bloomtyped").toString + s"/$name"
      BloomIndex.write(df.withColumn("s", lit(0L)), p, col("s"), name,
        numPartitions = 1, expectedPerFile = 16)
      val v = row.get(row.fieldIndex(name))
      val (scan, read, total) = BloomIndex.scanKeysTyped(
        spark, p, name, Seq(v))
      assert(read === 1 && total === 1, s"col $name: read $read of $total")
      assert(scan.count() === 1, s"col $name probe missed — encoding drift")
    }
  }

  test("snapshot table: STRING bloom maintained through append, " +
    "compaction, and merge; typed probes prune and stay exact") {
    import spark.implicits._
    val path = freshPath()
    // url confined per append batch (locality), many small files so
    // compaction has work to do
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"https://ex.org/${i / 100}", i % 5))
        .toDF("s", "url", "p")
    SnapshotTable.append(batch(0, 400), path, 4, statsCol = Some("s"),
      bloomCol = Some("url"), bloomExpectedPerFile = 4096)
    SnapshotTable.append(batch(400, 800), path, 4, statsCol = Some("s"),
      bloomCol = Some("url"), bloomExpectedPerFile = 4096)
    val (s2, read2, total2) = SnapshotTable.scanKeysTypedAt(
      spark, path, 2, Seq("https://ex.org/2"))
    assert(total2 === 8)
    assert(read2 > 0 && read2 < total2)
    assert(s2.count() === 100)
    // compaction rewrites files and must re-index the new ones
    val res = SnapshotTable.compact(spark, path, targetBytes = 1L << 20)
    assert(res.rewritten > 0)
    val (s3, read3, total3) = SnapshotTable.scanKeysTypedAt(
      spark, path, res.version, Seq("https://ex.org/2"))
    assert(read3 <= total3)
    assert(s3.count() === 100)
    // merge rewrites candidate files; the probe after it stays exact
    val ups = Seq((150L, "https://ex.org/1", 99L), (9000L, "https://ex.org/1", 98L))
      .toDF("s", "url", "p")
    SnapshotTable.merge(spark, path, ups, "s")
    val (s4, _, _) = SnapshotTable.scanKeysTypedAt(
      spark, path, res.version + 1, Seq("https://ex.org/1"))
    assert(s4.count() === 101) // 100 originals + 1 insert (s=9000)
    assert(s4.filter(col("p") === 99).count() === 1)
  }

  test("DSv2 pushdown: string equality and IN probes prune files " +
    "through the graft_table scan") {
    import spark.implicits._
    import graft.source.v2.GraftTableSource
    val path = freshPath()
    val df = (0 until 800).map(i => (i.toLong, s"u${i / 100}"))
      .toDF("s", "url")
    SnapshotTable.append(df, path, 8, statsCol = Some("s"),
      bloomCol = Some("url"), bloomExpectedPerFile = 4096)
    val t = spark.read.format("graft_table").option("path", path).load()
    GraftTableSource.lastPlan.set((-1, -1))
    assert(t.filter(col("url") === "u3").count() === 100)
    val (p1, t1) = GraftTableSource.lastPlan.get()
    assert(p1 > 0 && p1 < t1, s"EqualTo(string) planned $p1 of $t1")
    GraftTableSource.lastPlan.set((-1, -1))
    assert(t.filter(col("url").isin("u0", "u7")).count() === 200)
    val (p2, t2) = GraftTableSource.lastPlan.get()
    assert(p2 > 0 && p2 < t2, s"In(string) planned $p2 of $t2")
  }
}
