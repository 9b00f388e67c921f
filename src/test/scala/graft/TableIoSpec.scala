package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{SnapshotTable, TableIo}
import graft.ops.SnapshotTable.PartSpec

/** The storage interface under the snapshot table's metadata plane:
  * the conditional-put contract on BOTH implementations, scheme-based
  * routing, and a full table lifecycle driven through the Hadoop
  * `FileSystem` impl (`file:` scheme — exercising the portable API
  * rather than POSIX hard links, which is the point: the same code
  * path serves hdfs:/s3a: roots).
  */
class TableIoSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("tio").toString

  test("routing: plain paths take the nio impl, URI-schemed paths the " +
      "Hadoop impl") {
    assert(TableIo.forPath("/tmp/x").isInstanceOf[graft.ops.NioTableIo])
    assert(TableIo.forPath("file:/tmp/x")
      .isInstanceOf[graft.ops.HadoopTableIo])
    assert(TableIo.forPath("hdfs://nn/t")
      .isInstanceOf[graft.ops.HadoopTableIo])
    assert(TableIo.forPath("s3a://bucket/t")
      .isInstanceOf[graft.ops.HadoopTableIo])
  }

  test("conditional put: both impls create exactly once and surface a " +
      "second create as FileAlreadyExistsException, never replacing") {
    // the spark session must exist before the Hadoop impl resolves its
    // configuration
    spark.sparkContext
    for ((io, p) <- Seq(
        (TableIo.nioIo, s"${freshDir()}/log/v1.json"),
        (TableIo.hadoopIo, s"file:${freshDir()}/log/v1.json"))) {
      io.createExclusive(p, "first")
      intercept[java.nio.file.FileAlreadyExistsException] {
        io.createExclusive(p, "second")
      }
      // the loser never replaced the committed content
      assert(io.readString(p) === "first")
      assert(io.exists(p))
    }
  }

  test("createExclusive normalizes an object-store-shaped plain " +
      "IOException 'already exists' to FileAlreadyExistsException") {
    // an in-process FileSystem that behaves like an object store's
    // conditional PUT: a non-'file' scheme (so the nio reroute does
    // not apply) whose exclusive create rejects with a PLAIN
    // IOException carrying an 'already exists' message — the branch
    // HadoopTableIo must normalize for the commit/retry logic to stay
    // implementation-blind
    spark.sparkContext.hadoopConfiguration.set("fs.graftmock.impl",
      classOf[MockObjectStoreFs].getName)
    val io = TableIo.hadoopIo
    val p = s"graftmock:${freshDir()}/log/v1.json"
    io.createExclusive(p, "first")
    intercept[java.nio.file.FileAlreadyExistsException] {
      io.createExclusive(p, "second")
    }
    assert(io.readString(p) === "first")
  }

  test("both impls agree on list/walk/size/delete/canon semantics") {
    spark.sparkContext
    for ((io, root) <- Seq((TableIo.nioIo, freshDir()),
        (TableIo.hadoopIo, s"file:${freshDir()}"))) {
      io.write(s"$root/a/one.parquet", "11")
      io.write(s"$root/a/b/two.parquet", "2222")
      io.write(s"$root/top.txt", "x")
      assert(io.listNames(root).toSet === Set("a", "top.txt"))
      assert(io.listNames(s"$root/missing").isEmpty)
      val walked = io.walkFiles(s"$root/a")
      assert(walked.map(_.name).toSet === Set("one.parquet", "two.parquet"))
      assert(walked.map(_.size).sorted === Seq(2L, 4L))
      // canon strips the scheme and absolutizes: the same file through
      // manifest-URI and walked-path forms compares equal
      val one = walked.find(_.name == "one.parquet").get
      assert(io.canon(one.path) === io.canon(s"$root/a/one.parquet"))
      assert(io.delete(s"$root/top.txt"))
      assert(!io.exists(s"$root/top.txt"))
      assert(!io.delete(s"$root/top.txt")) // second delete: no-op
      io.deleteDir(s"$root/a")
      assert(!io.isDirectory(s"$root/a"))
    }
  }

  test("writeAtomic replaces content for both impls") {
    spark.sparkContext
    for ((io, p) <- Seq((TableIo.nioIo, s"${freshDir()}/offset"),
        (TableIo.hadoopIo, s"file:${freshDir()}/offset"))) {
      io.writeAtomic(p, "3")
      io.writeAtomic(p, "7")
      assert(io.readString(p) === "7")
    }
  }

  test("full lifecycle through the Hadoop impl: append, time travel, " +
      "stats pruning, COW delete, DV delete + materialize, expire, " +
      "vacuum — byte-for-byte the nio semantics") {
    import spark.implicits._
    val path = s"file:${freshDir()}/t"
    assert(TableIo.forPath(path).isInstanceOf[graft.ops.HadoopTableIo])
    SnapshotTable.append((1L to 100L).map(k => (k, k * 10))
      .toDF("k", "v"), path, 4, statsCol = Some("k"), bloomCol = Some("k"))
    SnapshotTable.append((101L to 120L).map(k => (k, k * 10))
      .toDF("k", "v"), path, 1, statsCol = Some("k"), bloomCol = Some("k"))
    assert(SnapshotTable.latestVersion(path) === 2)
    assert(SnapshotTable.scanAt(spark, path, 1)._1.count() === 100)
    assert(SnapshotTable.scanAt(spark, path, 2)._1.count() === 120)
    // stats pruning plans against the manifest, not the directory
    val (pruned, read, total) =
      SnapshotTable.scanStatsRange(spark, path, 2, 101, 120)
    assert(read < total && pruned.count() === 20)
    // bloom probe at a version
    val (keyScan, keyRead, keyTotal) =
      SnapshotTable.scanKeysAt(spark, path, 2, Seq(7L))
    assert(keyRead < keyTotal && keyScan.count() === 1)
    // COW delete
    val (v3, _, _) = SnapshotTable.deleteStatsRange(spark, path, 1, 25)
    assert(SnapshotTable.scanAt(spark, path, v3)._1.count() === 95)
    // MOR delete + materialize
    val (v4, nDel) = SnapshotTable.deleteRowsWhere(spark, path, "k % 10 = 6")
    assert(nDel === 10 &&
      SnapshotTable.scanAt(spark, path, v4)._1.count() === 85)
    val mat = SnapshotTable.materializeDeletes(spark, path)
    assert(SnapshotTable.readVersion(spark, path, mat.version)
      .dvFiles.isEmpty)
    assert(SnapshotTable.scanAt(spark, path, mat.version)._1.count() === 85)
    // history + AS OF work off the io-routed manifest probes
    assert(SnapshotTable.history(spark, path).count() === mat.version)
    assert(SnapshotTable.versionAsOf(spark, path,
      System.currentTimeMillis()) === mat.version)
    // expire v1..v2, vacuum an orphan batch — all through the Hadoop io
    val ex = SnapshotTable.expire(spark, path, keepFrom = 3)
    assert(ex.manifestsDeleted === 2)
    // fake an aborted commit: a durable batch no manifest references
    (1L to 5L).map(k => (k, k)).toDF("k", "v")
      .write.parquet(s"$path/files/batch-orphan")
    val vac = SnapshotTable.vacuum(spark, path, olderThanMs = 0)
    assert(vac.orphansDeleted >= 1)
    assert(!TableIo.forPath(path).isDirectory(s"$path/files/batch-orphan"))
    // the retained versions read byte-identically after GC
    assert(SnapshotTable.scanAt(spark, path, mat.version)._1.count() === 85)
    intercept[IllegalArgumentException] {
      SnapshotTable.readVersion(spark, path, 1)
    }
  }

  test("hidden partitioning + merge through the Hadoop impl") {
    import spark.implicits._
    val path = s"file:${freshDir()}/t"
    val spec = PartSpec("day", "identity", 0)
    SnapshotTable.appendPartitioned(
      (1L to 10L).map(i => (i, i % 3)).toDF("id", "day"), path, spec,
      bloomCol = Some("id"))
    val (df, read, total) =
      SnapshotTable.scanPartitionKeys(spark, path, 1, Seq(1L))
    assert(read < total)
    assert(df.count() === 4) // day 1 holds ids 1, 4, 7, 10
    val res = SnapshotTable.mergePartitioned(spark, path,
      Seq((4L, 2L)).toDF("id", "day"), "id")
    val (scan, _, _) = SnapshotTable.scanAt(spark, path, res.version)
    assert(scan.count() === 10)
    assert(scan.filter(col("id") === 4).head.getAs[Long]("day") === 2L)
  }

  test("commit race through the Hadoop impl: concurrent appenders — " +
      "the loser retries and both batches are visible") {
    import spark.implicits._
    val path = s"file:${freshDir()}/t"
    SnapshotTable.append((1 to 5).toDF("x"), path, 1)
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq((6 to 15).toDF("x"), (16 to 18).toDF("x")).map { df =>
      new Thread(() => {
        start.await()
        try results.add(SnapshotTable.append(df, path, 1))
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"appender failed: ${errs.peek()}")
    val vs = results.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(vs.toSet === Set(2L, 3L))
    assert(SnapshotTable.scanAt(spark, path, 3)._1.count() === 18)
  }

  test("clone ownership guard through the Hadoop impl: clone-side GC " +
      "never deletes source files") {
    import spark.implicits._
    val src = s"file:${freshDir()}/src"
    val dst = s"file:${freshDir()}/dst"
    SnapshotTable.append((1L to 20L).toDF("k"), src, 2,
      statsCol = Some("k"))
    SnapshotTable.cloneAt(spark, src, dst)
    SnapshotTable.deleteStatsRange(spark, dst, 1L, 5L)
    SnapshotTable.expire(spark, dst, keepFrom = 2)
    SnapshotTable.vacuum(spark, dst, olderThanMs = 0)
    // the source is intact: clone GC only sweeps under its own root
    assert(SnapshotTable.scanAt(spark, src, 1)._1.count() === 20)
    assert(SnapshotTable.scanAt(spark, dst, 2)._1.count() === 15)
  }
}
