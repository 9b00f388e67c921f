package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.SnapshotTable

/** The snapshot table as a streaming SOURCE: version offsets,
  * append-only micro-batches planned from the manifest diff,
  * exactly-once delivery across restarts via Spark's offset log, and
  * loud failure on histories an append-only tail cannot represent.
  */
class GraftTableStreamSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("gstr").toString

  private def runStream(table: String, sink: String, ckpt: String): Unit = {
    val q = spark.readStream.format("graft_table")
      .option("path", table).load()
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    ()
  }

  test("initial snapshot, then append-only tail: restarts deliver each " +
      "version's rows exactly once") {
    import spark.implicits._
    val root = freshDir()
    val table = s"$root/t"
    val sink = s"$root/sink"
    val ckpt = s"$root/ckpt"
    SnapshotTable.append((1L to 100L).map(k => (k, k * 2))
      .toDF("k", "v"), table, 2, statsCol = Some("k"))
    SnapshotTable.append((101L to 150L).map(k => (k, k * 2))
      .toDF("k", "v"), table, 1, statsCol = Some("k"))
    runStream(table, sink, ckpt)
    val first = spark.read.parquet(sink)
    assert(first.count() === 150)
    assert(first.agg(sum("k")).head.getLong(0) === (1L to 150L).sum)
    // tail: a new append between runs arrives exactly once
    SnapshotTable.append((151L to 170L).map(k => (k, k * 2))
      .toDF("k", "v"), table, 1, statsCol = Some("k"))
    runStream(table, sink, ckpt)
    val second = spark.read.parquet(sink)
    assert(second.count() === 170,
      "restart must deliver ONLY the new version's rows")
    assert(second.agg(sum("k")).head.getLong(0) === (1L to 170L).sum)
    // idle restart delivers nothing
    runStream(table, sink, ckpt)
    assert(spark.read.parquet(sink).count() === 170)
  }

  test("a non-append commit in range fails the stream loudly instead " +
      "of silently missing the retraction") {
    import spark.implicits._
    val root = freshDir()
    val table = s"$root/t"
    SnapshotTable.append((1L to 100L).map(k => (k, k)).toDF("k", "v"),
      table, 4, statsCol = Some("k"))
    runStream(table, s"$root/sink", s"$root/ckpt")
    // COW delete between stream runs: files leave the table
    SnapshotTable.deleteStatsRange(spark, table, 1, 25)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft_table")
        .option("path", table).load()
        .writeStream.format("parquet")
        .option("path", s"$root/sink")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      ()
    }
    assert(e.getCause.getMessage.contains("tailChanges") ||
      e.getMessage.contains("tailChanges"))
  }
}
