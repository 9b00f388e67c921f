package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.SnapshotTable

/** Incremental tail consumption of the snapshot-table commit log:
  * initial-snapshot semantics, delta-only redelivery, deterministic
  * at-least-once batches, and the txn composition that makes the
  * pipeline exactly-once end to end. q170 oracle-gates the composed
  * arithmetic cross-engine.
  */
class TailConsumerSpec extends SparkSpec {

  private def fresh(tag: String): String =
    Files.createTempDirectory(tag).toString + "/t"

  test("first tail delivers the whole table as inserts, the next " +
      "delivers only the delta, and an idle table delivers nothing") {
    import spark.implicits._
    val path = fresh("tail")
    val ckpt = Files.createTempDirectory("ckpt").toString
    SnapshotTable.append((1L to 100L).toDF("x"), path, 2)
    SnapshotTable.append((101L to 250L).toDF("x"), path, 2)
    var seen = Seq.empty[(String, Long)]
    val b1 = SnapshotTable.tailChanges(spark, path, ckpt) { (df, from, to) =>
      assert(from === 0 && to === 2)
      seen = df.groupBy("_change").agg(count(lit(1)))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    assert(b1 === Some(SnapshotTable.TailBatch(0, 2)))
    assert(seen === Seq(("insert", 250L)))
    SnapshotTable.append((251L to 300L).toDF("x"), path, 1)
    val b2 = SnapshotTable.tailChanges(spark, path, ckpt) { (df, _, _) =>
      assert(df.count() === 50) // the delta, not the table
    }
    assert(b2 === Some(SnapshotTable.TailBatch(2, 3)))
    assert(SnapshotTable.tailChanges(spark, path, ckpt)((_, _, _) =>
      fail("idle table must not deliver")) === None)
  }

  test("a crash before the offset commit re-delivers exactly the same " +
      "batch; txn-keyed downstream writes dedupe the replay") {
    import spark.implicits._
    val path = fresh("tailsrc")
    val down = fresh("taildst")
    val ckpt = Files.createTempDirectory("ckpt").toString
    SnapshotTable.append((1L to 80L).toDF("x"), path, 2)
    // crash: the callback's side effect lands, the offset does not
    intercept[RuntimeException] {
      SnapshotTable.tailChanges(spark, path, ckpt) { (df, _, to) =>
        SnapshotTable.append(df, down, 1, txn = Some(("c", to)))
        throw new RuntimeException("crash after side effect")
      }
    }
    assert(SnapshotTable.committedOffset(ckpt) === 0)
    // retry: same (0, 1) range; the txn watermark absorbs the replay
    SnapshotTable.tailChanges(spark, path, ckpt) { (df, from, to) =>
      assert(from === 0 && to === 1)
      SnapshotTable.append(df, down, 1, txn = Some(("c", to)))
    }
    assert(SnapshotTable.committedOffset(ckpt) === 1)
    assert(SnapshotTable.scanAt(spark, down,
      SnapshotTable.latestVersion(down))._1.count() === 80)
  }

  test("an expired checkpoint fails loudly instead of skipping history") {
    import spark.implicits._
    val path = fresh("tailexp")
    val ckpt = Files.createTempDirectory("ckpt").toString
    SnapshotTable.append((1L to 10L).toDF("x"), path, 1)
    SnapshotTable.tailChanges(spark, path, ckpt)((_, _, _) => ())
    SnapshotTable.append((11L to 20L).toDF("x"), path, 1)
    SnapshotTable.append((21L to 30L).toDF("x"), path, 1)
    SnapshotTable.expire(spark, path, keepFrom = 2)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.tailChanges(spark, path, ckpt)((_, _, _) => ())
    }
    assert(e.getMessage.contains("expired"))
    // re-bootstrap: reset to 0 → initial snapshot of the live table
    SnapshotTable.resetOffset(ckpt, 0)
    SnapshotTable.tailChanges(spark, path, ckpt) { (df, from, _) =>
      assert(from === 0 && df.count() === 30)
    }
  }
}
