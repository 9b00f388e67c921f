package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Streaming semantics vs the batch oracle: the windowed aggregation
  * over a file stream must equal the same aggregation computed in batch
  * over the same files, and first-wins state must match the batch
  * min/count per user.
  */
class EventStreamSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-stream")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  test("windowed counts over the file stream equal the batch aggregation") {
    val streamed = EventStream.runToCompletion(spark,
      EventStream.windowedCounts(EventStream.readEvents(spark, dir)),
      "win_counts", outputMode = "complete")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val batch = Tables.normalizeEventTs(
        spark.read.parquet(s"$dir/events.parquet"))
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("first-wins user state matches batch min(ts)/count(*) per user") {
    val streamed = EventStream.runToCompletion(spark,
      EventStream.firstSeenPerUser(spark,
        EventStream.readEvents(spark, dir)).toDF(),
      "first_seen").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = Tables.normalizeEventTs(
        spark.read.parquet(s"$dir/events.parquet"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed === batch)
  }

  test("streaming sessionization matches a hand-rolled batch fold") {
    val gapMs = 30L * 60 * 1000
    val emitted = EventStream.runToCompletion(spark,
      EventStream.sessionizeStream(spark,
        EventStream.readEvents(spark, dir), gapMs).toDF(),
      "sessions", outputMode = "append")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // batch expectation at the same ms precision: fold each user's
    // sorted times into gap-split sessions; a session is EMITTED if a
    // later event closed it in-stream, or the final watermark
    // (max event time - 2h) passed its gap deadline
    val times = Tables.normalizeEventTs(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), expr("ts div 1000000").as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val finalWm = times.map(_._2).max - 2L * 3600 * 1000
    val expected = times.groupBy(_._1).flatMap { case (user, rows) =>
      val ts = rows.map(_._2).sorted
      val sessions = ts.foldLeft(Vector.empty[(Long, Long, Long)]) {
        case (acc, t) if acc.nonEmpty && t - acc.last._2 <= gapMs =>
          acc.init :+ ((acc.last._1, t, acc.last._3 + 1))
        case (acc, t) => acc :+ ((t, t, 1L))
      }
      val (trailing, closedInStream) = (sessions.last, sessions.init)
      val timedOut =
        if (trailing._2 + gapMs < finalWm) Seq(trailing) else Nil
      (closedInStream ++ timedOut).map(s => (user, s._1, s._2, s._3))
    }.toSet
    assert(emitted === expected)
    assert(emitted.nonEmpty)
  }

  test("streaming dedup collapses within-watermark duplicates") {
    val d = Files.createTempDirectory("graft-stream-dup")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val deduped = EventStream.runToCompletion(spark,
      EventStream.dedupStream(EventStream.readEvents(spark, d.toString)),
      "dedup", outputMode = "append")
    val distinctIds = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id").distinct().count()
    assert(deduped.select("event_id").distinct().count() === distinctIds)
    assert(deduped.count() === distinctIds,
      "each duplicated id must appear exactly once")
  }
}
