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
    val batch = spark.read.parquet(s"$dir/events.parquet")
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
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed === batch)
  }
}
