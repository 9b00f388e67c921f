package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.12). The reference is pure
  * batch; its "incrementality" is re-running over new files with
  * get-or-create semantics. The streaming-native upgrade is exactly
  * that: a file-watch source over the drop directory, with
  *
  *  - event-time tumbling-window aggregation under a watermark (the
  *    streaming form of the per-init grouping), and
  *  - first-wins keyed state via mapGroupsWithState (the streaming form
  *    of get-or-create J2: the first sighting of a key is the one that
  *    sticks), and
  *  - foreachBatch for running the UNCHANGED batch pipeline per
  *    micro-batch (idempotent by the same anti-join logic).
  *
  * The events table schema (ts is INT64 nanos read as long under
  * `nanosAsLong` — converted to a timestamp here, micros truncation
  * matching DuckDB).
  */
object EventStream {

  val eventsSchema: StructType = new StructType()
    .add("event_id", LongType).add("ts", LongType)
    .add("user_id", LongType).add("event_type", StringType)
    .add("value", DoubleType).add("props", StringType)

  /** File-watch stream over a directory of events parquet. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Tumbling 1-hour windows per event type with a 2-hour watermark:
    * late data beyond the watermark is dropped, state is bounded.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  final case class FirstSeen(user_id: Long, first_ts: Long, n_events: Long)

  /** First-wins keyed state (J2's streaming form): per user, the first
    * event timestamp ever seen is retained across micro-batches; later
    * sightings only bump the count. GroupStateTimeout.NoTimeout — the
    * user key-space is the bounded dimension here; production would set
    * an event-time timeout to expire idle keys.
    */
  def firstSeenPerUser(spark: SparkSession, events: DataFrame): Dataset[FirstSeen] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts")).as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[FirstSeen]) =>
          val batch = rows.toSeq
          val prev = state.getOption
          val first = prev.map(_.first_ts).getOrElse(Long.MaxValue)
            .min(batch.map(_._2).min)
          val updated = FirstSeen(user, first,
            prev.map(_.n_events).getOrElse(0L) + batch.size)
          state.update(updated)
          updated
      }
  }

  /** Run the stream to completion over the currently-available files
    * (Trigger.AvailableNow) into an in-memory table; returns the final
    * result. This is the harness form — a live deployment would use the
    * same query with a continuous trigger and a real sink.
    */
  def runToCompletion(spark: SparkSession, streaming: DataFrame,
                      name: String, outputMode: String = "update"): DataFrame = {
    val q = streaming.writeStream
      .format("memory").queryName(name).outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
