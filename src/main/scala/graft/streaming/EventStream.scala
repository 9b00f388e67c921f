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
  * The events table schema is probed from the files present at stream
  * start (a streaming source needs a fixed schema upfront), then `ts`
  * is normalized to the engine's integer-nanos contract exactly like
  * the batch path (Tables.normalizeEventTs) — the stream keeps working
  * whether the driver generates INT64 nanos or TIMESTAMP(MICROS).
  */
object EventStream {

  /** The stream's schema with `ts` as the given physical time type. */
  def eventsSchema(tsType: DataType): StructType = new StructType()
    .add("event_id", LongType).add("ts", tsType)
    .add("user_id", LongType).add("event_type", StringType)
    .add("value", DoubleType).add("props", StringType)

  /** File-watch stream over a directory of events parquet. Probes the
    * physical `ts` type from files already in the directory (falling
    * back to µs-timestamp, the current driver fixture shape, when the
    * directory is still empty) so late-arriving files of the probed
    * shape always parse.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val tsType = scala.util.Try(spark.read.parquet(dir).schema("ts").dataType)
      .getOrElse(TimestampNTZType)
    val raw = spark.readStream.schema(eventsSchema(tsType)).parquet(dir)
    graft.Tables.normalizeEventTs(raw)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
  }

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
    * sightings only bump the count. State carries an EVENT-TIME TIMEOUT:
    * a user idle for `idleTtlMs` past the watermark is emitted one final
    * time and expired, so state is bounded by the ACTIVE key-set inside
    * the TTL horizon, not by every user ever seen. The final emission
    * equals the last update, so update-mode sinks see no change; a user
    * returning after expiry starts a fresh first_ts (the get-or-create
    * row would already have been persisted downstream).
    */
  def firstSeenPerUser(spark: SparkSession, events: DataFrame,
                       idleTtlMs: Long = 30L * 24 * 3600 * 1000): Dataset[FirstSeen] = {
    import spark.implicits._
    events
      .withWatermark("event_time", "2 hours")
      // the watermarked column must reach the stateful operator's input
      .select(col("user_id"), col("ts"), col("event_time"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[FirstSeen]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val batch = rows.toSeq
            val prev = state.getOption
            val first = prev.map(_.first_ts).getOrElse(Long.MaxValue)
              .min(batch.map(_._2).min)
            val updated = FirstSeen(user, first,
              prev.map(_.n_events).getOrElse(0L) + batch.size)
            state.update(updated)
            // deadline rides the user's newest event (ts is integer
            // nanos; the state clock is epoch millis); clamp above the
            // watermark — a below-watermark deadline is rejected, and
            // clamping only hastens the correct expiry
            val lastMs = batch.map(_._2).max / 1000000L
            state.setTimeoutTimestamp(math.max(lastMs + idleTtlMs,
              state.getCurrentWatermarkMs + 1))
            updated
          }
      }
  }

  final case class Session(user_id: Long, session_start: Long,
                           session_end: Long, n_events: Long)
  final case class OpenSession(start: Long, last: Long, n: Long)

  /** Streaming sessionization (the streaming twin of batch q51):
    * >`gapMs` of per-user silence closes a session. Sessions closed by
    * a later in-stream event emit immediately; the trailing open
    * session emits when the EVENT-TIME TIMEOUT fires — i.e. when the
    * watermark passes its gap deadline — so state is bounded by the
    * number of users with activity inside the watermark horizon, not by
    * history. Times are epoch millis.
    *
    * flatMapGroupsWithState rather than mapGroupsWithState because one
    * micro-batch can close MANY sessions for one key (a burst spanning
    * several gaps), and a timeout invocation can emit zero or one.
    */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
                       gapMs: Long = 30L * 60 * 1000): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("event_time", "2 hours")
      .select(col("user_id"), col("event_time")).as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start, s.last, s.n))
          } else {
            val ts = rows.map(_._2.getTime).toArray.sorted
            val closed = Seq.newBuilder[Session]
            var open = state.getOption
            ts.foreach { t =>
              open match {
                case Some(o) if t - o.last > gapMs =>
                  closed += Session(user, o.start, o.last, o.n)
                  open = Some(OpenSession(t, t, 1))
                case Some(o) =>
                  open = Some(o.copy(last = t, n = o.n + 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { o =>
              state.update(o)
              // the deadline may already be under the watermark when this
              // batch replays old data; a timeout timestamp must sit above
              // the watermark, and clamping only hastens the (correct)
              // timeout emission
              state.setTimeoutTimestamp(
                math.max(o.last + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup (the streaming twin of batch q36): duplicate
    * event_ids arriving within the watermark horizon collapse to the
    * first sighting; dedup state for ids older than the watermark is
    * dropped, keeping state bounded — the engine-level contract for
    * at-least-once upstreams at 100 TB/day rates.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream INTERVAL self-join: each `view` event
    * pairs with every `click` by the same user landing inside
    * [view, view + matchMs] — the attribution-join shape. Both sides
    * carry a watermark and the join condition bounds click_time
    * relative to view_time, so Spark derives state-eviction thresholds
    * for BOTH join buffers (a view row is dropped once the watermark
    * passes view_time + matchMs; a click row once it passes
    * click_time): state holds only the sliding correlation horizon,
    * never the whole stream — the property that keeps a 100 TB/day
    * stream joinable. Inner join ⇒ append-mode emission as soon as
    * both sides of a pair have arrived.
    *
    * Emits (user_id, view_us, click_us) with times in epoch micros —
    * exactly `ts div 1000` of the integer-nanos contract, so a batch
    * oracle comparing at microsecond precision sees identical values.
    */
  def intervalJoinStream(events: DataFrame,
                         matchMs: Long = 30L * 60 * 1000,
                         joinType: String = "inner"): DataFrame = {
    require(matchMs > 0 && matchMs % 1000 == 0,
      s"matchMs $matchMs must be a positive whole number of seconds " +
        "(the interval literal is built in seconds)")
    def side(tpe: String, tag: String): DataFrame =
      events.filter(col("event_type") === tpe)
        .select(col("user_id").as(s"${tag}_user"),
          expr("ts div 1000").as(s"${tag}_us"),
          col("event_time").as(s"${tag}_time"))
        .withWatermark(s"${tag}_time", "2 hours")
    // left_outer adds the watermark-driven null emission: an unmatched
    // view row is held in the join buffer until the watermark passes
    // view_time + matchMs (no future click can match it), then emits
    // once with a null click — eviction and outer-result emission are
    // the same event, so "no match" is as incremental as "match"
    side("view", "view").join(side("click", "click"),
      col("view_user") === col("click_user") &&
        col("click_time") >= col("view_time") &&
        col("click_time") <= col("view_time") +
          expr(s"INTERVAL ${matchMs / 1000} SECONDS"),
      joinType)
      .select(col("view_user").as("user_id"), col("view_us"),
        col("click_us"))
  }

  /** Run `body` with a temporarily overridden shuffle-partition count.
    * A streaming query PINS its state-store partition count at the
    * first checkpoint, so this is the knob that sizes stateful-operator
    * state files — and it should track the stateful workload's key
    * cardinality/throughput, not the batch engine's global shuffle
    * default (32 here): at harness scale 32 state stores per operator
    * are pure per-partition overhead (~2.4× slower per measurement),
    * while a 100 TB/day deployment would raise it and keep it fixed
    * for the life of the checkpoint.
    */
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  final case class UserTotals(user_id: Long, n_events: Long,
                              sum_id: Long, max_ts: Long)

  /** Arbitrary-state processor on the NEW `transformWithState` API
    * (Spark 4's successor to mapGroupsWithState: composable typed state
    * variables, timers, TTL — and RocksDB-backed only). Keeps one
    * ValueState of running per-user totals; every input batch updates
    * it and emits the revision. Each field is MONOTONE (n grows, ids
    * are non-negative so the sum grows, max_ts only rises), so an
    * update-mode sink recovers the final state with per-column max —
    * the same determinism-under-any-batching argument q95 uses.
    */
  private class TotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long), UserTotals] {
    @transient private var totals:
      org.apache.spark.sql.streaming.ValueState[UserTotals] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[UserTotals]("totals",
        org.apache.spark.sql.Encoders.product[UserTotals],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, Long)],
        tv: org.apache.spark.sql.streaming.TimerValues)
    : Iterator[UserTotals] = {
      var n = 0L; var s = 0L; var m = Long.MinValue
      if (totals.exists()) {
        val p = totals.get()
        n = p.n_events; s = p.sum_id; m = p.max_ts
      }
      rows.foreach { case (_, id, ts) =>
        n += 1; s += id; if (ts > m) m = ts
      }
      val upd = UserTotals(user, n, s, m)
      totals.update(upd)
      Iterator.single(upd)
    }
  }

  /** Per-user running totals via `transformWithState` — rows are
    * (user_id, event_id, ts-nanos). The caller must enable the RocksDB
    * state store provider (see [[withRocksDbStateStore]]): the new API
    * refuses the default HDFS-backed provider.
    */
  def runningTotalsPerUser(spark: SparkSession, events: DataFrame)
  : Dataset[UserTotals] = {
    import spark.implicits._
    events.select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new TotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Run `body` with the RocksDB state store provider (the only
    * provider `transformWithState` supports), restoring the previous
    * provider afterwards.
    */
  def withRocksDbStateStore[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
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

  /** The PRODUCTION sink path: run an append-mode stream through the
    * exactly-once parquet FILE sink (commit-log checkpointed) and read
    * back what the sink committed. Unlike the memory sink nothing
    * materializes on the driver — output scales with the sink store,
    * not driver memory. `fresh` wipes output + checkpoint first so
    * repeated harness invocations stay deterministic (a live deployment
    * keeps both and resumes incrementally).
    */
  def runToParquet(spark: SparkSession, streaming: DataFrame,
                   outDir: java.nio.file.Path,
                   fresh: Boolean = true): DataFrame = {
    val data = outDir.resolve("data")
    val ckpt = outDir.resolve("checkpoint")
    if (fresh) { graft.Work.wipe(data); graft.Work.wipe(ckpt) }
    val q = streaming.writeStream
      .format("parquet")
      .option("path", data.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(data.toString)
  }
}
