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
      .collect().map(r => (r.getAs[Any](0), r.getString(1), r.getLong(2)))
      .toSet
    val batch = Tables.normalizeEventTs(
        spark.read.parquet(s"$dir/events.parquet"))
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getAs[Any](0), r.getString(1), r.getLong(2)))
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

  test("first-seen state EXPIRES on event-time timeout and a returning " +
    "user starts fresh") {
    import org.apache.spark.sql.types._
    val d = Files.createTempDirectory("graft-stream-ttl")
    val day = 24L * 3600 * 1000
    val t0 = 1700000000000L // epoch ms
    def writeFile(name: String, rows: Seq[(Long, Long, Long)]): Unit = {
      import spark.implicits._
      rows.toDF("event_id", "user_id", "ms")
        .select(col("event_id"), expr("ms * 1000000").as("ts"),
          col("user_id"), lit("click").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite")
        .parquet(d.resolve(name).toString)
    }
    // one file per micro-batch (maxFilesPerTrigger=1): user 1 appears,
    // goes idle past the 1-day TTL while user 2 advances the watermark,
    // then returns after expiry
    writeFile("f1", Seq((1L, 1L, t0)))
    writeFile("f2", Seq((2L, 2L, t0 + 10 * day)))
    writeFile("f3", Seq((3L, 2L, t0 + 12 * day)))
    writeFile("f4", Seq((4L, 1L, t0 + 14 * day)))
    // the file source reads nested part dirs via glob
    val glob = s"$d/f*"
    val raw = spark.readStream
      .schema(EventStream.eventsSchema(LongType))
      .option("maxFilesPerTrigger", 1)
      .parquet(glob)
    val events = Tables.normalizeEventTs(raw)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    val rows = EventStream.runToCompletion(spark,
      EventStream.firstSeenPerUser(spark, events, idleTtlMs = day).toDF(),
      "first_ttl").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val t0ns = t0 * 1000000L
    // pre-expiry state for user 1...
    assert(rows.contains((1L, t0ns, 1L)))
    // ...and the post-expiry RESET: had state survived, the return
    // visit would read (first_ts = t0, n_events = 2)
    assert(rows.contains((1L, (t0 + 14 * day) * 1000000L, 1L)))
    assert(!rows.contains((1L, t0ns, 2L)))
  }

  test("stateful stream through the parquet FILE sink commits the same " +
    "rows as the memory sink") {
    val viaMemory = EventStream.runToCompletion(spark,
      EventStream.sessionizeStream(spark,
        EventStream.readEvents(spark, dir)).toDF(),
      "sessions_mem", outputMode = "append")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val sink = Files.createTempDirectory("graft-stream-sink")
    val viaFiles = EventStream.runToParquet(spark,
      EventStream.sessionizeStream(spark,
        EventStream.readEvents(spark, dir)).toDF(), sink)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(viaFiles === viaMemory)
    assert(viaFiles.nonEmpty)
    // the sink's exactly-once commit log is present and non-trivial
    assert(Files.exists(sink.resolve("data").resolve("_spark_metadata")))
    assert(Files.exists(sink.resolve("checkpoint")))
  }

  test("stream-stream interval join emits exactly the batch attribution " +
    "pairs, via a symmetric-hash join with watermarked state") {
    val joined = EventStream.intervalJoinStream(
      EventStream.readEvents(spark, dir))
    // the physical plan must be the stream-stream symmetric hash join
    // (both buffers watermark-evicted), not a broadcast/sort-merge plan
    // that would buffer a whole side
    val q = joined.writeStream.format("memory").queryName("ssjoin_pairs")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val stateOps = q.recentProgress.flatMap(_.stateOperators)
      .map(_.operatorName).toSet
    val streamed = spark.table("ssjoin_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = Tables.normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), expr("ts div 1000").as("view_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), expr("ts div 1000").as("click_us"))
    val batch = views.join(clicks,
        col("user_id") === col("cu") && col("click_us") >= col("view_us") &&
          col("click_us") <= col("view_us") + 30L * 60 * 1000 * 1000)
      .select(col("user_id"), col("view_us"), col("click_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    assert(stateOps.exists(_.toLowerCase.contains("symmetrichashjoin")),
      s"expected a stream-stream symmetric hash join, got $stateOps")
  }

  test("left-outer stream-stream join: matches emit inner-style; " +
    "unmatched views emit a null click exactly when the final " +
    "watermark passes their match horizon") {
    val joined = EventStream.intervalJoinStream(
      EventStream.readEvents(spark, dir), joinType = "left_outer")
    val streamed = EventStream.runToCompletion(spark, joined,
      "ssjoin_outer", outputMode = "append")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val ev = Tables.normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
    val matchUs = 30L * 60 * 1000 * 1000
    // the query watermark is the MIN across both watermark nodes, each
    // computed over its own FILTERED side — not over all events
    val finalWm = ev.filter(col("event_type").isin("view", "click"))
      .groupBy(col("event_type")).agg(max(expr("ts div 1000")).as("m"))
      .agg(min(col("m"))).collect()(0).getLong(0) - 2L * 3600 * 1000 * 1000
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), expr("ts div 1000").as("view_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), expr("ts div 1000").as("click_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = views.toSeq.flatMap { case (u, v) =>
      val ms = clicks.toSeq.filter { case (cu, c) =>
        cu == u && c >= v && c <= v + matchUs }
      if (ms.nonEmpty) ms.map { case (_, c) => (u, v, Option(c)) }
      else if (v + matchUs < finalWm) Seq((u, v, Option.empty[Long]))
      else Seq.empty[(Long, Long, Option[Long])] // inside the horizon
    }.toSet
    assert(streamed === expected)
    assert(streamed.exists(_._3.isEmpty), "fixture should have orphans")
    assert(streamed.exists(_._3.nonEmpty))
  }

  test("transformWithState running totals: RocksDB-backed ValueState " +
    "survives MULTIPLE micro-batches and equals the batch aggregate") {
    // two copies of the events file -> at least two files in the
    // stream; force one file per micro-batch so state genuinely
    // round-trips through RocksDB between batches
    val d2 = Files.createTempDirectory("graft-stream-tws")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      d2.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      d2.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val streamed = EventStream.withRocksDbStateStore(spark) {
      val src = spark.readStream
        .schema(EventStream.eventsSchema(
          spark.read.parquet(d2.toString).schema("ts").dataType))
        .option("maxFilesPerTrigger", 1)
        .parquet(d2.toString)
      val events = Tables.normalizeEventTs(src)
        .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      EventStream.runToCompletion(spark,
        EventStream.runningTotalsPerUser(spark, events).toDF(),
        "tws_totals", outputMode = "update")
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n"), max(col("sum_id")).as("s"),
          max(col("max_ts")).as("m"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    }
    val batch = Tables.normalizeEventTs(
        spark.read.parquet(d2.toString))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("s"),
        max(col("ts")).as("m"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(streamed === batch)
    assert(batch.valuesIterator.forall(_._1 >= 2),
      "every user should have been seen in both files")
  }
}
