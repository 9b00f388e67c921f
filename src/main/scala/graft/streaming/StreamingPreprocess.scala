package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline.Preprocess

/** The streaming-native form of the reference's incremental re-run loop
  * (SURVEY §2.12): a file-watch Structured Streaming source over the
  * input drop directory, with `foreachBatch` invoking the UNCHANGED
  * batch pipeline on each micro-batch's new files.
  *
  * Exactly-once file pickup comes from the checkpointed file-source log;
  * duplicate-safe output comes from the pipeline's own idempotence
  * (config equality check, existence-skip on slices/COGs, get-or-create
  * anti-join on items) — the same properties that make the batch CLI
  * safely re-runnable make every micro-batch a no-op replay under
  * failure recovery.
  *
  * The source is metadata-only: only `path` is selected, so binaryFile
  * column pruning keeps file CONTENT out of the stream; the batch
  * pipeline re-reads bytes itself, executor-side, from the listed paths.
  */
object StreamingPreprocess {

  final case class BatchRun(batchId: Long, nFiles: Int, result: Preprocess.Result)

  /** Start the watch. `Trigger.AvailableNow` drains everything currently
    * in the directory then stops — the harness/test form; a live
    * deployment passes a processing-time trigger instead.
    */
  def start(spark: SparkSession, watchDir: String, checkpoint: String,
            opts: Preprocess.Options,
            onBatch: BatchRun => Unit = _ => (),
            trigger: Trigger = Trigger.AvailableNow(),
            /** Bounds BOTH the per-batch driver list and the batch
              * pipeline's working set — at 100× ingest rate this is
              * what keeps each micro-batch a constant-sized unit of
              * work instead of "everything that arrived".
              */
            maxFilesPerTrigger: Int = 1000): StreamingQuery = {
    // streaming file sources demand an explicit schema; this is
    // binaryFile's fixed one
    val binaryFileSchema = new org.apache.spark.sql.types.StructType()
      .add("path", org.apache.spark.sql.types.StringType)
      .add("modificationTime", org.apache.spark.sql.types.TimestampType)
      .add("length", org.apache.spark.sql.types.LongType)
      .add("content", org.apache.spark.sql.types.BinaryType)
    require(maxFilesPerTrigger > 0, "maxFilesPerTrigger must be positive")
    val newFiles = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.nc")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(watchDir)
      .select(col("path"))
    newFiles.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // the per-batch file LIST is driver-sized by construction (it is
        // the source's own listing); the pipeline reads the bytes
        // distributed, so nothing corpus-sized lands on the driver
        val paths = batch.collect().map(_.getString(0))
        if (paths.nonEmpty) {
          val res = Preprocess.run(spark, paths.mkString(","), opts)
          onBatch(BatchRun(batchId, paths.length, res))
        }
      }
      .start()
  }

  /** Drain-available-and-stop convenience: watch, process, return the
    * catalog-item view of the result.
    */
  def runAvailableNow(spark: SparkSession, watchDir: String,
                      checkpoint: String, opts: Preprocess.Options): DataFrame = {
    @volatile var root: Option[String] = None
    val q = start(spark, watchDir, checkpoint, opts,
      br => root = Some(br.result.catalogRoot))
    q.awaitTermination()
    // no new files this drain → read the catalog where the pipeline
    // would have written it
    val catalogRoot = root.getOrElse(
      s"${opts.dataPath}/stac/${opts.catalogName}")
    graft.sink.StacJsonSink.readItems(spark, catalogRoot).toDF()
  }
}
