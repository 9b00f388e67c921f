package graft

import java.nio.file.Files
import graft.pipeline.Preprocess
import graft.source.NetCdfFixture
import graft.streaming.StreamingPreprocess

/** File-watch streaming over the drop directory driving the batch
  * pipeline per micro-batch: files dropped later are picked up
  * incrementally (checkpointed source log), earlier items survive
  * unchanged (pipeline idempotence).
  */
class StreamingPreprocessSpec extends SparkSpec {

  test("two drops, two drains: incremental pickup, earlier items stable") {
    val work = Files.createTempDirectory("graft-spre")
    val watch = work.resolve("drop")
    val checkpoint = work.resolve("ckpt").toString
    val opts = Preprocess.Options(
      name = "sic_north", dataPath = work.resolve("data").toString,
      stacOnly = true)

    // drop 1: one forecast file
    NetCdfFixture.writeFiles(watch, n = 1)
    val after1 = StreamingPreprocess
      .runAvailableNow(spark, watch.toString, checkpoint, opts)
      .select("id").collect().map(_.getString(0)).sorted
    assert(after1.length === 1)

    // drop 2: a second file lands; same checkpoint → only the NEW file
    // forms the micro-batch, and the existing item is untouched
    NetCdfFixture.writeFiles(watch, n = 2)
    var batches = Vector.empty[StreamingPreprocess.BatchRun]
    val q = StreamingPreprocess.start(spark, watch.toString, checkpoint,
      opts, br => batches :+= br)
    q.awaitTermination()
    assert(batches.map(_.nFiles).sum === 1, s"batches=$batches")

    val after2 = graft.sink.StacJsonSink
      .readItems(spark, batches.head.result.catalogRoot)
      .select("id").collect().map(_.getString(0)).sorted
    assert(after2.length === 2)
    assert(after1.toSet.subsetOf(after2.toSet))

    // drain 3: nothing new — no batch fires, catalog unchanged
    val after3 = StreamingPreprocess
      .runAvailableNow(spark, watch.toString, checkpoint, opts)
      .select("id").collect().map(_.getString(0)).sorted
    assert(after3.toSeq === after2.toSeq)
  }
}
