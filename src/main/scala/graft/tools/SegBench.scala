package graft.tools
import org.apache.spark.sql.functions._
import graft.ops.SnapshotTable

/** One-off measurement harness for BASELINE.md: manifest bytes and
  * commit/planning latency, inline vs segmented, at a few thousand
  * files. Not part of the library surface; invoked manually.
  */
object SegBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("8")
    import spark.implicits._
    val nFiles = args.headOption.map(_.toInt).getOrElse(2000)
    val df = (0 until 200000).map(i => (i.toLong, i * 2L)).toDF("k", "x")
    val small = (0 until 200).map(i => (1000000L + i, i.toLong)).toDF("k", "x")
    def run(tag: String, threshold: Int): Unit = {
      spark.conf.set("spark.graft.manifest.segmentThreshold", threshold.toString)
      val p = s"/tmp/segbench/$tag/t"
      graft.Work.wipe(java.nio.file.Paths.get(s"/tmp/segbench/$tag"))
      SnapshotTable.append(df, p, nFiles, statsCol = Some("k"))
      // 10 small appends: time the COMMIT half only (data write excluded
      // is hard; use tiny batches so commit dominates is false... just
      // report end-to-end and manifest bytes)
      val t0 = System.nanoTime()
      (0 until 10).foreach(_ => SnapshotTable.append(small, p, 1, statsCol = Some("k")))
      val appendMs = (System.nanoTime() - t0) / 1e6 / 10
      val latest = SnapshotTable.latestVersion(p)
      val hdr = java.nio.file.Files.size(java.nio.file.Paths.get(p, "log", s"v$latest.json"))
      // planning read: cold JVM cache emulation not possible in-process;
      // report warm re-read (memo off: readVersion is uncached)
      val r0 = System.nanoTime()
      (0 until 5).foreach(_ => SnapshotTable.readVersion(spark, p, latest))
      val readMs = (System.nanoTime() - r0) / 1e6 / 5
      println(f"SEGBENCH $tag%-9s files=${nFiles + 10} headerBytes=$hdr%8d appendMs=$appendMs%8.1f readVersionMs=$readMs%8.1f")
    }
    run("segmented", 512)
    run("inline", 1000000)
    spark.stop()
  }
}
