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
    val nFiles = args.headOption.filterNot(_.startsWith("planner"))
      .map(_.toInt).getOrElse(2000)
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
    if (args.contains("planner200k")) planner200k(spark)
    else if (args.contains("planner1m")) planner(spark, nBatches = 500)
    else {
      run("segmented", 512)
      run("inline", 1000000)
    }
    spark.stop()
  }

  /** The 200k-file PLANNER point: commit header bytes, warm
    * readVersion, and one typed-stats-pruned plan, measured against a
    * 200k-file segmented manifest. The data plane is SYNTHETIC (the
    * file names never exist — none of the measured paths opens a data
    * file): the first small commit is real parquet (it fixes the
    * schema + typed-stats declaration), after which 100 × 2k-file
    * batches commit through [[SnapshotTable.commitAppendFiles]] with
    * WRITER-TRACKED bounds — the same metadata arithmetic a real
    * 1000-executor ingest would drive, at a file count the local
    * sandbox cannot materialize as actual parquet.
    */
  private def planner200k(spark: org.apache.spark.sql.SparkSession)
      : Unit = planner(spark, nBatches = 100)

  /** Parameterized planner point: nBatches × 2k synthetic files —
    * 100 = the r18 200k point, 500 = the r19 1M-file decade.
    */
  private def planner(spark: org.apache.spark.sql.SparkSession,
                      nBatches: Int): Unit = {
    import spark.implicits._
    import graft.ops.SnapshotTable.ColStats
    spark.conf.set("spark.graft.manifest.segmentThreshold", "512")
    val root = "/tmp/segbench/p200k"
    graft.Work.wipe(java.nio.file.Paths.get(root))
    val p = s"$root/t"
    // real first commit: 8 files, declares stats k (legacy) + d (DATE)
    SnapshotTable.append(
      (0 until 4000).map(i => (i.toLong, java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(19000 + i % 8)), i.toLong))
        .toDF("k", "d", "v"),
      p, 8, statsCol = Some("k"), statsCols = Seq("d"))
    val batchFiles = 2000
    var commitMsTotal = 0.0
    val perBatchMs = new Array[Double](nBatches)
    (0 until nBatches).foreach { b =>
      val files = (0 until batchFiles).map(i =>
        s"$root/synthetic/batch-$b/part-$i.parquet")
      val rows = Seq.fill(batchFiles)(1000L)
      val bytes = Seq.fill(batchFiles)(1L << 20)
      // disjoint per-batch DATE ranges: a one-day probe prunes to
      // one batch's files
      val day = (20000 + b).toString
      val tracked = Seq(ColStats("d", "date",
        mins = Seq.fill(batchFiles)(day),
        maxs = Seq.fill(batchFiles)(day),
        has = Seq.fill(batchFiles)(true),
        exact = Seq.fill(batchFiles)(true),
        nulls = Seq.fill(batchFiles)(0L)))
      val t0 = System.nanoTime()
      SnapshotTable.commitAppendFiles(spark, p, files, rows, bytes,
        batchCols = Seq("k", "d", "v"), statsCol = Some("k"),
        statMinMax = Some((Seq.fill(batchFiles)(b.toLong * 1000),
          Seq.fill(batchFiles)(b.toLong * 1000 + 999))),
        bloomCol = None, txn = None, trackedCs = Some(tracked))
      perBatchMs(b) = (System.nanoTime() - t0) / 1e6
      commitMsTotal += perBatchMs(b)
    }
    // O(Δ) sanity: the NON-COLLAPSE commits must not grow with table
    // size — report the median of the first and last deciles
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    println(f"SEGBENCH planner${nBatches * 2}k commitMs first10med=" +
      f"${med(perBatchMs.take(10).toSeq)}%.1f last10med=" +
      f"${med(perBatchMs.takeRight(10).toSeq)}%.1f " +
      f"max=${perBatchMs.max}%.1f")
    val worst = perBatchMs.zipWithIndex.sortBy(-_._1).take(8)
    println("SEGBENCH worst8 " + worst.map { case (ms, b) =>
      f"b$b%d=$ms%.0fms" }.mkString(" "))
    val latest = SnapshotTable.latestVersion(p)
    val hdr = java.nio.file.Files.size(
      java.nio.file.Paths.get(p, "log", s"v$latest.json"))
    val nFiles = SnapshotTable.readVersion(spark, p, latest).files.length
    val r0 = System.nanoTime()
    (0 until 5).foreach(_ => SnapshotTable.readVersion(spark, p, latest))
    val readMs = (System.nanoTime() - r0) / 1e6 / 5
    // pruned plan: the manifest-pruning arithmetic over all 200k
    // files (schema resolution would open a synthetic footer — the
    // measured path is pruneFiles, which touches only the manifest)
    val ver200k = SnapshotTable.readVersion(spark, p, latest)
    val res = graft.source.v2.GraftTableSource.Resolved(p, latest,
      ver200k, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("d",
          org.apache.spark.sql.types.DateType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))),
      Seq.empty)
    val probe = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(20042))
    val f0 = System.nanoTime()
    val kept = graft.source.v2.GraftTableSource.pruneFiles(res,
      Array(org.apache.spark.sql.sources.EqualTo("d", probe)))
    val planMs = (System.nanoTime() - f0) / 1e6
    println(f"SEGBENCH planner${nBatches * 2}k files=$nFiles%d headerBytes=$hdr%d " +
      f"avgCommitMs=${commitMsTotal / nBatches}%.1f " +
      f"readVersionMs=$readMs%.1f prunePlanMs=$planMs%.1f " +
      f"keptFiles=${kept.length}%d")
    require(kept.length == batchFiles,
      s"typed pruning at 200k files kept ${kept.length}, expected " +
        s"$batchFiles")
  }
}
