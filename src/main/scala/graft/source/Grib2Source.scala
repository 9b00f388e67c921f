package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed GRIB2 scan with PLANNING-TIME SUB-FILE SPLITS: the
  * driver walks each file's 16-octet message indicator sections only
  * (the information a `.idx` sidecar carries — O(messages) positioned
  * reads, zero payload bytes), coalesces consecutive messages into
  * ~`splitBytes` tasks, and each executor task positioned-reads
  * EXACTLY its byte range. A 100 GB multi-message archive therefore
  * fans out across the cluster instead of serializing on one
  * whole-file task, and no task ever materializes a file-sized
  * buffer. Every message is independently decodable (each repeats its
  * grid/representation sections), so message granularity is the
  * natural split unit — the same design as the netCDF DSv2 source's
  * (variable × leadtime) splits.
  *
  * Output is one tidy row per (field, j scanline) — the same shape the
  * netCDF tidy scan emits, so downstream band-stats/regrid queries run
  * unchanged on GRIB inputs.
  */
object Grib2Source {

  /** Byte ranges [(offset, length)] of every message, from the
    * indicator sections alone.
    */
  def messageRanges(src: Hdf5.ByteSource): Seq[(Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long)]
    var pos = 0L
    while (pos + 16 <= src.length) {
      val hdr = src.read(pos, 16)
      require(hdr(0) == 'G' && hdr(1) == 'R' && hdr(2) == 'I' &&
        hdr(3) == 'B', s"bad GRIB magic at byte $pos")
      val total = java.nio.ByteBuffer.wrap(hdr, 8, 8)
        .order(java.nio.ByteOrder.BIG_ENDIAN).getLong
      require(total >= 16 && pos + total <= src.length,
        s"GRIB message length $total at byte $pos overruns the file")
      out += ((pos, total))
      pos += total
    }
    out.result()
  }

  def tidy(spark: SparkSession, glob: String,
           splitBytes: Long = 128L << 20): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val paths = Discovery.resolve(Seq(glob), extension = "grib2")
      .map(_.toString)
    // planning: coalesce consecutive messages into splits; each split
    // carries the file-global index of its first message so field_idx
    // stays the message ordinal regardless of the split plan
    val splits: Seq[(String, Long, Long, Int)] = paths.flatMap { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val src = new FsByteSource(hp.getFileSystem(conf), hp)
      val ranges = try messageRanges(src) finally src.close()
      val out = Seq.newBuilder[(String, Long, Long, Int)]
      var start = -1L
      var len = 0L
      var idx0 = 0
      for (((off, mlen), i) <- ranges.zipWithIndex) {
        if (start < 0) { start = off; len = 0; idx0 = i }
        len += mlen
        if (len >= splitBytes) {
          out += ((p, start, len, idx0)); start = -1
        }
      }
      if (start >= 0) out += ((p, start, len, idx0))
      out.result()
    }
    val par = math.max(1, math.min(splits.size,
      spark.sparkContext.defaultParallelism))
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    spark.createDataset(spark.sparkContext.parallelize(splits, par))
      .flatMap { case (p, off, splitLen, idx0) =>
        require(splitLen <= Int.MaxValue,
          s"GRIB split of $splitLen bytes (one message over 2 GiB?) " +
            "unsupported in a single task buffer")
        val hp = new org.apache.hadoop.fs.Path(p)
        val src = new FsByteSource(
          hp.getFileSystem(confBc.value.value), hp)
        val bytes =
          try src.read(off, splitLen.toInt)
          finally src.close()
        Grib2.read(bytes).zipWithIndex.flatMap { case (f, fi) =>
          // per-row latitude: regular grids step in degrees; Lambert
          // grids step in projected METERS, so the row anchor (cell
          // i=0) georeferences through the cone. Normalized row 0 is
          // northernmost; the file's first point maps to stored row 0,
          // which scan bit 0x40 puts at the SOUTH edge.
          val rowLat: Int => Double = f.gridType match {
            case "lambert" =>
              val lg = f.lambert.get
              val lcc = graft.functions.Geo.LambertConformal(
                lg.earthRadius, lg.e2, lg.latin1, lg.latin2, lg.laD, lg.lov)
              val (x1, y1) = lcc.forward(f.lon1, f.lat1)
              val up = (f.scanMode & 0x40) != 0 // stored south→north
              j => {
                val srcRow = if (up) f.nj - 1 - j else j
                val y = if (up) y1 + srcRow * f.dLat else y1 - srcRow * f.dLat
                lcc.inverse(x1, y)._2
              }
            case "polar" =>
              val pg = f.polar.get
              val ps = graft.functions.Geo.PolarStereo(
                pg.earthRadius, pg.e2, pg.laD, pg.lov, pg.north)
              val (x1, y1) = ps.forward(f.lon1, f.lat1)
              val up = (f.scanMode & 0x40) != 0
              j => {
                val srcRow = if (up) f.nj - 1 - j else j
                val y = if (up) y1 + srcRow * f.dLat else y1 - srcRow * f.dLat
                ps.inverse(x1, y)._2
              }
            case "mercator" =>
              val mg = f.mercator.get
              val m = graft.functions.Geo.Mercator(
                mg.earthRadius, mg.e2, mg.laD)
              val (x1, y1) = m.forward(f.lon1, f.lat1)
              val up = (f.scanMode & 0x40) != 0
              j => {
                val srcRow = if (up) f.nj - 1 - j else j
                val y = if (up) y1 + srcRow * f.dLat else y1 - srcRow * f.dLat
                m.inverse(x1, y)._2
              }
            case "spaceview" =>
              // rows anchor at the sub-satellite meridian (scan angle
              // x = 0), where every row crossing the disk has a
              // defined latitude; rows entirely off-disk emit NaN.
              // Full-image row = Yo + stored row; y = 0 at Yp either
              // scan direction, signed toward the scan's north.
              val sg = f.spaceview.get
              val geos = graft.functions.Geo.Geostationary(
                sg.lop, sg.req, sg.rpol, sg.height)
              val up = (f.scanMode & 0x40) != 0
              j => {
                val srcRow = if (up) f.nj - 1 - j else j
                val fullRow = sg.yo + srcRow
                val y = if (up) (fullRow - sg.yp) * sg.ry
                        else (sg.yp - fullRow) * sg.ry
                geos.inverse(0.0, y).map(_._2).getOrElse(Double.NaN)
              }
            case "rotated" =>
              // rows step in ROTATED degrees; the row anchor (the
              // file's first stored column, rlon1 — same convention
              // as the projected grids' x1 anchor) georeferences
              // through the rotated-pole mapping. Geographic latitude
              // varies along a rotated row, so this is explicitly the
              // anchor-column latitude.
              val rg = f.rotated.get
              val rp = graft.functions.Geo.RotatedPole(
                rg.poleLat, rg.poleLon)
              val up = (f.scanMode & 0x40) != 0
              j => {
                val srcRow = if (up) f.nj - 1 - j else j
                val rlat = if (up) f.lat1 + srcRow * f.dLat
                           else f.lat1 - srcRow * f.dLat
                rp.toGeo(f.lon1, rlat)._2
              }
            case "gaussian" =>
              // the resolved Gaussian parallels are already in
              // normalized row order (north→south)
              val lats = f.gaussLats.get
              j => lats(j)
            case _ =>
              // lat1 anchors the file's FIRST stored point: the north
              // edge under −j scan, the south edge under +j (0x40)
              val up = (f.scanMode & 0x40) != 0
              j => if (up) f.lat1 + (f.nj - 1 - j) * f.dLat
                   else f.lat1 - j * f.dLat
          }
          // reduced Gaussian grids are ragged: row bounds come from
          // the PL list's running offsets instead of a fixed ni
          val rowOff: Array[Int] =
            f.rowNi.map(_.scanLeft(0)(_ + _)).orNull
          (0 until f.nj).map { j =>
            val (s0, s1) =
              if (rowOff != null) (rowOff(j), rowOff(j + 1))
              else (j * f.ni, (j + 1) * f.ni)
            (p, idx0 + fi, f.discipline, f.category, f.parameter,
              f.refTime, f.forecastHours.getOrElse(-1),
              f.ensemble.map(_._2).getOrElse(-1),
              f.stat.map(_._1).getOrElse(-1),
              f.prob.map(_.probType).getOrElse(-1),
              f.prob.flatMap(_.threshU), j, rowLat(j),
              f.values.slice(s0, s1))
          }
        }
      }
      .toDF("path", "field_idx", "discipline", "category", "parameter",
        "ref_time", "forecast_hours", "ensemble_member", "stat_process",
        "prob_type", "prob_thresh_u", "j", "lat", "values")
  }
}
