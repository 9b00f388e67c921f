package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** AVI (RIFF) container codec for MJPEG video, pure JVM — retires the
  * video-decode stub for the one mainstream video format whose frames
  * need no native codec: Motion-JPEG stores each frame as a standalone
  * JPEG, which javax.imageio decodes. Implemented from the public
  * RIFF/AVI container layout (avih/strh/strf headers, movi chunk list).
  *
  * Reader: walks the chunk tree, requires a 'vids' stream whose handler
  * or bitmap compression is MJPG, collects the '..dc'/'..db' frame
  * payloads in order, and carries frame timing from the main header.
  * Non-MJPEG AVIs and other containers return None so callers can fall
  * back. Writer emits a minimal valid MJPEG AVI for fixtures and the
  * re-encode leg.
  */
object Avi {

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

  def decode(bytes: Array[Byte]): Option[VideoFrames] = {
    if (!isAvi(bytes)) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var width = 0; var height = 0
    var usPerFrame = 0L
    // streams are numbered by strl order; frame chunks carry the stream
    // index as a 2-digit prefix ('00dc'), so a second stream's frames
    // must not interleave into the MJPEG list
    var streamIdx = -1
    var mjpegStream = -1
    val spansByStream =
      scala.collection.mutable.Map[Int, scala.collection.mutable.Builder[
        (Int, Int), IndexedSeq[(Int, Int)]]]()

    def fourcc(): String = {
      val f = new Array[Byte](4); b.get(f)
      new String(f, java.nio.charset.StandardCharsets.US_ASCII)
    }

    def walk(end: Int): Unit =
      while (b.position() + 8 <= end) {
        val id = fourcc()
        val size = b.getInt()
        val start = b.position()
        id match {
          case "LIST" =>
            fourcc() // list type (hdrl/strl/movi/...)
            walk(start + size)
          case "avih" =>
            usPerFrame = b.getInt().toLong & 0xFFFFFFFFL
            b.position(start + 32)
            width = b.getInt(); height = b.getInt()
          case "strh" =>
            streamIdx += 1
            val fccType = fourcc()
            val handler = fourcc()
            if (mjpegStream < 0 && fccType == "vids" &&
                handler.equalsIgnoreCase("MJPG"))
              mjpegStream = streamIdx
          case "strf" =>
            // belongs to the most recent strh (same strl list)
            if (size >= 40 && mjpegStream < 0 && streamIdx >= 0) {
              b.position(start + 16)
              val compression = fourcc()
              if (compression.equalsIgnoreCase("MJPG")) mjpegStream = streamIdx
            }
          case c if c.length == 4 && (c.endsWith("dc") || c.endsWith("db")) &&
              c.take(2).forall(_.isDigit) =>
            spansByStream.getOrElseUpdate(c.take(2).toInt,
              IndexedSeq.newBuilder[(Int, Int)]) += ((start, size))
          case _ => ()
        }
        // chunks are word-aligned: odd sizes carry a pad byte
        b.position(math.min(start + size + (size & 1), bytes.length))
      }

    b.position(12) // past "RIFF" + size + "AVI "
    walk(bytes.length)
    val fs = if (mjpegStream < 0) IndexedSeq.empty
      else spansByStream.get(mjpegStream)
        .map(_.result()).getOrElse(IndexedSeq.empty)
    if (mjpegStream < 0 || fs.isEmpty) None
    else Some(new VideoFrames(width, height, usPerFrame, bytes, fs))
  }

  /** Minimal valid single-stream MJPEG AVI from per-frame JPEG bytes. */
  def write(frames: Seq[Array[Byte]], width: Int, height: Int,
            fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    val bos = new java.io.ByteArrayOutputStream()
    val o = ByteBuffer.allocate(12 + 8 + 4 + 64 + 8 + 4 + 64 + 48 + 8 + 4 +
      frames.map(f => 8 + f.length + (f.length & 1)).sum + 64)
      .order(ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = o.put(s.getBytes("US-ASCII"))

    val usPerFrame = 1000000 / fps
    // strf: BITMAPINFOHEADER
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40); strf.putInt(width); strf.putInt(height)
    strf.putShort(1); strf.putShort(24)
    strf.put("MJPG".getBytes("US-ASCII"))
    strf.putInt(width * height * 3)
    strf.putInt(0); strf.putInt(0); strf.putInt(0); strf.putInt(0)
    // strh
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII"))
    strh.put("MJPG".getBytes("US-ASCII"))
    strh.putInt(0); strh.putShort(0); strh.putShort(0); strh.putInt(0)
    strh.putInt(1); strh.putInt(fps)       // scale, rate
    strh.putInt(0); strh.putInt(frames.length)
    strh.putInt(frames.map(_.length).max)  // suggested buffer
    strh.putInt(-1); strh.putInt(0)        // quality, sample size
    strh.putShort(0); strh.putShort(0)
    strh.putShort(width.toShort); strh.putShort(height.toShort)
    // avih
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(usPerFrame)
    avih.putInt(frames.map(_.length).max * fps)
    avih.putInt(0); avih.putInt(0)
    avih.putInt(frames.length); avih.putInt(0)
    avih.putInt(1) // one stream
    avih.putInt(frames.map(_.length).max)
    avih.putInt(width); avih.putInt(height)
    avih.putInt(0); avih.putInt(0); avih.putInt(0); avih.putInt(0)

    val strlSize = 4 + 8 + 56 + 8 + 40
    val hdrlSize = 4 + 8 + 56 + 8 + strlSize
    val moviSize = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val riffSize = 4 + 8 + hdrlSize + 8 + moviSize

    cc("RIFF"); o.putInt(riffSize); cc("AVI ")
    cc("LIST"); o.putInt(hdrlSize); cc("hdrl")
    cc("avih"); o.putInt(56); o.put(avih.array())
    cc("LIST"); o.putInt(strlSize); cc("strl")
    cc("strh"); o.putInt(56); o.put(strh.array())
    cc("strf"); o.putInt(40); o.put(strf.array())
    cc("LIST"); o.putInt(moviSize); cc("movi")
    frames.foreach { f =>
      cc("00dc"); o.putInt(f.length); o.put(f)
      if ((f.length & 1) == 1) o.put(0.toByte)
    }
    bos.write(o.array(), 0, o.position())
    bos.toByteArray
  }
}
