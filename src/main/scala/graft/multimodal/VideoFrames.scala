package graft.multimodal

/** Container-agnostic decoded video: frame timing facts + frame SPANS
  * into the original buffer — frame bytes are sliced on demand so
  * sampling k frames of an n-frame video copies k payloads, not n.
  * Produced by the pure-JVM container readers ([[Avi]], [[Mp4]]); each
  * span is a standalone JPEG (Motion-JPEG) decodable by javax.imageio.
  */
final class VideoFrames(val width: Int, val height: Int, val usPerFrame: Long,
                        bytes: Array[Byte], spans: IndexedSeq[(Int, Int)]) {
  def nFrames: Int = spans.length
  def frame(i: Int): Array[Byte] = {
    val (off, len) = spans(i)
    java.util.Arrays.copyOfRange(bytes, off, off + len)
  }
  def frames: Seq[Array[Byte]] = spans.indices.map(frame)
  def durationMs: Long = usPerFrame * nFrames / 1000
}
