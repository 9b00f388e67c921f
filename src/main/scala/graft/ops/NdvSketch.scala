package graft.ops

import java.nio.ByteBuffer
import java.util.Base64

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.KmvState

/** Per-file NDV (distinct-count) sketches riding the manifest — the
  * column-level statistics plane the optimizer was blind to: the scan
  * already reports exact bytes/rows post-pruning, but join planning
  * beyond broadcast-by-size needs DISTINCT counts (an equality filter's
  * selectivity is 1/NDV under CBO). Each file carries a tiny KMV
  * sketch ([[graft.functions.KmvState]], Bar-Yossef et al. 2002) of
  * each declared stats column; sketches are MERGEABLE, so a scan unions
  * exactly its surviving files' sketches and serves the NDV of what
  * will actually be read — a pruned slice of a 100 TB table gets the
  * slice's cardinality, not the table's.
  *
  * Size discipline: k=32 longs ≈ 260 B base64 per (file × column) —
  * manifest segments amortize it and commits stay O(Δ) (only new
  * files' sketches are written). The sketch hash must agree between
  * the two producers (the batch-reading aggregate and the writer-task
  * tracker), so both hash ONE canonical string per value, defined
  * here: the [[TypedBounds]] physical key in decimal (epoch days for
  * DATE, epoch micros for TIMESTAMP, the integer itself for
  * integrals) and the string itself for STRING. Float/double/boolean
  * columns carry no sketch (equality selectivity on floats is a
  * correctness trap; boolean NDV is ≤2 and useless) — their entries
  * are "" = unknown, which consumers treat as "serve nothing".
  */
object NdvSketch {

  /** Sketch capacity: bounded state per (file × column). 32 gives
    * ~18% standard error — plenty for broadcast/CBO decisions, which
    * act on order-of-magnitude differences.
    */
  def kOf(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("spark.graft.stats.ndvK").map(_.toInt)
      .getOrElse(32)

  /** Canonical STRING form of a column for sketch hashing, by
    * [[TypedBounds]] dtype. None = this dtype carries no sketch.
    * MUST mirror [[hashPhysical]] exactly — a drift makes the two
    * write paths' sketches disagree and the merged estimate silently
    * wrong, so both sides reduce to the same decimal/UTF-8 text.
    */
  def canonColumn(dtype: String, name: String): Option[Column] =
    dtype match {
      case "string" => Some(col(name))
      case "int" | "long" => Some(col(name).cast("string"))
      case "date" => Some(
        datediff(col(name), to_date(lit("1970-01-01"))).cast("string"))
      case "timestamp" => Some(unix_micros(col(name)).cast("string"))
      case d if TypedBounds.isDecimal(d) =>
        // unscaled long text (p ≤ 18 ⇒ exact): the same canonical
        // form the bounds/bloom planes use, and the writer-task twin
        // ([[hashPhysical]]) hashes the identical long text
        val s = TypedBounds.decimalOf(d).get._2
        Some((col(name) * lit(TypedBounds.pow10(s))).cast("long")
          .cast("string"))
      case _ => None
    }

  /** Writer-task twin of [[canonColumn]]: hash of one PHYSICAL value
    * as the writer sees it (Long for int/long/date-days/timestamp-
    * micros — the writer widens ints; UTF8String for string).
    */
  def hashPhysical(v: Any): Long = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => KmvState.hash60(s)
    case l: Long => KmvState.hash60(
      org.apache.spark.unsafe.types.UTF8String.fromString(l.toString))
    case other => throw new IllegalArgumentException(
      s"no canonical sketch hash for ${other.getClass.getName}")
  }

  /** Whether a dtype participates in NDV sketching at all. */
  def sketchable(dtype: String): Boolean = dtype match {
    case "string" | "int" | "long" | "date" | "timestamp" => true
    case d if TypedBounds.isDecimal(d) => true
    case _ => false
  }

  /** Encode ascending minima (≤ k of them) into the manifest string —
    * [[KmvState.serialize]]'s exact byte layout, base64. An EMPTY
    * sketch is a valid exact statement ("this file holds no non-null
    * values of the column"), distinct from "" = unknown.
    */
  def encode(k: Int, mins: Seq[Long]): String = {
    val buf = ByteBuffer.allocate(8 + mins.length * 8)
    buf.putInt(k); buf.putInt(mins.length)
    mins.foreach(buf.putLong)
    Base64.getEncoder.encodeToString(buf.array())
  }

  def encodeState(st: KmvState): String = {
    val it = st.set.iterator()
    val b = Seq.newBuilder[Long]
    while (it.hasNext) b += it.next().longValue()
    encode(st.k, b.result())
  }

  def decode(s: String): KmvState =
    KmvState.deserialize(Base64.getDecoder.decode(s))

  /** Merged NDV estimate over a set of per-file sketch encodings.
    * None when ANY entry is unknown ("") — a partial union would
    * UNDERestimate the distinct count and mislead the optimizer the
    * dangerous way (overconfident selectivity). Merging into the
    * smallest k present is exact KMV semantics (the k' smallest of a
    * union are computable from each side's k' smallest, k' ≤ min k).
    */
  def mergeEstimate(encs: Seq[String]): Option[Long] = {
    if (encs.isEmpty || encs.exists(_.isEmpty)) return None
    val states = encs.map(decode)
    val acc = new KmvState(states.map(_.k).min)
    states.foreach(acc.mergeIn)
    Some(acc.estimate._1)
  }
}
