package graft

import java.util.Locale

/** Minimal JSON emission helpers shared by Bench and Verify. Locale-pinned
  * number formatting (a comma-decimal default locale would emit invalid
  * JSON) and full string escaping including all control chars < 0x20.
  */
object Json {
  def quote(s: String): String = {
    // fast path: nothing to escape (file paths, encoded bounds,
    // base64 sketches — virtually every manifest string). The
    // per-char flatMap below allocates per character, and segment
    // writes quote tens of thousands of strings per commit — the
    // scan-then-concat keeps that O(bytes) with two allocations.
    var i = 0
    val n = s.length
    var clean = true
    while (clean && i < n) {
      val c = s.charAt(i)
      if (c == '"' || c == '\\' || c < ' ') clean = false
      i += 1
    }
    if (clean) {
      val sb = new java.lang.StringBuilder(n + 2)
      sb.append('"').append(s).append('"').toString
    } else "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  }

  /** [[quote]] appended straight into `sb` — zero per-string
    * allocations on the clean path. Large segment renders quote tens
    * of thousands of strings; building each quoted string separately
    * doubles the copies.
    */
  def appendQuoted(sb: java.lang.StringBuilder, s: String): Unit = {
    var i = 0
    val n = s.length
    var clean = true
    while (clean && i < n) {
      val c = s.charAt(i)
      if (c == '"' || c == '\\' || c < ' ') clean = false
      i += 1
    }
    if (clean) sb.append('"').append(s).append('"')
    else sb.append(quote(s))
  }

  def num(v: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(v))

  /** Full-precision double for data payloads (Locale-safe, JSON-valid). */
  def dbl(v: Double): String = {
    val s = v.toString
    if (s.contains("E")) String.format(Locale.ROOT, "%.17g", Double.box(v)) else s
  }

  def obj(fields: Iterable[(String, String)]): String =
    fields.map { case (k, v) => s"${quote(k)}:$v" }.mkString("{", ",", "}")
}
