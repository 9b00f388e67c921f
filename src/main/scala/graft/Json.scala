package graft

import java.util.Locale

/** Minimal JSON emission helpers shared by Bench and Verify. Locale-pinned
  * number formatting (a comma-decimal default locale would emit invalid
  * JSON) and full string escaping including all control chars < 0x20.
  */
object Json {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def num(v: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(v))

  /** Full-precision double for data payloads (Locale-safe, JSON-valid). */
  def dbl(v: Double): String = {
    val s = v.toString
    if (s.contains("E")) String.format(Locale.ROOT, "%.17g", Double.box(v)) else s
  }

  def obj(fields: Iterable[(String, String)]): String =
    fields.map { case (k, v) => s"${quote(k)}:$v" }.mkString("{", ",", "}")
}
