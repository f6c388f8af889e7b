package graft.util

/** Locale-proof JSON fragment formatting shared by the measurement mains
  * (Bench / Scaling). One copy, one set of edge-case rules:
  *  - fixed-point under `Locale.ROOT` — the f"" interpolator writes decimal
  *    COMMAS under a comma-decimal default locale, producing invalid JSON;
  *  - bounded precision — `Double.toString`'s 17 significant digits halve how
  *    many entries fit in a log-tail capture (a round artifact once lost a
  *    third of its queries to exactly that);
  *  - non-finite doubles render as `null` — `%.4f` would emit bare `NaN` /
  *    `Infinity`, which JSON parsers reject. */
object Json {

  def num(d: Double, decimals: Int = 4): String =
    if (d.isNaN || d.isInfinite) "null"
    else String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(d))

  /** JSON string literal: escapes backslash, quote, and all control chars. */
  def str(s: String): String = {
    val b = new StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }
}
