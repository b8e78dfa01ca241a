package graft.core

/** The one JSON string-literal escaper shared by the Verify and Bench
  * mains (they hand-roll their single JSON line to avoid dependencies).
  * Escapes backslash, quote, and ALL control chars — exception messages
  * and builder-authored SQL can embed bytes that would otherwise make
  * the driver's json.load fail and silently zero a round's results. */
object Jsonish {
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
