package graft.core

/** The one JSON string escaper (Bench's archive line and Verify's
  * oracle_sql.json both hand-build JSON): backslash, quote, and ALL
  * control chars < 0x20 — a stray tab or CR in builder-authored SQL
  * or a gate tag would otherwise invalidate the whole document.
  */
object JsonText {
  def escape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
