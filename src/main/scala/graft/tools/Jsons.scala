package graft.tools

/** Tiny JSON string escaping shared by every hand-rolled JSON emitter
  * (Verify's oracle dump, the close-marker spool): backslash, quote, and
  * ALL control chars — a tab or CR in the payload would otherwise break
  * the consumer's json parse.
  */
object Jsons {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
