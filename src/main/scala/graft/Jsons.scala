package graft

/** Minimal JSON string quoting shared by the artifact dumpers (Verify's
  * oracle_sql.json, the sf10 dedup leg) — one escaper, so a future
  * escaping fix cannot silently diverge between them.
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
