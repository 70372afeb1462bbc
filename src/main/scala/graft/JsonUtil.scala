package graft

/** Hand-rolled JSON string escaping shared by the driver contract
  * dump and the registry persistence — one copy, full control-char
  * coverage (a tab or CR in builder-authored SQL or a quoted PG
  * identifier would otherwise break the consumer's json parser).
  */
object JsonUtil {
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
