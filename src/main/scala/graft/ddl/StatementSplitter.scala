package graft.ddl

import scala.collection.mutable

/** SQL script → statement splitter: a Scala re-expression of the
  * reference's state machine (`connemara_python/connemara/sqlparser/
  * parser.py:53-267`): plain / single-quoted literal / line comment /
  * nested block comment / dollar-quoted string; statements end at a
  * top-level `;`. psql `\…` meta-commands (a line starting with a
  * backslash) are dropped, as the reference does.
  */
object StatementSplitter {

  private sealed trait Mode
  private case object Plain extends Mode
  private case class Literal(eString: Boolean) extends Mode
  private case object LineComment extends Mode
  private case class BlockComment(depth: Int) extends Mode
  private case class DollarQuote(tag: String) extends Mode

  private val dollarTag = """\$[A-Za-z_0-9]*\$""".r

  def split(script: String): Seq[String] = {
    val out = mutable.Buffer.empty[String]
    val cur = new StringBuilder
    var mode: Mode = Plain
    var i = 0
    val n = script.length

    def startsWith(s: String) = script.regionMatches(i, s, 0, s.length)

    def flush(): Unit = {
      val stmt = cur.toString.trim
      if (stmt.nonEmpty) out += stmt
      cur.clear()
    }

    while (i < n) {
      val c = script.charAt(i)
      mode match {
        case Plain =>
          if (startsWith("--")) { mode = LineComment; i += 2 }
          else if (startsWith("/*")) { mode = BlockComment(1); i += 2 }
          else if (c == '\'') {
            // E'...' strings honor backslash escapes (standard
            // literals treat backslash as a plain character)
            val eStr = cur.nonEmpty &&
              (cur.last == 'E' || cur.last == 'e') &&
              (cur.length == 1 || {
                val p = cur.charAt(cur.length - 2)
                !Character.isLetterOrDigit(p) && p != '_'
              })
            mode = Literal(eStr); cur.append(c); i += 1
          }
          else if (c == '$') {
            dollarTag.findPrefixOf(script.substring(i)) match {
              case Some(tag) => mode = DollarQuote(tag); cur.append(tag); i += tag.length
              case None => cur.append(c); i += 1
            }
          } else if (c == '\\' && (cur.isEmpty || cur.last == '\n')) {
            // psql meta-command: skip to end of line
            while (i < n && script.charAt(i) != '\n') i += 1
          } else if (c == ';') { flush(); i += 1 }
          else { cur.append(c); i += 1 }

        case Literal(eStr) =>
          if (eStr && c == '\\' && i + 1 < n) {
            // backslash escape inside E'...': next char (incl. a
            // quote) stays inside the literal
            cur.append(c).append(script.charAt(i + 1)); i += 2
          } else if (c == '\'' && i + 1 < n && script.charAt(i + 1) == '\'') {
            cur.append("''"); i += 2 // escaped quote stays inside
          } else if (c == '\'') { mode = Plain; cur.append(c); i += 1 }
          else { cur.append(c); i += 1 }

        // comments are stripped, each replaced by one space — keeping
        // them glues tokens ("t--x\nRENAME" → "tRENAME") or leaves
        // inline noise the DDL regexes can't parse
        case LineComment =>
          if (c == '\n') { mode = Plain; cur.append(' ') }
          i += 1

        case BlockComment(d) =>
          if (startsWith("/*")) { mode = BlockComment(d + 1); i += 2 }
          else if (startsWith("*/")) {
            mode = if (d == 1) Plain else BlockComment(d - 1)
            if (d == 1) cur.append(' ')
            i += 2
          } else i += 1

        case DollarQuote(tag) =>
          if (startsWith(tag)) { mode = Plain; cur.append(tag); i += tag.length }
          else { cur.append(c); i += 1 }
      }
    }
    flush()
    out.toSeq
  }
}
