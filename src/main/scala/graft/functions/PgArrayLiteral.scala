package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PG text-array literal parsing (F10): `{a,"b c",NULL}` → list.
  * The reference unpacks `command_tags` this way
  * (`replayer/connemara_replay.pl:302-309`).
  */
object PgArrayLiteral {

  /** Driver-side parse with full quote/escape handling. */
  def parse(s: String): Seq[Option[String]] = {
    val body = s.trim.stripPrefix("{").stripSuffix("}")
    if (body.isEmpty) return Seq.empty
    val out = mutable.Buffer.empty[Option[String]]
    val cur = new StringBuilder
    var inq = false; var quoted = false; var i = 0
    def flush(): Unit = {
      val v = cur.toString
      out += (if (!quoted && v.equalsIgnoreCase("NULL")) None else Some(v))
      cur.clear(); quoted = false
    }
    while (i < body.length) {
      val c = body.charAt(i)
      if (inq) {
        if (c == '\\' && i + 1 < body.length) { cur.append(body.charAt(i + 1)); i += 2 }
        else if (c == '"') { inq = false; i += 1 }
        else { cur.append(c); i += 1 }
      } else c match {
        case '"' => inq = true; quoted = true; i += 1
        case ',' => flush(); i += 1
        case _   => cur.append(c); i += 1
      }
    }
    flush()
    out.toSeq
  }

  /** Column-level parse (data plane, codegen'd built-ins): quoted or
    * bare elements; `\"`/`\\` escapes unwrapped; bare NULL → null.
    */
  def parseCol(c: Column): Column = {
    val items = regexp_extract_all(
      c, lit("\"(?:[^\"\\\\]|\\\\.)*\"|[^,{}]+"), lit(0))
    transform(items, item => {
      val isQuoted = item.startsWith("\"")
      // strip the trailing quote BEFORE unescaping, so a value ending
      // in an escaped quote survives
      val unquoted = regexp_replace(
        regexp_replace(substring(item, 2, Int.MaxValue - 2), "\"$", ""),
        "\\\\(.)", "$1")
      when(isQuoted, unquoted)
        .when(upper(item) === "NULL", lit(null))
        .otherwise(item)
    })
  }
}
