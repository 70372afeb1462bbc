package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PG typname → Spark DataType map (SURVEY §1.2). The reference casts
  * untyped wal2json text into `atttypid::regtype::text`
  * (`replayer/connemara_replay.pl:67-80,148`); we do the same with
  * `Column.cast`, driven by this map.
  */
object PgTypeMapper {
  private val numericRe = """(numeric|decimal)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)""".r

  def toSpark(pgType: String): DataType = pgType.toLowerCase.trim match {
    case numericRe(_, p, s) =>
      val prec = math.min(p.toInt, 38)
      DecimalType(prec, math.min(Option(s).map(_.toInt).getOrElse(0), prec))
    case t if t.startsWith("numeric") || t.startsWith("decimal") => DecimalType(38, 18)
    case "smallint" | "int2"                 => ShortType
    case "integer" | "int" | "int4" | "xid"  => IntegerType
    case "bigint" | "int8" | "pg_lsn" | "oid" => LongType
    case "real" | "float4"                   => FloatType
    case "double precision" | "float8"       => DoubleType
    case "boolean" | "bool"                  => BooleanType
    case "date"                              => DateType
    case t if t.startsWith("timestamp")      => TimestampType // µs, UTC session
    case "bytea"                             => BinaryType
    case "jsonb" | "json" | "uuid" | "name"  => StringType
    case t if t.endsWith("[]")               => ArrayType(toSpark(t.dropRight(2)))
    case _                                   => StringType // text, varchar, enums, …
  }

  /** Cast one wal2json text value into its target Spark type —
    * the `(payload#>>'{columnvalues,i}')::<coltype>` of
    * `replayer/connemara_replay.pl:133-156`. bytea arrives in PG hex
    * form `\x48656c6c6f` — the `\x` prefix must be stripped before
    * decoding (`unhex` would otherwise return NULL for EVERY value,
    * silently nulling all binary columns); bare hex also accepted.
    */
  def castFromText(c: Column, dt: DataType): Column = dt match {
    case BinaryType => unhex(regexp_replace(c, "^\\\\x", ""))
    case other      => c.cast(other)
  }
}

/** pg_lsn rendering: uint64 ↔ `%X/%X`
  * (`connemara_replication/src/connemara_replication.c:207-215,806-808`).
  */
object LsnCodec {
  /** `"16/B374D848"` → 0x16B374D848 */
  def parse(s: String): Long = {
    val Array(hi, lo) = s.split("/", 2)
    (java.lang.Long.parseLong(hi, 16) << 32) | java.lang.Long.parseLong(lo, 16)
  }
  def format(lsn: Long): String =
    f"${lsn >>> 32}%X/${lsn & 0xFFFFFFFFL}%X"

  /** Column-level versions (F13) for data-plane use. */
  def parseCol(c: Column): Column = {
    val parts = split(c, "/")
    shiftleft(conv(element_at(parts, 1), 16, 10).cast(LongType), 32)
      .bitwiseOR(conv(element_at(parts, 2), 16, 10).cast(LongType))
  }
  def formatCol(c: Column): Column =
    concat(
      upper(hex(shiftrightunsigned(c, 32))),
      lit("/"),
      upper(hex(c.bitwiseAND(lit(0xFFFFFFFFL)))))
}
