package graft.ddl

/** Minimal DDL ADT for the statements the replay path interprets —
  * the analog of the reference's pglast-node handling, scoped to what
  * `do_ddl_change` actually replays (`replayer/connemara_replay.pl:
  * 262-350`) plus the restore-path classification
  * (`connemara_python/connemara/sqlparser/__init__.py:197-251`).
  * Everything else round-trips as [[DdlStatement.Other]] with a
  * classified command tag.
  */
object DdlAst {

  final case class QualifiedName(schema: Option[String], name: String) {
    def render: String = schema.map(s => s"$s.$name").getOrElse(name)
  }

  sealed trait DdlStatement { def raw: String }
  final case class CreateTable(raw: String, table: QualifiedName,
      columns: Seq[(String, String)], ifNotExists: Boolean,
      pkCols: Seq[String] = Seq.empty) extends DdlStatement
  final case class DropTable(raw: String, table: QualifiedName,
      ifExists: Boolean) extends DdlStatement
  final case class TruncateTable(raw: String, table: QualifiedName) extends DdlStatement
  final case class AddColumn(raw: String, table: QualifiedName,
      column: String, pgType: String, ifNotExists: Boolean) extends DdlStatement
  final case class DropColumn(raw: String, table: QualifiedName,
      column: String, ifExists: Boolean) extends DdlStatement
  final case class RenameColumn(raw: String, table: QualifiedName,
      from: String, to: String) extends DdlStatement
  final case class CreateSchema(raw: String, schema: String,
      ifNotExists: Boolean) extends DdlStatement
  final case class Other(raw: String, tag: String) extends DdlStatement

  private val ident = """(?:"([^"]+)"|([A-Za-z_][A-Za-z_0-9$]*))"""
  private val qname = s"""$ident(?:\\.$ident)?"""

  private def qn(m: List[Option[String]]): QualifiedName = {
    // groups: (q1, b1, q2, b2) — second pair present ⇒ first is schema
    val first = m(0).orElse(m(1))
    val second = m(2).orElse(m(3))
    second match {
      case Some(n) => QualifiedName(first, n)
      case None    => QualifiedName(None, first.get)
    }
  }

  private val createTableRe =
    s"""(?is)^CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?$qname\\s*\\((.*)\\)\\s*$$""".r
  private val dropTableRe =
    s"""(?is)^DROP\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?$qname\\s*(CASCADE|RESTRICT)?\\s*$$""".r
  private val truncateRe =
    s"""(?is)^TRUNCATE\\s+(?:TABLE\\s+)?(?:ONLY\\s+)?$qname.*$$""".r
  // COLUMN keyword is optional in PG; the lookahead keeps
  // ADD/DROP CONSTRAINT from parsing "CONSTRAINT" as a column name
  private val addColRe =
    s"""(?is)^ALTER\\s+TABLE\\s+(?:ONLY\\s+)?$qname\\s+ADD\\s+(?!CONSTRAINT\\b)(?:COLUMN\\s+)?(IF\\s+NOT\\s+EXISTS\\s+)?$ident\\s+(.+?)\\s*$$""".r
  private val dropColRe =
    s"""(?is)^ALTER\\s+TABLE\\s+(?:ONLY\\s+)?$qname\\s+DROP\\s+(?!CONSTRAINT\\b)(?:COLUMN\\s+)?(IF\\s+EXISTS\\s+)?$ident\\s*(CASCADE|RESTRICT)?\\s*$$""".r
  private val renameColRe =
    s"""(?is)^ALTER\\s+TABLE\\s+(?:ONLY\\s+)?$qname\\s+RENAME\\s+(?:COLUMN\\s+)?$ident\\s+TO\\s+$ident\\s*$$""".r
  private val createSchemaRe =
    s"""(?is)^CREATE\\s+SCHEMA\\s+(IF\\s+NOT\\s+EXISTS\\s+)?$ident\\s*$$""".r
  private val tagRe = """(?is)^\s*([A-Za-z]+(?:\s+[A-Za-z]+)?)""".r

  private val trailingConstraintRe =
    """(?is)\s+(NOT\s+NULL|NULL|DEFAULT\s+.+|PRIMARY\s+KEY|UNIQUE|REFERENCES\s+.+|CHECK\s*\(.+\)|GENERATED\s+.+|COLLATE\s+\S+)$""".r

  /** Strip ALL trailing column constraints from a type string —
    * `int NOT NULL DEFAULT 5` has two, and a single anchored replace
    * leaves `int NOT NULL`, which the type mapper would silently turn
    * into StringType. Iterate to a fixpoint.
    */
  private def stripColumnConstraints(typ: String): String = {
    var cur = typ.trim
    var prev = ""
    while (cur != prev) {
      prev = cur
      cur = trailingConstraintRe.replaceAllIn(cur, "").trim
    }
    cur
  }

  /** Primary-key columns from a `CREATE TABLE (...)` body: a
    * table-level `PRIMARY KEY (a, b)` clause, or an inline
    * `<col> <type> … PRIMARY KEY`. */
  private def parsePkCols(body: String): Seq[String] = {
    val tableLevel = """(?is)\bPRIMARY\s+KEY\s*\(([^)]*)\)""".r
      .findFirstMatchIn(body)
      .map(_.group(1).split(",").toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty))
    tableLevel.getOrElse {
      mutable.split(body).flatMap { p =>
        val t = p.trim
        val inline = s"""(?is)^$ident\\s+.*\\bPRIMARY\\s+KEY\\b.*$$""".r
        inline.findFirstMatchIn(t)
          .filterNot(_ => t.toUpperCase.startsWith("PRIMARY"))
          .map(m => Option(m.group(1)).getOrElse(m.group(2)))
      }
    }
  }

  /** Split a `CREATE TABLE (...)` body into (name, type) pairs,
    * respecting parens/quotes; constraint clauses are dropped.
    */
  private def parseColumns(body: String): Seq[(String, String)] = {
    val parts = mutable.split(body)
    parts.flatMap { p =>
      val t = p.trim
      val isConstraint = """(?i)^(PRIMARY|UNIQUE|CONSTRAINT|FOREIGN|CHECK|EXCLUDE|LIKE)\b""".r
        .findFirstIn(t).isDefined
      if (t.isEmpty || isConstraint) None
      else {
        val m = s"""(?s)^$ident\\s+(.+)$$""".r.findFirstMatchIn(t)
        m.map { mm =>
          val name = Option(mm.group(1)).getOrElse(mm.group(2))
          (name, stripColumnConstraints(mm.group(3)))
        }
      }
    }
  }

  private object mutable {
    /** comma-split at paren/quote depth 0 */
    def split(s: String): Seq[String] = {
      val out = scala.collection.mutable.Buffer.empty[String]
      val cur = new StringBuilder
      var depth = 0; var inq = false
      s.foreach {
        case '\'' => inq = !inq; cur.append('\'')
        case '(' if !inq => depth += 1; cur.append('(')
        case ')' if !inq => depth -= 1; cur.append(')')
        case ',' if !inq && depth == 0 => out += cur.toString; cur.clear()
        case c => cur.append(c)
      }
      if (cur.nonEmpty) out += cur.toString
      out.toSeq
    }
  }

  def parse(sql: String): DdlStatement = {
    val s = sql.trim.stripSuffix(";").trim
    s match {
      case createTableRe(ine, q1, b1, q2, b2, body) =>
        CreateTable(s, qn(List(Option(q1), Option(b1), Option(q2), Option(b2))),
          parseColumns(body), ine != null, parsePkCols(body))
      case dropTableRe(ife, q1, b1, q2, b2, _) =>
        DropTable(s, qn(List(Option(q1), Option(b1), Option(q2), Option(b2))), ife != null)
      case addColRe(q1, b1, q2, b2, ine, cq, cb, typ) =>
        AddColumn(s, qn(List(Option(q1), Option(b1), Option(q2), Option(b2))),
          Option(cq).getOrElse(cb), stripColumnConstraints(typ), ine != null)
      case dropColRe(q1, b1, q2, b2, ife, cq, cb, _) =>
        DropColumn(s, qn(List(Option(q1), Option(b1), Option(q2), Option(b2))),
          Option(cq).getOrElse(cb), ife != null)
      case renameColRe(q1, b1, q2, b2, fq, fb, tq, tb) =>
        RenameColumn(s, qn(List(Option(q1), Option(b1), Option(q2), Option(b2))),
          Option(fq).getOrElse(fb), Option(tq).getOrElse(tb))
      case truncateRe(q1, b1, q2, b2) =>
        TruncateTable(s, qn(List(Option(q1), Option(b1), Option(q2), Option(b2))))
      case createSchemaRe(ine, sq, sb) =>
        CreateSchema(s, Option(sq).getOrElse(sb), ine != null)
      case _ =>
        Other(s, tagRe.findFirstMatchIn(s).map(_.group(1).toUpperCase).getOrElse(""))
    }
  }
}
