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
    /** SQL-valid rendering: parts that aren't plain identifiers get
      * double-quoted (synthesized sub-statements must reparse). */
    def renderSql: String = {
      def q(p: String) =
        if (p.matches("[A-Za-z_][A-Za-z_0-9$]*")) p else "\"" + p + "\""
      schema.map(s => s"${q(s)}.${q(name)}").getOrElse(q(name))
    }
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
  final case class RenameTable(raw: String, table: QualifiedName,
      to: String) extends DdlStatement
  final case class AlterColumnType(raw: String, table: QualifiedName,
      column: String, pgType: String) extends DdlStatement
  final case class CreateSchema(raw: String, schema: String,
      ifNotExists: Boolean) extends DdlStatement
  /** One SQL statement carrying several sub-statements (multi-action
    * ALTER TABLE, multi-table TRUNCATE/DROP). The interpreter
    * classifies and applies each part independently. */
  final case class Multi(raw: String, parts: Seq[DdlStatement]) extends DdlStatement
  final case class Other(raw: String, tag: String) extends DdlStatement

  /** `CREATE TYPE … AS ENUM (…)` — basebackup keeps and remaps the
    * type name (`connemara_python/connemara/sqlparser/remappers.py:
    * 258-266`); the data plane maps enum columns to StringType. */
  final case class CreateEnum(raw: String, typeName: QualifiedName,
      labels: Seq[String]) extends DdlStatement
  final case class CreateSequence(raw: String, sequence: QualifiedName,
      ifNotExists: Boolean) extends DdlStatement
  /** `ALTER SEQUENCE … [OWNED BY table.column]` — the owner's table
    * part remaps with the sequence (`remappers.py:316-326`). */
  final case class AlterSequence(raw: String, sequence: QualifiedName,
      ownedBy: Option[(QualifiedName, String)]) extends DdlStatement
  /** `CREATE [OR REPLACE] FUNCTION` — basebackup keeps it, remapping
    * the name and (for LANGUAGE sql) re-splitting and remapping the
    * statements inside the body (`remappers.py:355-377`); replay
    * skips functions entirely (`replayer/connemara_rewrite.pm:77-80`).
    * Spans index into `raw` so [[render]] can rebuild the SQL after a
    * remap rewrites `name`/`body`. */
  final case class CreateFunction(raw: String, name: QualifiedName,
      language: String, body: String,
      nameSpan: (Int, Int), bodySpan: (Int, Int),
      orReplace: Boolean) extends DdlStatement {
    /** The statement with the (possibly remapped) name and body
      * substituted back into the original text. */
    def render: String =
      raw.substring(0, nameSpan._1) + name.renderSql +
        raw.substring(nameSpan._2, bodySpan._1) + body +
        raw.substring(bodySpan._2)
  }

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

  // constraint-introducing keywords after ADD that are NOT column
  // names — 'ADD PRIMARY KEY (id)' must not become a phantom column
  private val constraintKw = """(?:CONSTRAINT|PRIMARY|UNIQUE|FOREIGN|CHECK|EXCLUDE)"""

  private val createTableHeadRe =
    s"""(?is)^CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?$qname\\s*\\(""".r
  private val dropTableRe =
    s"""(?is)^DROP\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?(.+?)\\s*(CASCADE|RESTRICT)?\\s*$$""".r
  private val truncateRe =
    """(?is)^TRUNCATE\s+(?:TABLE\s+)?(.+?)\s*(?:(?:RESTART|CONTINUE)\s+IDENTITY)?\s*(?:CASCADE|RESTRICT)?\s*$""".r
  private val alterHeadRe =
    s"""(?is)^ALTER\\s+TABLE\\s+(?:ONLY\\s+)?$qname\\s+(.+)$$""".r
  private val addColActRe =
    s"""(?is)^ADD\\s+(?!$constraintKw\\b)(?:COLUMN\\s+)?(IF\\s+NOT\\s+EXISTS\\s+)?$ident\\s+(.+?)\\s*$$""".r
  private val dropColActRe =
    s"""(?is)^DROP\\s+(?!CONSTRAINT\\b)(?:COLUMN\\s+)?(IF\\s+EXISTS\\s+)?$ident\\s*(CASCADE|RESTRICT)?\\s*$$""".r
  private val renameTableActRe =
    s"""(?is)^RENAME\\s+TO\\s+$ident\\s*$$""".r
  private val renameColActRe =
    s"""(?is)^RENAME\\s+(?:COLUMN\\s+)?$ident\\s+TO\\s+$ident\\s*$$""".r
  private val alterTypeActRe =
    s"""(?is)^ALTER\\s+(?:COLUMN\\s+)?$ident\\s+(?:SET\\s+DATA\\s+)?TYPE\\s+(.+?)(?:\\s+USING\\s+.*)?\\s*$$""".r
  private val qnameOnlyRe = s"""(?is)^(?:ONLY\\s+)?$qname\\s*$$""".r
  private val createSchemaRe =
    s"""(?is)^CREATE\\s+SCHEMA\\s+(IF\\s+NOT\\s+EXISTS\\s+)?$ident\\s*$$""".r
  private val createEnumRe =
    s"""(?is)^CREATE\\s+TYPE\\s+$qname\\s+AS\\s+ENUM\\s*\\(""".r
  private val createSeqRe =
    s"""(?is)^CREATE\\s+SEQUENCE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?$qname(\\s.*)?$$""".r
  private val alterSeqRe =
    s"""(?is)^ALTER\\s+SEQUENCE\\s+(?:IF\\s+EXISTS\\s+)?$qname(\\s.*)?$$""".r
  private val ownedByRe =
    s"""(?is)\\bOWNED\\s+BY\\s+($ident(?:\\.$ident){1,2})""".r
  private val createFunctionHeadRe =
    s"""(?is)^CREATE\\s+(OR\\s+REPLACE\\s+)?FUNCTION\\s+($qname)""".r
  private val languageRe = """(?is)\bLANGUAGE\s+'?([A-Za-z_][A-Za-z_0-9]*)'?""".r
  private val dollarTagRe = """(?is)\bAS\s+(\$[A-Za-z_0-9]*\$)""".r
  private val quotedBodyRe = """(?s)\b[Aa][Ss]\s+'""".r
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
      splitTopLevel(body).flatMap { p =>
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
    val parts = splitTopLevel(body)
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

  /** comma-split at paren/quote depth 0 */
  private def splitTopLevel(s: String): Seq[String] = {
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

  /** The balanced `(...)` body starting at `open` (index of the
    * opening paren), quote-aware. Returns the inside, WITHOUT the
    * parens — the regex alternative (`\\((.*)\\)$`) either corrupts
    * the last column when trailing clauses follow (WITH / PARTITION
    * BY / INHERITS carry their own parens) or rejects clauses without
    * one (TABLESPACE). */
  private def balancedBody(s: String, open: Int): Option[String] = {
    var depth = 0; var inq = false; var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (inq) { if (c == '\'') inq = false }
      else c match {
        case '\'' => inq = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return Some(s.substring(open + 1, i))
        case _ => ()
      }
      i += 1
    }
    None
  }

  private def parseQname(part: String): Option[QualifiedName] =
    qnameOnlyRe.findFirstMatchIn(part.trim).map(m =>
      qn(List(Option(m.group(1)), Option(m.group(2)),
        Option(m.group(3)), Option(m.group(4)))))

  private def oneOrMulti(raw: String, parts: Seq[DdlStatement]): DdlStatement =
    parts match {
      case Seq(single) => single
      case Seq()       => Other(raw, tagOf(raw))
      case many        => Multi(raw, many)
    }

  private def tagOf(s: String): String =
    tagRe.findFirstMatchIn(s).map(_.group(1).toUpperCase).getOrElse("")

  private def parseAlterAction(raw: String, table: QualifiedName,
                               action: String): DdlStatement =
    action.trim match {
      case addColActRe(ine, cq, cb, typ) =>
        AddColumn(raw, table, Option(cq).getOrElse(cb),
          stripColumnConstraints(typ), ine != null)
      case dropColActRe(ife, cq, cb, _) =>
        DropColumn(raw, table, Option(cq).getOrElse(cb), ife != null)
      case renameTableActRe(tq, tb) =>
        RenameTable(raw, table, Option(tq).getOrElse(tb))
      case renameColActRe(fq, fb, tq, tb) =>
        RenameColumn(raw, table, Option(fq).getOrElse(fb), Option(tq).getOrElse(tb))
      case alterTypeActRe(cq, cb, typ) =>
        AlterColumnType(raw, table, Option(cq).getOrElse(cb),
          stripColumnConstraints(typ))
      case _ => Other(raw, "ALTER TABLE")
    }

  /** CREATE FUNCTION: locate name span and body span in `s`. The body
    * is the first dollar-quoted or single-quoted literal after `AS`
    * (dollar-quote nesting per the splitter's automaton is unneeded:
    * the OUTER tag pair delimits the body verbatim). */
  private def parseCreateFunction(s: String): Option[CreateFunction] =
    createFunctionHeadRe.findFirstMatchIn(s).flatMap { h =>
      val name = qn(List(Option(h.group(3)), Option(h.group(4)),
        Option(h.group(5)), Option(h.group(6))))
      val nameSpan = (h.start(2), h.end(2))
      val dollar = dollarTagRe.findFirstMatchIn(s).flatMap { m =>
        val tag = m.group(1)
        val bodyStart = m.end
        val close = s.indexOf(tag, bodyStart)
        if (close < 0) None
        else Some((s.substring(bodyStart, close), (bodyStart, close)))
      }
      val body = dollar.orElse {
        quotedBodyRe.findFirstMatchIn(s).flatMap { m =>
          // single-quoted body with '' escapes: walk to the real close
          var i = m.end; var end = -1
          while (end < 0 && i < s.length) {
            if (s.charAt(i) == '\'') {
              if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2
              else end = i
            } else i += 1
          }
          if (end < 0) None
          else Some((s.substring(m.end, end), (m.end, end)))
        }
      }
      body.map { case (b, span) =>
        // find the LANGUAGE clause OUTSIDE the body: a body that
        // itself contains the word (e.g. EXECUTE 'CREATE FUNCTION …
        // LANGUAGE sql') must not hijack the outer classification
        val langScan = s.substring(0, span._1) + s.substring(span._2)
        val language = languageRe.findFirstMatchIn(langScan)
          .map(_.group(1)).getOrElse("sql")
        CreateFunction(s, name, language.toLowerCase, b, nameSpan, span,
          h.group(1) != null)
      }
    }

  def parse(sql: String): DdlStatement = {
    val s = sql.trim.stripSuffix(";").trim

    createFunctionHeadRe.findFirstMatchIn(s) match {
      case Some(_) =>
        return parseCreateFunction(s).getOrElse(Other(s, tagOf(s)))
      case None => ()
    }

    createEnumRe.findFirstMatchIn(s) match {
      case Some(m) =>
        return balancedBody(s, m.end - 1) match {
          case Some(body) =>
            val labels = splitTopLevel(body).map(_.trim)
              .filter(_.nonEmpty)
              .map(_.stripPrefix("'").stripSuffix("'").replace("''", "'"))
            CreateEnum(s,
              qn(List(Option(m.group(1)), Option(m.group(2)),
                Option(m.group(3)), Option(m.group(4)))), labels)
          case None => Other(s, tagOf(s))
        }
      case None => ()
    }

    createTableHeadRe.findFirstMatchIn(s) match {
      case Some(m) =>
        return balancedBody(s, m.end - 1) match {
          case Some(body) =>
            CreateTable(s,
              qn(List(Option(m.group(2)), Option(m.group(3)),
                Option(m.group(4)), Option(m.group(5)))),
              parseColumns(body), m.group(1) != null, parsePkCols(body))
          case None => Other(s, tagOf(s))
        }
      case None => ()
    }

    s match {
      case alterHeadRe(q1, b1, q2, b2, tail) =>
        val table = qn(List(Option(q1), Option(b1), Option(q2), Option(b2)))
        // multi-action ALTER TABLE: split on top-level commas, parse
        // each action; sub-raws stay addressable for post-data routing
        val actions = splitTopLevel(tail).map(_.trim).filter(_.nonEmpty)
        oneOrMulti(s, actions.map { a =>
          val subRaw = if (actions.length == 1) s
            else s"ALTER TABLE ${table.renderSql} $a"
          parseAlterAction(subRaw, table, a)
        })
      case dropTableRe(ife, list, _) =>
        // all-or-nothing: a partially-parseable name list must fall
        // through to Other (uniformly unhandled), never half-apply
        val parts = splitTopLevel(list)
        val names = parts.flatMap(parseQname)
        if (names.length != parts.length) Other(s, tagOf(s))
        else oneOrMulti(s, names.map(nm => DropTable(s, nm, ife != null)))
      case truncateRe(list) =>
        val parts = splitTopLevel(list)
        val names = parts.flatMap(parseQname)
        if (names.length != parts.length) Other(s, tagOf(s))
        else oneOrMulti(s, names.map(nm => TruncateTable(s, nm)))
      case createSchemaRe(ine, sq, sb) =>
        CreateSchema(s, Option(sq).getOrElse(sb), ine != null)
      case createSeqRe(ine, q1, b1, q2, b2, _) =>
        CreateSequence(s,
          qn(List(Option(q1), Option(b1), Option(q2), Option(b2))), ine != null)
      case alterSeqRe(q1, b1, q2, b2, tail) =>
        val ownedBy = Option(tail).flatMap(t =>
          ownedByRe.findFirstMatchIn(t).map { m =>
            // groups inside group(1): dotted ident list; re-split it
            val parts = splitDottedIdents(m.group(1))
            parts match {
              case Seq(tab, c)         => (QualifiedName(None, tab), c)
              case Seq(sch, tab, c)    => (QualifiedName(Some(sch), tab), c)
              case _                   => (QualifiedName(None, parts.head), parts.last)
            }
          })
        AlterSequence(s,
          qn(List(Option(q1), Option(b1), Option(q2), Option(b2))), ownedBy)
      case _ =>
        Other(s, tagOf(s))
    }
  }

  /** Split `a.b.c` / `"A b".c` into unquoted parts. */
  private[ddl] def splitDottedIdents(s: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    val cur = new StringBuilder
    var inq = false
    s.foreach {
      case '"' => inq = !inq
      case '.' if !inq => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }
}
