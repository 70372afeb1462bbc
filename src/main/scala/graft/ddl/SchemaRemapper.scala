package graft.ddl

import DdlAst._

/** Schema remapping — the reference lands each source database's
  * schema `s` in target schema `<dbname>_<s>`
  * (`replayer/connemara_rewrite.pm:100-111`,
  * `connemara_python/connemara/sqlparser/remappers.py`): qualified
  * names are rewritten, unqualified names resolve through the
  * search_path (whose first schema the replayer fixes to the mapped
  * one — `fix_search_path`).
  */
final class SchemaRemapper(database: String,
                           schemaMap: Map[String, String] = Map.empty) {

  /** System schemas pass through unmapped — the reference's
    * schema_map never contains them, and `remap_rangevar` leaves
    * unmapped schemas untouched (`remappers.py:337-352`). */
  private val systemSchemas = Set("pg_catalog", "information_schema", "pg_toast")

  def target(schema: String): String =
    if (systemSchemas(schema) || schema.startsWith("pg_temp")) schema
    else schemaMap.getOrElse(schema, s"${database}_$schema")

  /** Resolve a possibly-unqualified name: unqualified → first entry
    * of the (already remapped) search path, reference default
    * `public`. */
  def resolve(q: QualifiedName, searchPath: Seq[String] = Seq("public")): QualifiedName =
    q.schema match {
      case Some(s) => QualifiedName(Some(target(s)), q.name)
      case None    => QualifiedName(Some(target(searchPath.headOption.getOrElse("public"))), q.name)
    }

  /** Parse a PG `search_path` value (`"$user", public`) into its
    * usable schemas — `$user` entries are dropped, as the rewrite
    * does. */
  def parseSearchPath(sp: String): Seq[String] =
    sp.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filterNot(_.startsWith("$"))
      .filter(_.nonEmpty).toSeq

  def remap(stmt: DdlStatement, searchPath: Seq[String] = Seq("public")): DdlStatement =
    stmt match {
      case s: CreateTable   => s.copy(table = resolve(s.table, searchPath))
      case s: DropTable     => s.copy(table = resolve(s.table, searchPath))
      case s: TruncateTable => s.copy(table = resolve(s.table, searchPath))
      case s: AddColumn     => s.copy(table = resolve(s.table, searchPath))
      case s: DropColumn    => s.copy(table = resolve(s.table, searchPath))
      case s: RenameColumn  => s.copy(table = resolve(s.table, searchPath))
      case s: RenameTable   => s.copy(table = resolve(s.table, searchPath))
      case s: AlterColumnType => s.copy(table = resolve(s.table, searchPath))
      case s: Multi         => s.copy(parts = s.parts.map(remap(_, searchPath)))
      case s: CreateSchema  => s.copy(schema = target(s.schema))
      // basebackup keeps enums/sequences/functions and remaps their
      // names (`remappers.py:258-266,316-326,355-377`); replay skips
      // functions — that routing lives in DdlRules, not here
      case s: CreateEnum     => s.copy(typeName = resolve(s.typeName, searchPath))
      case s: CreateSequence => s.copy(sequence = resolve(s.sequence, searchPath))
      case s: AlterSequence  => s.copy(
        sequence = resolve(s.sequence, searchPath),
        ownedBy = s.ownedBy.map { case (t, c) => (resolve(t, searchPath), c) })
      case s: CreateFunction =>
        s.copy(
          name = resolve(s.name, searchPath),
          body =
            if (s.language == "sql") remapSqlText(s.body, searchPath)
            else s.body) // non-sql body kept verbatim (`remappers.py:374-377` warns)
      case s: Other         => s
    }

  // --- SQL-text remapping for LANGUAGE sql function bodies ---------
  // The reference re-parses the body with pglast and remaps RangeVar
  // / FuncCall / regclass-literal nodes (`remappers.py:355-377`,
  // TypeCast at `:468-493`). Without a full SQL parser the same three
  // node classes are rewritten textually: relation names after
  // FROM/JOIN/INTO/UPDATE/TABLE, schema-qualified function calls, and
  // 'schema.obj'::regclass literals. Aliased column refs (`t.col`)
  // match none of these shapes, so they survive untouched.

  private val regclassRe =
    """(?is)'([^']*)'\s*::\s*(?:pg_catalog\.)?regclass""".r
  // negative lookahead: `FROM s.f(…)` is a table FUNCTION — it remaps
  // once, in the function pass (the two passes must be disjoint or a
  // name remaps twice)
  // the ident-boundary lookahead (?![\w$]) stops backtracking from
  // shrinking the name so the no-paren lookahead can't be dodged
  private val relationRe =
    """(?is)\b(FROM|JOIN|INTO|UPDATE|TABLE)\s+("[^"]+"|[A-Za-z_][\w$]*)\.("[^"]+"|[A-Za-z_][\w$]*)(?![\w$])(?!\s*\()""".r
  // FROM-list continuation: an optional (AS) alias, a comma, the next
  // schema-qualified relation. Anchored via region+lookingAt to the
  // END of the previous relation match, so a bare `, x.y` elsewhere
  // (e.g. an aliased column ref in a SELECT list) can never match.
  private val relContRe =
    """(?is)(\s*(?:(?:AS\s+)?(?:"[^"]+"|[A-Za-z_][\w$]*))?\s*,\s*)("[^"]+"|[A-Za-z_][\w$]*)\.("[^"]+"|[A-Za-z_][\w$]*)(?![\w$])(?!\s*\()""".r
  private val funcCallRe =
    """(?is)\b("[^"]+"|[A-Za-z_][\w$]*)\.("[^"]+"|[A-Za-z_][\w$]*)\s*\(""".r

  /** Remap a schema token, PRESERVING its quoting: a quoted source
    * schema yields a quoted target (`"My Schema"` → `"db_My Schema"`)
    * — stripping the quotes would render invalid SQL for any schema
    * that needed them. */
  private def targetTok(tok: String): String =
    if (tok.startsWith("\""))
      "\"" + target(tok.stripPrefix("\"").stripSuffix("\"")) + "\""
    else target(tok)

  /** Relation pass over a SQL body: rewrites the relation after each
    * FROM/JOIN/INTO/UPDATE/TABLE *and* every comma-continued relation
    * of the same FROM list (`FROM public.a x, public.b y`). */
  private def remapRelations(sql: String): String = {
    val out = new java.lang.StringBuilder
    val m = relationRe.pattern.matcher(sql)
    val cont = relContRe.pattern.matcher(sql)
    var last = 0
    while (m.find(last)) {
      out.append(sql, last, m.start)
      out.append(s"${m.group(1)} ${targetTok(m.group(2))}.${m.group(3)}")
      var pos = m.end
      var going = true
      while (going) {
        cont.region(pos, sql.length)
        if (cont.lookingAt()) {
          out.append(cont.group(1))
          out.append(s"${targetTok(cont.group(2))}.${cont.group(3)}")
          pos = cont.end
        } else going = false
      }
      last = pos
    }
    out.append(sql, last, sql.length)
    out.toString
  }

  /** Rewrite the schema of a `'schema.obj'` (or unqualified `'obj'`)
    * literal string, the `replace_schema_in_fqn` analog. */
  private def remapFqnLiteral(fqn: String, searchPath: Seq[String]): String =
    DdlAst.splitDottedIdents(fqn) match {
      case Seq(sch, obj) => s"${target(sch)}.$obj"
      case Seq(obj)      => resolve(QualifiedName(None, obj), searchPath).render
      case _             => fqn
    }

  /** Textual schema remap of a LANGUAGE sql body (see note above). */
  def remapSqlText(sql: String, searchPath: Seq[String] = Seq("public")): String = {
    val afterRegclass = regclassRe.replaceAllIn(sql, m =>
      scala.util.matching.Regex.quoteReplacement(
        s"'${remapFqnLiteral(m.group(1), searchPath)}'::regclass"))
    val afterRel = remapRelations(afterRegclass)
    funcCallRe.replaceAllIn(afterRel, m =>
      scala.util.matching.Regex.quoteReplacement(
        s"${targetTok(m.group(1))}.${m.group(2)}("))
  }
}
