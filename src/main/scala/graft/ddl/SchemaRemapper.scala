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

  def target(schema: String): String =
    schemaMap.getOrElse(schema, s"${database}_$schema")

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
      case s: CreateSchema  => s.copy(schema = target(s.schema))
      case s: Other         => s
    }
}
