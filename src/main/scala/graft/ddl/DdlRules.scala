package graft.ddl

import java.security.MessageDigest

import DdlAst._

/** Classification / filter rules over DDL statements — the
  * reference's skip & route logic (SURVEY §2.3 P8, P10–P12):
  *  - restore-time drops: triggers, event triggers, grants, default
  *    privileges, policies, comments, casts, ownership
  *    (`connemara_python/connemara/sqlparser/__init__.py:197-251`)
  *  - post-data routing: indexes, constraints, cluster
  *  - replay-time skips by regex: temp tables, extensions, functions,
  *    CHECK/RLS/owner (`replayer/connemara_rewrite.pm:44-116`)
  *  - md5 whitelist (`replayer/connemara_rewrite.pm:28-43`)
  *  - the kill switch: `/comment.*'KILL_ME'/i`
  *    (`replayer/connemara_replay.pl:294-298`)
  */
object DdlRules {

  sealed trait Disposition
  case object Apply extends Disposition
  case object Skip extends Disposition
  case object PostData extends Disposition
  case object Kill extends Disposition

  private val dropTags = Set(
    "CREATE TRIGGER", "CREATE EVENT", "GRANT", "REVOKE", "ALTER DEFAULT",
    "CREATE POLICY", "COMMENT ON", "CREATE CAST", "ALTER OWNER",
    "SECURITY LABEL", "CREATE FUNCTION", "CREATE PROCEDURE", "CREATE VIEW",
    "DROP VIEW", "CREATE EXTENSION", "ALTER EXTENSION", "SET")

  private val postDataTags = Set("CREATE INDEX", "CREATE UNIQUE", "CLUSTER")

  private val skipRegexes = Seq(
    """(?is)^CREATE\s+(GLOBAL\s+|LOCAL\s+)?(TEMP|TEMPORARY)\s+TABLE""".r,
    """(?is)^ALTER\s+TABLE\s+.*\s+OWNER\s+TO\s+""".r,
    """(?is)^ALTER\s+TABLE\s+.*\s+(ENABLE|DISABLE)\s+(ROW\s+LEVEL\s+SECURITY|TRIGGER)""".r,
    """(?is)^ALTER\s+TABLE\s+.*\s+ADD\s+CONSTRAINT\s+.*\s+CHECK\s*\(""".r,
    """(?is)^ALTER\s+TABLE\s+.*\s+REPLICA\s+IDENTITY\s+""".r)

  private val killRe = """(?is)comment.*'KILL_ME'""".r

  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  def classify(stmt: DdlStatement,
               ignoredSchemas: Set[String] = Set.empty,
               md5Whitelist: Set[String] = Set.empty,
               searchPath: Seq[String] = Seq("public")): Disposition = {
    val raw = stmt.raw
    if (killRe.findFirstIn(raw).isDefined) return Kill
    if (md5Whitelist.contains(md5Hex(raw))) return Skip
    // a Multi's parts classify INDIVIDUALLY (dispatch recurses with
    // each part's own raw) — whole-raw skip regexes here would let
    // one skippable action veto the statement's real schema changes
    stmt match {
      case Multi(_, _) => return Apply
      case _           => ()
    }
    if (skipRegexes.exists(_.findFirstIn(raw).isDefined)) return Skip

    // unqualified names resolve through the event's search_path — an
    // ignored schema must be ignored whether or not it was spelled out
    def ignored(t: QualifiedName): Boolean =
      t.schema.orElse(searchPath.headOption).exists(ignoredSchemas)
    val inIgnoredSchema = stmt match {
      case CreateTable(_, t, _, _, _)   => ignored(t)
      case DropTable(_, t, _)           => ignored(t)
      case TruncateTable(_, t)          => ignored(t)
      case AddColumn(_, t, _, _, _)     => ignored(t)
      case DropColumn(_, t, _, _)       => ignored(t)
      case RenameColumn(_, t, _, _)     => ignored(t)
      case RenameTable(_, t, _)         => ignored(t)
      case AlterColumnType(_, t, _, _)  => ignored(t)
      case CreateSchema(_, s, _)        => ignoredSchemas(s)
      case CreateEnum(_, t, _)          => ignored(t)
      case CreateSequence(_, t, _)      => ignored(t)
      case AlterSequence(_, t, _)       => ignored(t)
      case f: CreateFunction            => ignored(f.name)
      case _                            => false
    }
    if (inIgnoredSchema) return Skip

    val addsConstraint =
      """(?is)^ALTER\s+TABLE\s+.*\s+ADD\s+CONSTRAINT\s+""".r.findFirstIn(raw).isDefined
    stmt match {
      case Other(_, _) if addsConstraint => PostData
      // replay drops functions — "they'll need a rewrite anyway"
      // (`replayer/connemara_rewrite.pm:77-80`); the basebackup path
      // remaps them via SchemaRemapper BEFORE classification applies
      case _: CreateFunction => Skip
      case Other(_, tag) if dropTags.exists(tag.startsWith) => Skip
      case Other(_, tag) if postDataTags.exists(tag.startsWith) => PostData
      case _ => Apply
    }
  }
}
