package graft.queries

import java.nio.file.Files

import graft.{GraftQuery, Tables}
import graft.model.{SchemaRegistry, TableId}
import graft.snapshot.Snapshot
import graft.stream.TableStore
import org.apache.spark.sql.functions._

/** Snapshot ("basebackup") query surface: parallel snapshot copy into
  * the versioned store + the post-data validation queries that
  * replace constraints (SURVEY §3.3, K7, P11).
  */
object Snap {

  /** Full basebackup of three tables into a fresh store; output = per
    * table row counts read back *from the store* (so the copy itself
    * is what's being checked).
    */
  val snap_basebackup = GraftQuery(
    "snap_basebackup",
    (s, dir) => {
      import s.implicits._
      // fixed per-process path, cleaned before use — fresh temp dirs
      // every run would leak a full table copy per gate invocation
      val root = java.nio.file.Paths
        .get(System.getProperty("java.io.tmpdir"), "graft-snap-fixed").toString
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(root))
      val store = new TableStore(s, root)
      val registry = new SchemaRegistry
      val specs = Seq(
        Snapshot.TableSpec(TableId("srcdb", "public", "region"), Seq("r_regionkey"), s"$dir/region.parquet"),
        Snapshot.TableSpec(TableId("srcdb", "public", "nation"), Seq("n_nationkey"), s"$dir/nation.parquet"),
        Snapshot.TableSpec(TableId("srcdb", "public", "customer"), Seq("c_custkey"), s"$dir/customer.parquet"))
      Snapshot.basebackup(s, specs, registry, store, root, startLsn = 0x16B374D848L, njobs = 8)
      val counts = specs.map { spec =>
        (spec.id.table, store.read(spec.id).count())
      }
      counts.toDF("tbl", "n_rows").orderBy(col("tbl"))
    },
    Some("""SELECT tbl, n_rows FROM (
      SELECT 'region' AS tbl, COUNT(*) AS n_rows FROM region
      UNION ALL SELECT 'nation', COUNT(*) FROM nation
      UNION ALL SELECT 'customer', COUNT(*) FROM customer)
      ORDER BY tbl"""))

  /** PK-uniqueness validation over a corpus with planted duplicate
    * composite keys. */
  val snap_validate_pk = GraftQuery(
    "snap_validate_pk",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val withDups = graft.fixtures.Planted.corpus(li,
        (pmod(col("l_orderkey"), lit(100)) === 0) -> Seq.empty)
      Snapshot.validatePrimaryKey(withDups, Seq("l_orderkey", "l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_orderkey, l_linenumber, COUNT(*) AS n_rows FROM (
      SELECT l_orderkey, l_linenumber FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey % 100 = 0)
      GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1
      ORDER BY l_orderkey, l_linenumber"""))

  /** FK orphan detection: lineitem→part with the parent artificially
    * truncated, so the orphan set is deterministic and non-empty. */
  val snap_validate_fk = GraftQuery(
    "snap_validate_fk",
    (s, dir) => {
      Snapshot.validateForeignKey(
        Tables.lineitem(s, dir), Seq("l_partkey"),
        Tables.part(s, dir).filter(col("p_partkey") > 10), Seq("p_partkey"))
        .orderBy(col("l_partkey"))
    },
    Some("""SELECT l_partkey, COUNT(*) AS n_orphan_rows
      FROM lineitem l
      WHERE l_partkey IS NOT NULL AND NOT EXISTS (
        SELECT 1 FROM part p WHERE p.p_partkey > 10 AND p.p_partkey = l.l_partkey)
      GROUP BY l_partkey ORDER BY l_partkey"""))

  def all: Seq[GraftQuery] = Seq(snap_basebackup, snap_validate_pk, snap_validate_fk)
}
