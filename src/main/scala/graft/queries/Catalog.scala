package graft.queries

import graft.GraftQuery
import graft.fixtures.PgCatalog
import graft.maintenance.Maintenance
import org.apache.spark.sql.functions._

/** Catalog / maintenance query surface (SURVEY §2.4 J3–J6, §2.5 G2,
  * §2.6 W1). The oracle SQL carries the same fixture literals as
  * `PgCatalog` in VALUES CTEs so DuckDB recomputes each query.
  */
object Catalog {

  /** Fixture literals as DuckDB CTEs — keep in sync with PgCatalog. */
  private val ctes = """WITH pg_constraint(conname, conrelid, contype, conkey) AS (VALUES
      ('customer_pkey',100,'p',[1]),
      ('lineitem_pkey',200,'p',[1,2]),
      ('orders_pkey',300,'p',[1]),
      ('lineitem_order_fk',200,'f',[1]),
      ('orders_cust_fk',300,'f',[2]),
      ('customer_nation_fk',100,'f',[3])),
    pg_attribute(attrelid, attname, attnum, atttypid_regtype) AS (VALUES
      (100,'c_custkey',1,'bigint'),
      (100,'c_name',2,'text'),
      (100,'c_nationkey',3,'integer'),
      (100,'c_acctbal',4,'double precision'),
      (100,'c_mktsegment',5,'text'),
      (200,'l_orderkey',1,'bigint'),
      (200,'l_linenumber',2,'integer'),
      (200,'l_quantity',3,'double precision'),
      (300,'o_orderkey',1,'bigint'),
      (300,'o_custkey',2,'bigint'),
      (300,'o_totalprice',3,'double precision')),
    pg_index(indexrelid, indrelid, indisunique, indisvalid, indkey, indnkeyatts) AS (VALUES
      (1000,100,true,true,[1],1),
      (1001,200,true,true,[1,2],2),
      (1002,300,true,true,[1],1),
      (1003,200,false,true,[1],1),
      (1004,300,false,false,[2],1),
      (1005,100,true,true,[2],1),
      (1006,100,false,false,[4],1)),
    pg_locks(relation) AS (VALUES (1004)),
    pg_depend(objid_regproc, objid_regtype, deptype, classid) AS (VALUES
      ('uuid_generate_v4','','e','pg_proc'),
      ('uuid_generate_v4','','e','pg_proc'),
      ('digest','','e','pg_proc'),
      ('','hstore','e','pg_type'),
      ('plain_func','','n','pg_proc'))
    """

  val cat_pk_columns = GraftQuery(
    "cat_pk_columns",
    (s, _) => Maintenance.pkColumns(PgCatalog.pgConstraint(s), PgCatalog.pgAttribute(s)),
    // lateral UNNEST and JOIN must live in separate FROM scopes —
    // mixing them in one crashes this DuckDB's binder
    Some(ctes + """
      SELECT conname, conrelid, CAST(i AS INTEGER) AS ordinality, attname
      FROM (
        SELECT conname, conrelid, i, conkey[i] AS attkey
        FROM pg_constraint, UNNEST(range(1, len(conkey)+1)) u(i)
        WHERE contype = 'p') e
      JOIN pg_attribute ON e.conrelid = attrelid AND e.attkey = attnum
      ORDER BY conrelid, conname, ordinality"""))

  val cat_fk_missing_index = GraftQuery(
    "cat_fk_missing_index",
    (s, _) => Maintenance.fkMissingIndex(PgCatalog.pgConstraint(s), PgCatalog.pgIndex(s)),
    Some(ctes + """
      SELECT conname, conrelid FROM pg_constraint c
      WHERE contype = 'f' AND NOT EXISTS (
        SELECT 1 FROM pg_index i
        WHERE i.indisvalid AND i.indrelid = c.conrelid
          AND list_sort(i.indkey[1:len(c.conkey)]) = list_sort(c.conkey))
      ORDER BY conrelid, conname"""))

  val cat_fk_index_cols = GraftQuery(
    "cat_fk_index_cols",
    (s, _) => Maintenance.fkIndexColumnLists(
      PgCatalog.pgConstraint(s), PgCatalog.pgIndex(s), PgCatalog.pgAttribute(s)),
    Some(ctes + """
      SELECT e.conname, e.conrelid,
             string_agg(attname, ',' ORDER BY i) AS index_cols
      FROM (
        SELECT c.conname, c.conrelid, i, c.conkey[i] AS attkey
        FROM pg_constraint c, UNNEST(range(1, len(c.conkey)+1)) u(i)
        WHERE c.contype = 'f' AND NOT EXISTS (
          SELECT 1 FROM pg_index i2
          WHERE i2.indisvalid AND i2.indrelid = c.conrelid
            AND list_sort(i2.indkey[1:len(c.conkey)]) = list_sort(c.conkey))) e
      JOIN pg_attribute a ON a.attrelid = e.conrelid AND a.attnum = e.attkey
      GROUP BY e.conname, e.conrelid
      ORDER BY e.conrelid, e.conname"""))

  val cat_invalid_unlocked = GraftQuery(
    "cat_invalid_unlocked",
    (s, _) => Maintenance.invalidUnlockedIndexes(PgCatalog.pgIndex(s), PgCatalog.pgLocks(s)),
    Some(ctes + """
      SELECT indexrelid, indrelid FROM pg_index i
      WHERE NOT indisvalid AND NOT EXISTS (
        SELECT 1 FROM pg_locks l WHERE l.relation = i.indexrelid)
      ORDER BY indexrelid"""))

  val cat_unique_counts = GraftQuery(
    "cat_unique_counts",
    (s, _) => Maintenance.uniqueIndexCounts(PgCatalog.pgIndex(s)),
    Some(ctes + """
      SELECT indrelid, COUNT(*) AS n_unique, COUNT(*) > 1 AS has_other_uniques
      FROM pg_index WHERE indisunique GROUP BY indrelid ORDER BY indrelid"""))

  val cat_ext_objects = GraftQuery(
    "cat_ext_objects",
    (s, _) => Maintenance.extensionObjects(PgCatalog.pgDepend(s)),
    Some(ctes + """
      SELECT DISTINCT objid_regproc FROM pg_depend
      WHERE deptype = 'e' AND classid = 'pg_proc'
      ORDER BY objid_regproc"""))

  def all: Seq[GraftQuery] = Seq(
    cat_pk_columns, cat_fk_missing_index, cat_fk_index_cols,
    cat_invalid_unlocked, cat_unique_counts, cat_ext_objects)
}
