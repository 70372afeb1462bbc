package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic PG-catalog-shaped fixtures (FIXTURES.md §5). The
  * same literals appear as VALUES lists in the oracle SQL (see
  * `graft.queries.Catalog`) so DuckDB checks the catalog queries
  * value-for-value. Relids: customer=100, lineitem=200, orders=300.
  */
object PgCatalog {

  def pgAttribute(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (100, "c_custkey", 1, "bigint"),
      (100, "c_name", 2, "text"),
      (100, "c_nationkey", 3, "integer"),
      (100, "c_acctbal", 4, "double precision"),
      (100, "c_mktsegment", 5, "text"),
      (200, "l_orderkey", 1, "bigint"),
      (200, "l_linenumber", 2, "integer"),
      (200, "l_quantity", 3, "double precision"),
      (300, "o_orderkey", 1, "bigint"),
      (300, "o_custkey", 2, "bigint"),
      (300, "o_totalprice", 3, "double precision"))
      .toDF("attrelid", "attname", "attnum", "atttypid_regtype")
  }

  def pgConstraint(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("customer_pkey", 100, "p", Seq(1)),
      ("lineitem_pkey", 200, "p", Seq(1, 2)),
      ("orders_pkey", 300, "p", Seq(1)),
      ("lineitem_order_fk", 200, "f", Seq(1)),
      ("orders_cust_fk", 300, "f", Seq(2)),
      ("customer_nation_fk", 100, "f", Seq(3)))
      .toDF("conname", "conrelid", "contype", "conkey")
  }

  def pgIndex(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1000, 100, true, true, Seq(1), 1),
      (1001, 200, true, true, Seq(1, 2), 2),
      (1002, 300, true, true, Seq(1), 1),
      (1003, 200, false, true, Seq(1), 1),
      (1004, 300, false, false, Seq(2), 1), // invalid, locked
      (1005, 100, true, true, Seq(2), 1),   // non-PK unique on c_name
      (1006, 100, false, false, Seq(4), 1)) // invalid, unlocked
      .toDF("indexrelid", "indrelid", "indisunique", "indisvalid", "indkey", "indnkeyatts")
  }

  def pgLocks(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(1004).toDF("relation")
  }

  def pgDepend(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("uuid_generate_v4", "", "e", "pg_proc"),
      ("uuid_generate_v4", "", "e", "pg_proc"), // duplicate → DISTINCT
      ("digest", "", "e", "pg_proc"),
      ("", "hstore", "e", "pg_type"),
      ("plain_func", "", "n", "pg_proc")) // non-extension dep
      .toDF("objid_regproc", "objid_regtype", "deptype", "classid")
  }
}
