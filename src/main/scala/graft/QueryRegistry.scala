package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus, when the
  * semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle over
  * the same parquet tables. Oracle-less queries get the driver's weaker
  * rows-only check.
  *
  * Determinism contract (driver hash-compares values):
  *  - every aggregate over `double` columns casts inputs to
  *    DECIMAL first (exact arithmetic in both engines), and casts the
  *    final result back to DOUBLE — identical bit patterns both sides;
  *  - every output is totally ordered (ORDER BY on a key-complete
  *    prefix) so row order can't differ;
  *  - column names are aliased identically in Spark and SQL.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryRegistry {
  /** All registered queries, in SURVEY §2 inventory order. */
  def all: Seq[GraftQuery] =
    queries.Relational.all ++
      queries.Events.all ++
      queries.Cdc.all ++
      queries.Catalog.all ++
      queries.Snap.all ++
      queries.TrainingData.all

  def queryMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
