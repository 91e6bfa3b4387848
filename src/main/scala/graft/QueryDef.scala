package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query plus (optionally) its DuckDB oracle SQL.
  *
  * Keeping the Spark plan and the oracle side by side makes the column-name
  * and type contracts between them reviewable in one place — the driver's
  * compare hashes values after sorting columns by NAME, so every computed
  * column must carry the same alias in both.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryModule {
  def defs: Seq[QueryDef]

  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  final def oracles: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
