package graft.ops

import graft.{QueryDef, QueryModule, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Declarative data-quality checks — the validation gate a pipeline runs
  * before promoting a dataset version (the reference validates shape
  * only via its JSON schema template, tools/tools.go:540-562; these are
  * content constraints).
  *
  * Every check is ONE aggregation returning a single (entity, check,
  * observed, passed) row, so a table's whole check suite is a handful of
  * scans — at 100 TB you fuse the per-table checks into one pass (the
  * aggregates compose; see q68 which shares the orders scan) and the
  * referential check is one shuffle-free-if-bucketed anti-join count.
  * `observed` is always the VIOLATION count, so passed ⟺ observed = 0
  * and the report stays actionable.
  */
object Checks extends QueryModule {

  private def report(entity: String, check: String, violations: Column): Column =
    struct(lit(entity).as("entity"), lit(check).as("chk"),
      violations.cast("long").as("observed"),
      (violations === 0L).as("passed"))

  /** Duplicate count over `cols` (0 ⟺ unique). */
  def uniqueness(df: DataFrame, entity: String, cols: Seq[String]): DataFrame =
    df.agg(report(entity, s"unique_${cols.mkString("_")}",
      count(lit(1)) - count_distinct(struct(cols.map(col): _*))).as("r"))
      .select("r.*")

  /** Null count in `c`. */
  def notNull(df: DataFrame, entity: String, c: String): DataFrame =
    df.agg(report(entity, s"notnull_$c",
      count(lit(1)) - count(col(c))).as("r"))
      .select("r.*")

  /** Rows violating an arbitrary row predicate. coalesce: sum over an
    * empty table is NULL, and an empty table violates nothing. */
  def satisfies(df: DataFrame, entity: String, name: String, pred: Column): DataFrame =
    df.agg(report(entity, name,
      coalesce(sum(when(pred, 0L).otherwise(1L)), lit(0L))).as("r"))
      .select("r.*")

  /** Orphaned child rows (childKey value absent from parentKey). */
  def referential(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, entity: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
    orphans.agg(report(entity, s"fk_$childKey", count(lit(1))).as("r"))
      .select("r.*")
  }

  override val defs: Seq[QueryDef] = Seq(

    // q68: the quality gate over the fixture warehouse — uniqueness,
    // referential integrity, null and range constraints, one row per
    // check; the oracle recomputes each constraint in plain SQL.
    QueryDef(
      "q68_data_quality_report",
      (s, dir) => {
        val orders = T.orders(s, dir)
        uniqueness(orders, "orders", Seq("o_orderkey"))
          .unionAll(referential(T.lineitem(s, dir), "l_orderkey",
            orders, "o_orderkey", "lineitem"))
          .unionAll(notNull(T.events(s, dir), "events", "value"))
          .unionAll(satisfies(T.customer(s, dir), "customer",
            "acctbal_over_min", col("c_acctbal") > -1000.0))
          .orderBy(col("entity"), col("chk"))
      },
      Some("""
        SELECT * FROM (
          SELECT 'orders' AS entity, 'unique_o_orderkey' AS chk,
                 CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS observed,
                 COUNT(*) - COUNT(DISTINCT o_orderkey) = 0 AS passed
          FROM orders
          UNION ALL
          SELECT 'lineitem', 'fk_l_orderkey', CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
          FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
          UNION ALL
          SELECT 'events', 'notnull_value',
                 CAST(COUNT(*) - COUNT(value) AS BIGINT),
                 COUNT(*) - COUNT(value) = 0
          FROM events
          UNION ALL
          SELECT 'customer', 'acctbal_over_min',
                 CAST(SUM(CASE WHEN c_acctbal > -1000.0 THEN 0 ELSE 1 END) AS BIGINT),
                 SUM(CASE WHEN c_acctbal > -1000.0 THEN 0 ELSE 1 END) = 0
          FROM customer)
        ORDER BY entity, chk""")),

    // q69: column profiling — non-null and distinct cardinality per
    // column in ONE aggregation pass over the table (the stack() unpivot
    // runs on the single aggregated row, so profiling n columns costs
    // one scan, not n). The first step of any ingest review.
    QueryDef(
      "q69_column_profile",
      (s, dir) => {
        val cols = Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        val aggs = cols.flatMap(c => Seq(
          count(col(c)).as(s"${c}_nn"),
          count_distinct(col(c)).as(s"${c}_nd")))
        val stackExpr = s"stack(${cols.length}, " + cols.map(c =>
          s"'$c', ${c}_nn, ${c}_nd").mkString(", ") +
          ") AS (col_name, n_nonnull, n_distinct)"
        T.customer(s, dir)
          .agg(aggs.head, aggs.tail: _*)
          .select(expr(stackExpr))
          .orderBy(col("col_name"))
      },
      Some("""
        SELECT 'c_custkey' AS col_name, COUNT(c_custkey) AS n_nonnull,
               COUNT(DISTINCT c_custkey) AS n_distinct FROM customer
        UNION ALL
        SELECT 'c_name', COUNT(c_name), COUNT(DISTINCT c_name) FROM customer
        UNION ALL
        SELECT 'c_acctbal', COUNT(c_acctbal), COUNT(DISTINCT c_acctbal) FROM customer
        UNION ALL
        SELECT 'c_mktsegment', COUNT(c_mktsegment), COUNT(DISTINCT c_mktsegment) FROM customer
        ORDER BY col_name"""))
  )
}
