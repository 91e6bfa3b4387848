package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet fixture tables (TESTDATA.md).
  *
  * Reads go straight through Spark's vectorized parquet reader so Catalyst
  * pushes filters and prunes columns into the scan — at 100 TB the scan is
  * the dominant cost and pushdown/pruning is the first-order optimization.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy conf) and convert to a
    * microsecond TimestampType column. Integer `div` keeps the int64 exact
    * (a double division would lose precision above 2^53 ns).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** Column helpers shared by the query library.
  *
  * The DuckDB-oracle hash compare needs bit-identical doubles on both
  * engines. Floating-point SUM is order-dependent (Spark sums per
  * partition, DuckDB sums in scan order), so any double aggregate would
  * drift in the last bits and can flip a rounded value. The fix: cast each
  * value (or each per-row product, which IS deterministic in IEEE double)
  * to a fixed-scale decimal, sum exactly in decimal — associative, so
  * partition order doesn't matter — and cast the exact result back to
  * double. Both engines then produce the same bits.
  */
object Dsl {
  /** Order-independent, engine-identical sum of a double column. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  /** Matching DuckDB SQL fragment for [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(30,$scale))) AS DOUBLE)"

  /** avg as exact-sum / count — double division of identical operands is
    * bit-identical across engines. */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(lit(1))

  def davgSql(expr: String, scale: Int = 4): String =
    s"${dsumSql(expr, scale)} / COUNT(*)"
}
