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
  /** `events.ts` is parquet TIMESTAMP(NANOS). How Spark surfaces that column
    * depends on the runtime: Spark 4.1+ reads it natively as TIMESTAMP_NTZ
    * (nanos truncated to micros by the reader); older runtimes reject it
    * unless `spark.sql.legacy.parquet.nanosAsLong` maps it to raw int64
    * nanos. Branch on the type actually read so the same code runs on both,
    * always normalizing to a session-UTC TimestampType `ts` column. For the
    * long path, integer `div` keeps the int64 exact (a double division would
    * lose precision above 2^53 ns). All sessions here pin
    * `spark.sql.session.timeZone=UTC`, so the NTZ→TZ cast is wall-clock
    * identical to the oracle's naive timestamp.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType =>
        raw
      case other =>
        throw new IllegalStateException(
          s"events.ts read as unexpected type $other; expected LONG (legacy nanos), TIMESTAMP_NTZ, or TIMESTAMP")
    }
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
