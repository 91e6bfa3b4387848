package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet tables — the co-located-join primitive for repeated
  * large⋈large joins.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is shuffling both
  * sides on the key. Bucketing pays that shuffle ONCE at write time:
  * both tables hash-partitioned into the same bucket count on the join
  * key, each bucket sorted, so every later join on that key plans as a
  * sort-merge join with NO exchange on either side (BucketedSpec asserts
  * zero ShuffleExchange nodes). The reference has no table layout concept
  * at all (tools/tools.go:343-366 numbers whole files); this is the
  * Spark-native layout tool a pipeline run at scale would standardize on
  * for its hot keys (user_id, doc_id).
  *
  * Bucket count guidance: ~(table size / target partition size), fixed
  * across the tables that join together — both sides MUST agree on count
  * and key for the exchange to be elided.
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table.
    * Idempotent across sessions: an in-memory catalog forgets tables
    * between JVMs while their warehouse directories persist, so a stale
    * location is removed before the (re)write — otherwise Spark refuses
    * with LOCATION_ALREADY_EXISTS. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir")),
      table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Join two tables bucketed on `key` with the same bucket count:
    * sort-merge join, zero exchanges — each task reads bucket i of both
    * sides locally. */
  def cobucketedJoin(
      spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
