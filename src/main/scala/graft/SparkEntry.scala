package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query module's entries. Each query is a function
  * (SparkSession, sfDir) => DataFrame, fully lazy: the driver (or Bench /
  * Verify) triggers execution.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    ops.Relational, ops.PipelineOps, ops.Checks, streaming.StreamingOps,
    ext.TextAnalysis, ext.Dedup, ext.Similarity, ext.Multimodal, ext.Curation,
    ext.Chunking, ext.Retrieval, ext.CountMin, ext.Hll, ext.HistSketch,
    ext.LmScore, ext.Bpe, ext.Classifier, ext.Boilerplate, ext.CurationV2,
    ext.HashedClassifier, ext.CurationV3, ext.PhraseSearch, ext.SuffixDedup,
    ext.UnigramLm)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
