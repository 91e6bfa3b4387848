package graft.sources

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JSONL (line-delimited JSON) source/sink — the reference's only data
  * format (arbirk/ETL-template tools/tools.go:474-487 writer,
  * 516-552 streaming reader).
  *
  * Spark's JSON source is line-delimited by default, so both directions
  * are built-ins; this wrapper pins the reference's semantics:
  *  - reads always carry an explicit schema — the reference never
  *    infers, the caller always supplies the record struct
  *    (tools.go:516,524)
  *  - FAILFAST on malformed lines with line context in the error
  *    (tools.go:540-542 aborts with the line number)
  *  - blank/whitespace-only lines are skipped (tools.go:533-535);
  *    Spark's JSON reader drops blank lines natively
  */
object Jsonl {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Whole-file (multi-line) JSON document read — the reference's
    * `ReadJSON` (tools.go:463-469): one JSON document → one record.
    * Used for control-plane files; data stays line-delimited. */
  def readWholeFile(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("multiLine", true)
      .option("mode", "FAILFAST").json(path)
}
