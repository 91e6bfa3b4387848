package graft

import org.apache.spark.sql.types._

/** Fast-failing schema contract for the driver's fixture tables.
  *
  * A Spark runtime upgrade can silently change how parquet logical types
  * surface (4.1 turned TIMESTAMP(NANOS) into TIMESTAMP_NTZ and killed the
  * `nanosAsLong` legacy conf, breaking 17 queries in round 10). This spec
  * reads every table at sf0.001 and pins the dtype of each column AFTER the
  * `Tables` loaders' normalization, so the next behavior shift fails in
  * seconds with the table and column named, instead of surfacing as a
  * mid-suite analysis error or a silent oracle mismatch.
  */
class TablesSchemaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      // Parquet TIMESTAMP(MICROS, adjusted=false): naive wall-clock, same
      // as the DuckDB oracle's TIMESTAMP — no normalization needed.
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType,
      // TIMESTAMP(NANOS) on disk; Tables.events must normalize whatever the
      // runtime surfaces (long nanos, NTZ, TZ) to session-UTC TimestampType.
      "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)
  )

  private def load(name: String) = name match {
    case "events" => Tables.events(spark, dir)
    case other    => Tables.t(spark, dir, other)
  }

  for (name <- Tables.names) {
    test(s"schema contract: $name") {
      val schema = load(name).schema
      val exp = expected(name)
      assert(schema.fields.map(_.name).toSeq === exp.map(_._1),
        s"$name column names/order drifted")
      for ((colName, dt) <- exp) {
        val actual = schema(colName).dataType
        assert(actual === dt,
          s"$name.$colName read as $actual, expected $dt — Spark runtime " +
            "behavior shift? Check parquet logical-type handling in Tables.")
      }
    }
  }
}
