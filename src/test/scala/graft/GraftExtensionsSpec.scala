package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The kernels are callable from plain SQL once the extensions are
  * installed (spark.sql.extensions=graft.GraftExtensions). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("kernel functions resolve and compute in spark.sql") {
    // force the shared context up first so we reuse it
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = s.sql(
        """SELECT
          |  tokenize_ascii_lower('Hello, World! 42') AS tk,
          |  word_shingles(array('a','b','c','d'), 3) AS sh,
          |  size(minhash_signature(array('a b c'), 12)) AS sig_len,
          |  simhash60(array('hello')) AS sim,
          |  dot_int64(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dot
          |""".stripMargin).head()
      val fp = s.sql(
        "SELECT positional_fingerprint(tokenize_ascii_lower('a b')) AS fp").head()
      assert(fp.getLong(0) ==
        graft.functions.HashKernels.positionalFingerprint(
          graft.functions.TextKernels.tokenizeAsciiLower(
            org.apache.spark.unsafe.types.UTF8String.fromString("a b"))))
      // the aggregate registers too: top_k over a grouped SQL query
      val top = s.sql(
        """SELECT g, top_k(v, 2) AS top FROM VALUES
          |  (1, 5L), (1, 9L), (1, 7L), (2, 1L) AS t(g, v)
          |GROUP BY g ORDER BY g""".stripMargin).collect()
      assert(top(0).getSeq[Long](1) == Seq(9L, 7L))
      assert(top(1).getSeq[Long](1) == Seq(1L))
      // bloom_build aggregate: sketch bytes round-trip and contain inputs
      val sk = s.sql(
        """SELECT bloom_build(v, 100, CAST(0.01 AS DOUBLE)) AS sk
          |FROM VALUES (1L), (2L), (3L) AS t(v)""".stripMargin)
        .head().getAs[Array[Byte]](0)
      val bloom = org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(sk))
      assert(Seq(1L, 2L, 3L).forall(bloom.mightContainLong))
      assert(!bloom.mightContainLong(99L))
      // non-long hash column fails at analysis, not executor-side
      intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("""SELECT bloom_build(v, 100, CAST(0.01 AS DOUBLE))
                |FROM VALUES ('a'), ('b') AS t(v)""".stripMargin).collect()
      }
      // wrong arity names the function instead of an index error
      val arityErr = intercept[Exception] {
        s.sql("SELECT bloom_build(v, 100) FROM VALUES (1L) AS t(v)").collect()
      }
      assert(arityErr.getMessage.contains("bloom_build"),
        s"arity error should name the function: ${arityErr.getMessage}")
      // the PPM container parse registers too: header words from SQL
      val ppm = s.sql(
        "SELECT ppm_header(CAST(concat('P6\n1 1\n255\n', 'abc') AS BINARY)) AS h")
        .head().getSeq[Long](0)
      assert(ppm == Seq(1L, 1L, 255L, 11L, 3L))
      // pixel channel stats register too: 'abc' = one (97, 98, 99) pixel
      val pcs = s.sql(
        "SELECT ppm_channel_stats(CAST(concat('P6\n1 1\n255\n', 'abc') AS BINARY)) AS st")
        .head().getSeq[Long](0)
      assert(pcs == Seq(1L, 97L, 98L, 99L, 97L, 98L, 99L, 97L, 98L, 99L))
      assert(row.getSeq[String](0) == Seq("hello", "world", "42"))
      assert(row.getSeq[String](1) == Seq("a b c", "b c d"))
      assert(row.getInt(2) == 12)
      assert(row.getLong(4) == 32L)
      // simhash of a single token = its 60-bit hash pattern
      import org.apache.spark.unsafe.types.UTF8String
      assert(row.getLong(3) ==
        graft.functions.HashKernels.md5h60(UTF8String.fromString("hello")))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
