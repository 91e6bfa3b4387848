package graft.functions

import graft.SparkSpec
import graft.ext.{TextDsl => X}
import org.apache.spark.sql.functions._

/** The compiled kernels must be bit-for-bit equal to the declarative
  * HOF formulations in TextDsl (which the DuckDB oracles mirror). */
class HashKernelsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def shingles = graft.Tables.documents(spark, dir)
    .select(col("doc_id"), X.tokensHof(col("text")).as("tk"))
    .select(col("doc_id"), array_distinct(X.shinglesHof(col("tk"), 3)).as("sh"),
      col("tk"))

  test("TokenizeAsciiLower == HOF regexp tokenize on fixture text") {
    val both = graft.Tables.documents(spark, dir)
      .withColumn("native", HashFunctions.tokenize(col("text")))
      .withColumn("hof", X.tokensHof(col("text")))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // punctuation/case/multibyte edge handling
    val s = spark
    import s.implicits._
    val edge = Seq("Hello, WORLD!  x9 --", "", "   ", "a", "ünïcode Straße 7")
      .toDF("text")
      .withColumn("native", HashFunctions.tokenize(col("text")))
      .withColumn("hof", X.tokensHof(col("text")))
    assert(edge.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("WordShingles == HOF shingles incl. short inputs") {
    val both = shingles
      .withColumn("native", HashFunctions.shingles(col("tk"), 3))
      .withColumn("hof", X.shinglesHof(col("tk"), 3))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    val s = spark
    import s.implicits._
    val short = Seq(Seq("a"), Seq("a", "b"), Seq[String](), Seq("a", "b", "c"))
      .toDF("tk")
      .withColumn("native", HashFunctions.shingles(col("tk"), 3))
      .withColumn("hof", X.shinglesHof(col("tk"), 3))
    assert(short.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("SortedIdPairs == HOF nested-transform pair expansion") {
    val s = spark
    import s.implicits._
    val df = Seq(Seq(1L, 3L, 9L, 12L), Seq(5L), Seq[Long](), Seq(2L, 4L))
      .toDF("ids")
    val hof = filter(
      flatten(transform(col("ids"), a => transform(col("ids"), b =>
        struct(a.as("a"), b.as("b"))))),
      p => p.getField("a") < p.getField("b"))
    val both = df
      .withColumn("native", HashFunctions.sortedIdPairs(col("ids")))
      .withColumn("hof", hof)
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("SortedPayloadPairs == HOF nested-transform with payloads") {
    val s = spark
    import s.implicits._
    val df = Seq(
        Seq((1L, 10L), (3L, 30L), (9L, 90L)),
        Seq((5L, 50L)),
        Seq.empty[(Long, Long)])
      .toDF("raw")
      .withColumn("ids", expr("transform(raw, x -> struct(x._1 AS doc_id, x._2 AS sim))"))
    val hof = expr(
      "filter(flatten(transform(ids, a -> transform(ids, b -> " +
        "struct(a.doc_id AS doc_a, b.doc_id AS doc_b, a.sim AS sa, b.sim AS sb)))), " +
        "p -> p.doc_a < p.doc_b)")
    val both = df
      .withColumn("native", HashFunctions.sortedPayloadPairs(col("ids")))
      .withColumn("hof", hof)
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("MinHashSignature == HOF minhashSig over md5-mod-P hashes") {
    val both = shingles
      .withColumn("native", HashFunctions.minhashSignature(col("sh"), 12))
      .withColumn("hof", X.minhashSig(transform(col("sh"), x => X.hp(x)), 12))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() == 500)
  }

  test("HashedBow == HOF fold incl. empty/cancelling token lists") {
    val both = shingles
      .withColumn("native", HashFunctions.hashedBow(col("tk"), 16))
      .withColumn("hof", X.hashedBowHof("tk", 16))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() == 500)
    val s = spark
    import s.implicits._
    val edge = Seq(Seq[String](), Seq("a"), Seq("a", "a", "b"))
      .toDF("tk")
      .withColumn("native", HashFunctions.hashedBow(col("tk"), 16))
      .withColumn("hof", X.hashedBowHof("tk", 16))
    assert(edge.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("SimHash60 == HOF simhash over h60 token hashes") {
    val both = shingles
      .withColumn("native", HashFunctions.simhash60(col("tk")))
      .withColumn("hs", transform(col("tk"), t => X.h60(t)))
      .withColumn("hof", X.simhash("hs"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("DotProductInt64 == HOF aggregate(zip_with(...)) on scaled embeddings") {
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), X.scaledVec(col("embedding")).as("v"))
    val both = vecs
      .withColumn("native", VectorFunctions.dotInt64(col("v"), col("v")))
      .withColumn("hof",
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0L), (acc, p) => acc + p))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("PositionalFingerprint == HOF fold incl. empty token lists") {
    val hofFp = when(size(col("tk")) < 1, lit(0L)).otherwise(
      aggregate(sequence(lit(1), size(col("tk"))), lit(0L),
        (acc, i) => (acc + (X.hp(element_at(col("tk"), i)) * i)) % X.P))
    val both = shingles
      .withColumn("native", HashFunctions.positionalFingerprint(col("tk")))
      .withColumn("hof", hofFp)
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    val s = spark
    import s.implicits._
    val edge = Seq(Seq[String](), Seq("a"), Seq("b", "a"), Seq("a", "b"))
      .toDF("tk")
      .withColumn("native", HashFunctions.positionalFingerprint(col("tk")))
      .withColumn("hof", hofFp)
    assert(edge.filter(col("native") =!= col("hof")).count() == 0)
    // order sensitivity: ["a","b"] and ["b","a"] fingerprint differently
    val fps = edge.filter(size(col("tk")) === 2).select("native")
      .collect().map(_.getLong(0))
    assert(fps.distinct.length == 2)
  }

  test("md5h60 matches conv(substring(md5,1,15),16,10) exactly") {
    val df = graft.Tables.documents(spark, dir)
      .select(X.tokens(col("text")).as("tk"))
      .select(explode(col("tk")).as("t")).limit(5000)
      .withColumn("ref", X.h60(col("t")))
    val kernelVals = df.collect().map { r =>
      (HashKernels.md5h60(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))),
        r.getLong(1))
    }
    assert(kernelVals.forall { case (a, b) => a == b })
  }
}
