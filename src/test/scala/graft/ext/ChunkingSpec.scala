package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q55 chunking: every token is covered; adjacent chunks overlap by C-S") {
    val out = graft.ext.Chunking.queries("q55_doc_chunking")(spark, dir)
    // re-derive per-doc token counts independently
    val toks = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), size(TextDsl.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0)
    val byDoc = out.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_chunks"),
      max(col("chunk_id")).as("max_id"),
      sum(col("n_tokens")).as("sum_tok"),
      max(col("n_tokens")).as("max_tok"))
    val joined = byDoc.join(toks, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nChunks, maxId, sumTok, maxTok, n) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(maxId == nChunks - 1) // chunk ids are dense 0..k-1
      assert(nChunks == (n - 1) / 24 + 1) // one window per stride start < n
      assert(maxTok <= 32)
      // total tokens emitted = n + overlap duplication: every non-final
      // window re-carries min(C-S, tokens after it) — equivalently each
      // window i>0 re-reads C-S tokens unless it's the (possibly short)
      // tail: sum over windows of len = n + Σ_{i>0} (overlap of window i)
      val expected = (0L until nChunks).map { i =>
        math.min(32L, n - i * 24L)
      }.sum
      assert(sumTok == expected, s"doc ${r.getLong(0)}: $sumTok != $expected")
    }
  }

  test("q57 repetition: crafted repetitive vs clean doc") {
    val s = spark
    import s.implicits._
    withTempDir { tmp =>
      // doc 1: "spam spam spam spam" — maximal repetition
      // doc 2: 8 distinct tokens — zero repetition
      Seq(
        (1L, "spam spam spam spam", "en", "srcA", 19L),
        (2L, "alpha beta gamma delta epsilon zeta eta theta", "en", "srcB", 45L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val rows = graft.ext.Chunking.queries("q57_repetition_scores")(spark, tmp.toString)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getBoolean(5))).sortBy(_._1)
      // doc 1: 3 bigrams all "spam spam" → dup frac 2/3; 2 trigrams dup 1/2;
      // top token 4/4
      assert(rows(0) == ((1L, 4L, 2.0 / 3.0, 0.5, 1.0, true)))
      // doc 2: all n-grams distinct, every token unique
      assert(rows(1) == ((2L, 8L, 0.0, 0.0, 1.0 / 8.0, false)))
    }
  }

  test("bloom membership: zero false negatives, fp rate near configured fpp") {
    val s = spark
    import s.implicits._
    val members = (1L to 50000L).map(_ * 7919L)
    val df = members.toDF("h")
    val bloom = df.stat.bloomFilter("h", members.size.toLong, 0.01)
    // no false negatives — the Bloom guarantee the q58 contract leans on
    val misses = df.withColumn("hit",
        graft.functions.BloomFunctions.mightContainLong(col("h"), bloom))
      .filter(!col("hit")).count()
    assert(misses == 0)
    // false positives: disjoint probe set, rate should be ~fpp (loose 3x)
    val probes = (1L to 20000L).map(_ * 7919L + 1L).toDF("h")
    val fp = probes.withColumn("hit",
        graft.functions.BloomFunctions.mightContainLong(col("h"), bloom))
      .filter(col("hit")).count()
    assert(fp <= 20000 * 0.03, s"fp=$fp")
  }
}
