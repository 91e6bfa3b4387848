package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PhraseSearchSpec extends SparkSpec {

  private def fixtureDocs = {
    val s = spark
    graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select(col("doc_id"), graft.ext.TextDsl.tokens(col("text")).as("tk"))
  }

  test("planted phrases: shingle tf counts overlapping occurrences and ranks by (tf, doc_id)") {
    val s = spark
    import s.implicits._
    withTempDir { tmp =>
      Seq(
        // "spark join" twice (overlapping scan: spark join ... spark join)
        (1L, "spark join alpha spark join", "en", "srcA", 25L),
        // once, lower tf → ranks after doc 1
        (2L, "spark join beta", "en", "srcA", 15L),
        // words present but never adjacent — no phrase hit
        (3L, "spark beta join", "en", "srcA", 15L),
        // tf ties doc 2 → doc_id breaks the tie
        (4L, "gamma spark join", "en", "srcB", 16L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val rows = PhraseSearch.queries("q219_phrase_search")(spark, tmp.toString)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val sj = rows.filter(_._1 == "spark join")
      assert(sj.toSeq == Seq(
        ("spark join", 1L, 1L, 2L),
        ("spark join", 2L, 2L, 1L),
        ("spark join", 3L, 4L, 1L)))
      assert(!rows.exists(_._3 == 3L))
    }
  }

  test("law: adjacency join over positional postings == row-local shingle definition (fixture)") {
    val docs = fixtureDocs
    val byShingle = PhraseSearch.phraseTfShingle(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val byPostings = PhraseSearch
      .phraseTfPostings(PhraseSearch.positionalPostings(docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(byShingle.nonEmpty)
    assert(byPostings == byShingle)
  }

  test("proximity: window boundary is inclusive and distance is over raw token positions") {
    val s = spark
    import s.implicits._
    withTempDir { tmp =>
      Seq(
        // distance exactly 5 (inclusive boundary)
        (1L, "spark a b c d window", "en", "srcA", 25L),
        // distance 6 — out
        (2L, "spark a b c d e window", "en", "srcA", 27L),
        // adjacent, both orders pair: min_dist 1, pairs (1x1)+(1x1)
        (3L, "window spark window", "en", "srcA", 19L),
        // only one of the terms — out
        (4L, "spark spark spark", "en", "srcB", 17L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val rows = PhraseSearch.queries("q221_proximity_search")(spark, tmp.toString)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq == Seq((1L, 5L, 1L), (3L, 1L, 2L)))
    }
  }

  test("delta decode law: running-sum over gaps reconstructs the exact posting lists (fixture)") {
    val docs = fixtureDocs
    val pl = docs
      .select(col("doc_id"), explode(array_distinct(col("tk"))).as("term"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("doc_id"))
    val gaps = pl.select(col("term"), col("doc_id"),
      (col("doc_id") - coalesce(lag(col("doc_id"), 1).over(w), lit(-1L)))
        .as("gap"))
    // decode: cumulative gap sum − 1 per term, in posting order (gaps
    // are ≥ 1 so posting order ≡ doc_id order — the window reuses it)
    val decoded = gaps.select(col("term"), col("doc_id"),
      (sum(col("gap")).over(w.rowsBetween(Long.MinValue, 0)) - 1L)
        .as("dec"))
    assert(decoded.count() > 0)
    assert(decoded.filter(col("dec") =!= col("doc_id")).count() == 0)
  }

  test("law holds on seeded random corpora (not just the fixture): postings == shingles") {
    val s = spark
    import s.implicits._
    // 120 random docs over a 5-token alphabet — dense with repeated and
    // overlapping phrase hits, the adversarial regime for adjacency
    // counting (the fixture's 31-token vocabulary rarely overlaps)
    val rnd = new scala.util.Random(42)
    val alpha = Seq("spark", "join", "window", "group", "order")
    val docs = (0 until 120).map { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(20))(
        alpha(rnd.nextInt(alpha.length))))
    }.toDF("doc_id", "tk")
    val byShingle = PhraseSearch.phraseTfShingle(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val byPostings = PhraseSearch
      .phraseTfPostings(PhraseSearch.positionalPostings(docs))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(byShingle.nonEmpty)
    assert(byPostings == byShingle)
  }

  test("q222 audit: every gap >= 1 and varint pricing never exceeds the raw layout") {
    val rows = PhraseSearch.queries("q222_postings_delta")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, raw, varint, bps) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(raw == 8 * n)
      assert(varint >= n) // >= 1 byte per posting
      assert(varint <= raw)
      assert(bps == varint * 10000 / raw)
    }
  }
}
