package graft.ext

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {

  test("bm25: more query-term mass ranks higher; term-free docs are excluded") {
    val s = spark
    import s.implicits._
    withTempDir { tmp =>
      Seq(
        // doc 1: two distinct query terms, short
        (1L, "spark join", "en", "srcA", 10L),
        // doc 2: one query term repeated, same length
        (2L, "spark spark", "en", "srcA", 11L),
        // doc 3: one term diluted in a long doc
        (3L, "spark alpha beta gamma delta epsilon zeta eta", "en", "srcA", 46L),
        // doc 4: no query terms — must not appear
        (4L, "alpha beta gamma", "en", "srcB", 16L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val rows = graft.ext.Retrieval.queries("q59_bm25_search")(spark, tmp.toString)
        .collect().map(r => (r.getLong(0), r.getDouble(2)))
      assert(!rows.map(_._1).contains(4L))
      val score = rows.toMap
      // two distinct terms beat one repeated term (idf additivity beats
      // the saturating tf), and both beat the diluted long doc
      assert(score(1L) > score(2L))
      assert(score(2L) > score(3L))
      // output is sorted by score desc
      assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq)
    }
  }
}
