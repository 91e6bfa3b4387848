package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Crafted-document contract tests for [[Boilerplate]] over RAW
  * newline lines — the signals the parquet fixture cannot exercise
  * (terminal punctuation, link tokens, blank lines) plus the
  * byte-exact cut-and-rejoin law. */
class BoilerplateSpec extends SparkSpec {

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private val chrome = "Cookie notice: accept all cookies"
  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, s"$chrome\nReal first sentence.\nVisit http://a.example now"),
      (2L, s"$chrome\nAnother body line!\n"),
      (3L, s"$chrome\nwww.b.example is a link\nFinal line?"),
      (4L, "Unique document.\nNo boilerplate here")
    ).toDF("doc_id", "text")
  }

  test("raw-line signals: terminal punctuation, links, duplication") {
    val rep = Boilerplate.lineSignalReport(Boilerplate.linesRaw(docs))
      .orderBy("doc_id").collect()
    val byId = rep.map(r => r.getLong(0) -> r).toMap
    // doc 1: 3 lines; chrome line duplicated across docs 1,2,3 (nd=3);
    // 1 terminal line ("Real first sentence."); 1 link token (http://…)
    assert(byId(1L).getLong(1) == 3 && byId(1L).getLong(2) == 1)
    assert(byId(1L).getLong(4) == 3)   // max_dup_docs
    assert(byId(1L).getLong(5) == 1)   // n_terminal_lines
    assert(byId(1L).getLong(6) == 1)   // n_link_tokens
    // doc 2: trailing \n makes a BLANK third line; blank lines only
    // appear in docs 2 — nd(blank)=1, not boilerplate
    assert(byId(2L).getLong(1) == 3 && byId(2L).getLong(2) == 1)
    assert(byId(2L).getLong(5) == 1)   // "Another body line!"
    // doc 3: www link token counts; "Final line?" is terminal
    assert(byId(3L).getLong(6) == 1 && byId(3L).getLong(5) == 1)
    // doc 4: nothing duplicated, frac 0
    assert(byId(4L).getLong(2) == 0 && byId(4L).getLong(3) == 0)
  }

  test("removal cuts only the corpus-duplicated line and rejoins byte-exactly") {
    val out = Boilerplate
      .removeDuplicatedLines(Boilerplate.linesRaw(docs), "\n")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // doc 1 keeps its 2 non-chrome lines, rejoined with \n, hashed
    assert(byId(1L).getLong(1) == 2)
    assert(byId(1L).getLong(3) ==
      h60("Real first sentence.\nVisit http://a.example now"))
    // doc 2 keeps body + the blank line (blank is not duplicated ≥ 3)
    assert(byId(2L).getLong(1) == 2)
    assert(byId(2L).getLong(3) == h60("Another body line!\n"))
    // doc 4 untouched: cleaned == original text
    assert(byId(4L).getLong(1) == 2)
    assert(byId(4L).getLong(3) == h60("Unique document.\nNo boilerplate here"))
  }

  test("a fully-boilerplate document still emits a row hashing the empty string") {
    val s = spark
    import s.implicits._
    val allChrome = Seq(
      (1L, chrome), (2L, chrome), (3L, chrome)).toDF("doc_id", "text")
    val out = Boilerplate
      .removeDuplicatedLines(Boilerplate.linesRaw(allChrome), "\n")
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
      assert(r.getLong(3) == h60(""))
    }
  }

  test("token-window lines reassemble the uncut token stream exactly") {
    val s = spark
    import s.implicits._
    // no duplication: removal must be the identity on the token stream
    val solo = Seq((1L, ("tok " * 25).trim)).toDF("doc_id", "text")
    val out = Boilerplate
      .removeDuplicatedLines(Boilerplate.linesTokenWindows(solo), " ")
      .collect()(0)
    assert(out.getLong(1) == 3)    // 25 tokens -> windows of 10/10/5
    assert(out.getLong(2) == 25L)
    assert(out.getLong(3) == h60(("tok " * 25).trim))
  }
}
