package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the Naive Bayes lang-ID family (q232/q233):
  *
  *  1. [[HashedClassifier.cbCol]] computes ⌊1024·log2(num/den)⌋ to
  *     within 1 unit of the float reference (truncating mantissa
  *     squarings can undershoot the exact floor by at most 1; never
  *     overshoot) — on a seeded sweep of ratios including exact powers
  *     of two and num = den.
  *  2. LEARNABILITY: on a synthetic corpus whose classes genuinely
  *     differ in vocabulary, held-out NB classification is
  *     near-perfect — the machinery learns when signal exists; the
  *     fixture's prior collapse (q232) is a property of that corpus,
  *     not of the model.
  */
class NbLangIdSpec extends SparkSpec {

  test("cbCol equals floor(1024·log2(num/den)) within 1, never above") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq((1L, 1L), (2L, 1L), (1024L, 1L), (3L, 2L),
      (65537L, 1L), (1L << 30, 3L)) ++
      (1 to 200).map { _ =>
        val den = 1L + rnd.nextInt(1 << 20).toLong
        val num = den + rnd.nextInt(1 << 22).toLong
        (num, den)
      }
    val df = pairs.toDF("num", "den")
    val got = HashedClassifier.cbCol(df, col("num"), col("den"), "cb")
      .select(col("num"), col("den"), col("cb")).collect()
    got.foreach { r =>
      val (num, den, cb) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val exact = math.floor(1024.0 * math.log(num.toDouble / den) /
        math.log(2.0)).toLong
      assert(cb <= exact && cb >= exact - 1,
        s"cb($num/$den) = $cb, exact floor = $exact")
    }
  }

  test("served NB model (store) equals an in-plan nbModel rebuild") {
    // q232/q233 serve the committed nbw/nbcls artifacts (r19); this
    // pins the store round-trip: deterministic int64 model, identical
    // value for value to a fresh closed-form build over the same
    // committed feature table.
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val occ = HashedClassifier.servedOccChar(s, dir)
    val lab = graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("lang").as("cls"))
    val (w, clsT) = HashedClassifier.nbModel(
      occ.filter(col("doc_id") % 2 === 0), lab)
    def key3(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2))
    assert(HashedClassifier.nbWeights(s, dir).collect().map(key3).sorted
      .sameElements(w.collect().map(key3).sorted))
    def key4(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(HashedClassifier.nbClassModel(s, dir).collect().map(key4).sorted
      .sameElements(clsT.collect().map(key4).sorted))
  }

  test("NB learns a real vocabulary split near-perfectly held out") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260817L)
    val vocabA = (0 until 20).map(i => s"alpha$i")
    val vocabB = (0 until 20).map(i => s"bravo$i")
    val shared = (0 until 10).map(i => s"common$i")
    def doc(own: Seq[String]): String =
      (0 until 40).map { _ =>
        if (rnd.nextInt(4) == 0) shared(rnd.nextInt(shared.size))
        else own(rnd.nextInt(own.size))
      }.mkString(" ")
    val docs = (0L until 120L).map { i =>
      val lang = if (i % 2 == 0 ^ i < 60) "aa" else "bb"
      (i, doc(if (lang == "aa") vocabA else vocabB), lang)
    }.toDF("doc_id", "text", "lang")
    val occ = HashedClassifier.hashedOccChar(
      Classifier.tk3(docs)).persist()
    val lab = docs.select(col("doc_id"), col("lang").as("cls"))
    val (w, clsT) = HashedClassifier.nbModel(
      occ.filter(col("doc_id") % 2 === 0), lab)
    val preds = HashedClassifier.nbArgmin(
      HashedClassifier.nbScores(occ.filter(col("doc_id") % 2 =!= 0),
        w, clsT))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val n = preds.count()
    val nOk = preds.filter(col("pred") === col("lang")).count()
    assert(n == 60L)
    assert(nOk >= 58L, s"held-out accuracy $nOk/$n — NB failed to " +
      "learn a genuinely separable vocabulary split")
  }
}
