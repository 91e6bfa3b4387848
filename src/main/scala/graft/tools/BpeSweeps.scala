package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batched-BPE scale measurement (round-15 evidence for BENCH_NOTES):
  * train R ≈ 200 byte-level merges — a vocabulary size an actual
  * tokenizer pass would use, far past q156's R = 12 fixture proof —
  * over the customer-name word table (15k distinct words at sf0.1; the
  * documents fixture's 31-word vocabulary saturates below R = 150),
  * sequentially and batched at k ∈ {8, 16}, asserting the batched
  * merge tables replay the sequential one BIT FOR BIT (the
  * ext/Bpe.scala disjoint-prefix law at real scale) and printing one
  * JSON line with driver round-trips (sweeps) + wall seconds per
  * variant. Spec-gated measurement, no oracle: the equivalence oracle
  * is q156 / BpeSpec's property case; this run is the R/k evidence.
  *
  * Two corpora because they probe OPPOSITE regimes of the
  * disjoint-prefix law: `documents` text has Zipfian pair counts
  * (strict decreases common → deep prefixes, sweeps ≪ R);
  * `customer` names are id-shaped (near-uniform digit-pair counts →
  * ties everywhere, and the strictness condition CORRECTLY stops the
  * prefix at every tie rather than batch unsoundly — sweeps ≈ R,
  * equality still exact). Both ends belong in the evidence table.
  *
  * Usage: run_main.sh graft.tools.BpeSweeps [sfDir] [rounds] [corpus]
  */
object BpeSweeps {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(200)
    val corpus = args.lift(2).getOrElse("customer")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warm

    val src = corpus match {
      case "customer" => spark.read.parquet(s"$sfDir/customer.parquet")
        .select(col("c_name").as("text"))
      case "documents" => spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("text"))
      case other => sys.error(s"bpe sweeps: unknown corpus $other")
    }
    val wc = graft.ext.Bpe.wordCounts(src)
      .localCheckpoint() // one materialization; every variant trains from it
    val nWords = wc.count()

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (seq, seqWall) = time(
      graft.ext.Bpe.trainMergesFromCounts(wc, rounds, byteLevel = true))
    val batched = Seq(8, 16).map { k =>
      val ((m, sweeps), wall) = time(
        graft.ext.Bpe.trainMergesBatchedWithSweeps(wc, rounds, k,
          byteLevel = true))
      require(m == seq,
        s"batched k=$k diverged from sequential at R=$rounds")
      (k, sweeps, wall)
    }
    // Greedy-disjoint mode (q208's trade): NOT sequential-equal by
    // design, so no equality require — report the sweep count and how
    // many of its merges match the sequential table (the honest
    // divergence figure next to the throughput win).
    val greedy = Seq(8, 16).map { k =>
      val ((m, sweeps), wall) = time(
        graft.ext.Bpe.trainMergesGreedyUntil(wc, rounds, k, byteLevel = true))
      // Compare only the (l, r) pair: a greedy merge can match the
      // sequential table in WHAT it merges while carrying a different
      // at-acceptance count (different merge history), and counting
      // full-tuple equality would understate agreement.
      val matching = m.zip(seq).count { case (a, b) =>
        (a._2, a._3) == (b._2, b._3)
      }
      (k, sweeps, wall, matching)
    }
    // Locale.ROOT: the default-locale f-interpolator writes "63,3" under
    // comma-decimal locales, which is invalid JSON.
    def js(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))
    val body = batched.map { case (k, sweeps, wall) =>
      s""""k$k":{"sweeps":$sweeps,"wall_sec":${js(wall)}}"""
    }.mkString(",")
    val gbody = greedy.map { case (k, sweeps, wall, matching) =>
      s""""greedy_k$k":{"sweeps":$sweeps,"wall_sec":${js(wall)},"seq_prefix_match":$matching}"""
    }.mkString(",")
    println(s"""{"tool":"bpe_sweeps","sf_dir":"$sfDir","corpus":"$corpus","rounds":$rounds,""" +
      s""""distinct_words":$nWords,"sequential":{"sweeps":$rounds,""" +
      s""""wall_sec":${js(seqWall)}},$body,$gbody,"equal":true}""")
    spark.stop()
  }
}
