package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val wall0 = System.nanoTime()
    def elapsed = (System.nanoTime() - wall0) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Wall-clock budget (seconds) for the WHOLE bench: the round driver
    // kills the process at an unpublished timeout (BENCH_r18: rc=124,
    // zero artifacts) — the optional third pass is skipped rather than
    // risk a DNF. 2400 s default ≈ well under every observed window
    // while leaving room for 3 full passes at sf0.1/local[32].
    val budget = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "2400").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen/JIT/parquet reader init) so the first
    // timed query measures itself, not JVM startup.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // SPARK_GRAFT_ONLY (comma-separated names): local-iteration filter —
    // the round driver never sets it, so the contract output is unchanged
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.view.filterKeys(names).toMap)
    // Pre-build every build-once store in the WARMUP phase (r18 verdict
    // #1; guide §1 — measure the serve path): with the builds pre-paid,
    // pass 1 no longer carries ~4 min of one-off store construction, so
    // (a) passes compare like with like and the spread trigger stops
    // firing on build noise, and (b) the whole bench fits the driver's
    // window. Skipped under SPARK_GRAFT_ONLY (local iteration on a
    // store-free query shouldn't pay every family's build).
    if (only.isEmpty) Stores.prebuild(spark, sfDir)
    System.err.println(f"[bench] warmup + store prebuild done at $elapsed%.1f s")
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    // Returns (elapsed, succeeded): a failed sample's elapsed is a
    // fast-failure artifact, so the min below only considers successful
    // samples — otherwise a transient failure in one pass would
    // under-report the query while it also sits in the errors array.
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      spark.sparkContext.setJobDescription(s"bench: $name")
      val t0 = System.nanoTime()
      // Checksum over every output column, not count(): a bare count lets
      // Catalyst prune projections/sorts that don't affect cardinality, so
      // map-only queries would be under-measured. xxhash64(struct(*))
      // forces every column to be computed; one long leaves the executors.
      // bit_xor (not sum): order-independent and can't hit ANSI overflow.
      val ok =
        try { fn(spark, sfDir).selectExpr("bit_xor(xxhash64(struct(*)))").collect(); true } catch {
          case e: Throwable =>
            failed += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // drop per-query persisted intermediates
      // Drop the query's localCheckpoint leaves too (clearCache only
      // covers Dataset persists): 38 checkpoint call sites × 235 queries
      // × 3 passes otherwise accumulate per-JVM until the block manager
      // degrades into the GC'd-accumulator churn visible in the r18 kill
      // tail. Safe between queries: every returned frame is discarded
      // after its collect, and no store holds RDD state (catalog stores
      // hold parquet paths).
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sparkContext.setJobDescription(null)
      (dt, ok)
    }
    // Two full passes, report the per-query MIN: host noise on this box
    // swings identical queries up to 10× between runs (BENCH_NOTES.md), so
    // a single sample is nearly signal-free round-to-round. The min of two
    // independent samples estimates the noise floor — what the code costs —
    // while a mean would average the noise back in. Whole-suite passes (not
    // back-to-back per query) so the second sample isn't flattered by a
    // still-warm page cache for exactly its own inputs.
    def runPass() = selected.map { case (name, fn) => name -> timeOne(name, fn) }
    def passTotal(p: Map[String, (Double, Boolean)]) =
      p.values.collect { case (t, true) => t }.sum
    // Pass-total spread over queries that succeeded in EVERY pass:
    // comparing ok-only totals of DIFFERENT query sets would let one
    // transiently-failed heavy query fabricate (or mask) spread.
    def totalSpread(ps: Seq[Map[String, (Double, Boolean)]]): Double = {
      val okEverywhere = ps.map(_.collect { case (n, (_, true)) => n }.toSet)
        .reduce(_ intersect _)
      val ts = ps.map(_.view.filterKeys(okEverywhere).values.map(_._1).sum)
      if (ts.nonEmpty && ts.min > 0) ts.max / ts.min else 1.0
    }
    def f(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // Per-pass artifact, written INCREMENTALLY after every pass (r18: the
    // driver timeout destroyed all evidence because the file was written
    // only at completion): the stdout contract line only fits the totals
    // (~2000-char driver budget), so pass-level attribution questions
    // (warmup vs noise vs real regression, VERDICT r8 #1/#8) need the
    // full per-query timings here. The round driver runs bench from the
    // repo root and its round-end commit sweeps uncommitted files, so
    // the file rides along as an archived artifact.
    def writePasses(passes: Seq[Map[String, (Double, Boolean)]]): Unit =
      try {
        val passesJson = passes.zipWithIndex.map { case (p, i) =>
          val qj = p.map { case (k, (t, ok1)) =>
            "\"" + k + "\":" + (if (ok1) f(t) else "null")
          }.mkString("{", ",", "}")
          s"""{"pass":${i + 1},"total":${f(passTotal(p))},"queries":$qj}"""
        }.mkString("[\n", ",\n", "\n]")
        // the per-query MIN-of-passes map, full names — the figures the
        // round compares; the stdout contract line no longer carries them
        val minJson = passes.head.keys.map { name =>
          val okTimes = passes.map(_(name)).collect { case (t, true) => t }
          "\"" + name + "\":" +
            (if (okTimes.nonEmpty) f(okTimes.min) else "null")
        }.mkString("{", ",", "}")
        java.nio.file.Files.write(java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_PASSES_OUT", "BENCH_PASSES.json")),
          (s"""{"sf":"$sfDir","spread":${f(totalSpread(passes))},""" +
            s""""min":$minJson,"passes":$passesJson}\n""").getBytes("UTF-8"))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not write BENCH_PASSES.json: ${e.getMessage}")
      }
    var passes = Seq.empty[Map[String, (Double, Boolean)]]
    def onePass(): Unit = {
      val t0 = elapsed
      passes = passes :+ runPass()
      writePasses(passes)
      System.err.println(
        f"[bench] pass ${passes.size} wall ${elapsed - t0}%.1f s (total $elapsed%.1f s)")
    }
    onePass()
    onePass()
    // When the two pass totals disagree by >1.3× the host was noisy during
    // one of them; a third independent sample tightens the min-estimate
    // (VERDICT r8 #2 — three queries swung 1.6–2.0× on unchanged code) —
    // but ONLY if it fits the wall-clock budget: a DNF (r18) loses the
    // whole artifact, which is strictly worse than a noisier min.
    if (totalSpread(passes) > 1.3) {
      val passCost = passes.map(passTotal).max
      if (elapsed + 1.2 * passCost < budget) {
        System.err.println(
          f"[bench] pass spread ${totalSpread(passes)}%.2f > 1.3 — running a third pass")
        onePass()
      } else
        System.err.println(
          f"[bench] pass spread ${totalSpread(passes)}%.2f > 1.3 but " +
            f"$elapsed%.0f s elapsed + ~$passCost%.0f s pass would breach " +
            f"the $budget%.0f s budget — keeping two passes")
    }
    val spread = totalSpread(passes)
    // Log both pass totals AND per-query figures so future rounds can
    // attribute the pass-1 vs pass-2 spread (JIT/codegen warmup — pass 1
    // compiles every generated class; pass 2 reuses them, BENCH_NOTES.md
    // §Warmup) without chasing phantom per-query regressions. stderr, not
    // the stdout contract line: the driver retains only ~2000 stdout
    // chars. Successful samples only — a fast-failing query would
    // otherwise deflate its pass total and fabricate spread.
    passes.zipWithIndex.foreach { case (p, i) =>
      val ok = passTotal(p)
      val nFail = p.values.count(!_._2)
      System.err.println(f"[bench] pass ${i + 1} total: $ok%.3f s" +
        (if (nFail > 0) s" ($nFail failed queries excluded)" else ""))
      System.err.println(s"[bench] pass ${i + 1} queries: " + p.map { case (k, (t, ok1)) =>
        "\"" + k.takeWhile(_ != '_') + "\":" + (if (ok1) f(t) else "null")
      }.mkString("{", ",", "}"))
    }
    val results = passes.head.map { case (name, _) =>
      val samples = passes.map(_(name))
      val okTimes = samples.collect { case (t, true) => t }
      // min over SUCCESSFUL samples; only when every pass fails does the
      // (meaningless) failure time stand in, and the errors array flags it.
      name -> (if (okTimes.nonEmpty) okTimes.min else samples.map(_._1).min)
    }
    // The driver only retains the last ~2000 chars of stdout. Even the
    // compact qNN per-query map overflowed that at 155 queries
    // (BENCH_r13.json: "parsed": null — the round-2 truncation bug
    // reintroduced by query-count growth), so the stdout contract line
    // now carries ONLY totals + errors; per-query timings (all passes +
    // the min map) live in the committed BENCH_PASSES.json artifact,
    // and the per-query map goes to stderr for eyeball runs.
    val qs = results.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + f(v) }
      .mkString("{", ",", "}")
    System.err.println(s"[bench] min-of-passes queries: $qs")
    System.err.println(f"[bench] spread $spread%.3f, wall $elapsed%.1f s")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","n_queries":${results.size},"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
