package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Automated plan-quality audit: every declared query's physical plan
  * must be the plan you'd WANT at scale — no accidental cartesian
  * blowups, whole-stage codegen present. Queries whose semantics
  * genuinely need an all-pairs or scalar-broadcast shape are
  * whitelisted explicitly, so a regression that silently degrades a
  * join to nested-loop fails the build.
  */
class PlanAuditSpec extends SparkSpec {

  private val allPairsByDesign = Set(
    "q50_nn_brute", // brute-force baseline: the cross join IS the query
    "q19_above_avg_parts", // scalar subquery = 1-row broadcast cross join
    "q49_mixture_sample", // 1-row max-sqrt scalar broadcast to the counts
    "q90_training_manifest", // same 1-row max-sqrt scalar broadcast as q49
    "q53_ann_ivf", // nCells-row centroid broadcast + 50-query × corpus
                   // brute cross join: the recall-contract baseline
    "q59_bm25_search", // 1-row corpus-stats broadcast to every doc
    "q86_pq_adc_topk" // flat-PQ ADC scan: the 50-query LUT broadcast
                      // against every 32-bit code IS the query shape
    // q81/q87/q91/q97/q98 carried a probe-stage centroid crossJoin
    // until round 8; the compiled top_cells kernel removed it — the
    // serving paths are now all equi-joins and must STAY that way
  )

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      // materialized stages hide their subtree behind a childless wrapper
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectAll(q.plan)
      case _ => Seq(p)
    }
    here ++ p.children.flatMap(collectAll) ++
      p.subqueries.flatMap(collectAll)
  }

  test("no accidental cartesian/nested-loop joins in any query plan") {
    SparkEntry.queries
      .filterNot { case (n, _) => allPairsByDesign(n) }
      .foreach { case (name, fn) =>
        val plan = fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan
        val bad = collectAll(plan).filter {
          case _: CartesianProductExec => true
          case _: BroadcastNestedLoopJoinExec => true
          case _ => false
        }
        assert(bad.isEmpty,
          s"$name contains ${bad.map(_.nodeName).mkString(", ")} — " +
            "an equi-key or bucket structure is missing")
        spark.catalog.clearCache()
      }
  }

  test("filter pushdown and column pruning reach the parquet scan (q01)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")
    val scans = collectAll(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "no FileSourceScan in q01's plan")
    val scan = scans.head
    // the shipdate predicate must reach the parquet reader, not run post-scan
    assert(scan.metadata("PushedFilters").contains("LessThanOrEqual(l_shipdate"),
      s"filter not pushed: ${scan.metadata("PushedFilters")}")
    // only the 7 referenced columns may be read — a scan of all 16
    // lineitem columns for this query would be a pruning regression
    assert(scan.requiredSchema.fieldNames.toSet == Set(
      "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
      "l_discount", "l_tax", "l_shipdate"),
      s"column pruning lost: ${scan.requiredSchema.fieldNames.mkString(",")}")
  }

  test("aggregates are partial (map-side combine) before the exchange (q01)") {
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan
    // a partial HashAggregate must sit below the shuffle: the exchange
    // then carries one row per (group × map task), not per input row
    def hasPartialBelowShuffle(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      collectAll(p).exists {
        case e: ShuffleExchangeExec =>
          collectAll(e.child).exists {
            case h: HashAggregateExec =>
              h.aggregateExpressions.forall(_.mode.toString == "Partial")
            case _ => false
          }
        case _ => false
      }
    assert(hasPartialBelowShuffle(plan),
      s"no map-side partial aggregation:\n${plan.treeString.take(1500)}")
  }

  test("dimension joins broadcast (q03): no shuffle on the small side") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val df = SparkEntry.queries("q03_region_revenue")(spark, "/root/testdata/sf0.001")
    df.collect() // finalize AQE
    val broadcasts = collectAll(df.queryExecution.executedPlan)
      .collect { case b: BroadcastHashJoinExec => b }
    assert(broadcasts.nonEmpty,
      "q03's region/nation dims should join as BroadcastHashJoin")
  }

  test("shuffle budgets hold: no query silently grows an exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // Every shuffle at 100 TB is a full-corpus network pass, so the
    // exchange COUNT is part of each operator's design contract — a
    // refactor that reintroduces (say) a crossJoin+window probe or
    // drops a partial aggregation shows up here as an extra exchange
    // long before it shows up as a benchmark regression. Budgets are
    // the measured counts of the current plans (AQE-final, sf0.001).
    val budgets = Map(
      "q01_pricing_summary" -> 2, // partial+final agg, ordered output
      "q03_region_revenue" -> 2, // dims broadcast: only agg + sort move
      "q08_orders_per_customer" -> 2,
      "q40_dedup_exact" -> 2, // ONE content shuffle + ordered output
      "q41_dedup_minhash_lsh" -> 4, // bucket sizes, pairs, verify joins
      "q81_ann_ivf_served" -> 2, // probe kernel: cell join + rank only
      "q84_semantic_dedup" -> 4, // cells, caps, pair verify, summary
      "q87_ivf_pq_topk" -> 2, // (cell, code) join + per-query rank
      "q96_ivf_build_exact" -> 1, // per-sweep (cell, dim) partial agg
      "q102_cms_sketch" -> 3, // token counts, cell agg, ordered output
      "q103_cms_heavy_hitters" -> 3)
    budgets.foreach { case (name, budget) =>
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect() // finalize AQE
      val n = collectAll(df.queryExecution.executedPlan)
        .count(_.isInstanceOf[ShuffleExchangeExec])
      assert(n <= budget,
        s"$name now plans $n shuffle exchanges (budget $budget) — " +
          "a shuffle crept into the operator")
      spark.catalog.clearCache()
    }
  }

  test("whole-stage codegen is present in the relational plans") {
    Seq("q01_pricing_summary", "q03_region_revenue", "q05_top_urgent_revenue",
      "q13_top3_orders_per_priority", "q24_asof_last_order",
      "q36_topk_docs_per_source", "q39_exact_stats", "q47_sequence_packing")
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        df.collect() // finalize AQE on THIS plan (count() builds another)
        val tree = df.queryExecution.executedPlan.treeString
        // "*(n) " prefixes mark WholeStageCodegen spans (AQE nests the
        // actual nodes inside QueryStageExec wrappers with no children)
        assert(tree.contains("*("),
          s"$name lost whole-stage codegen:\n${tree.take(2000)}")
      }
  }
}
