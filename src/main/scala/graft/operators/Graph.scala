package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph primitives over edge DataFrames.
  *
  * The one graph problem a dedup pipeline cannot avoid: near-dup PAIRS
  * are edges, but the unit of removal is the connected COMPONENT (doc A
  * ~ B ~ C must collapse to one survivor even if A and C never shared a
  * bucket). The reference has no iteration construct at all
  * (tools/tools.go is a linear step runner), so this is north-star
  * surface built the Spark way: a driver-side loop over declarative
  * per-round plans, state carried in DataFrames, lineage cut per round.
  */
object Graph {

  /** Connected components by min-label propagation: every node starts
    * labeled with itself; each round every node takes the min of its
    * label and its neighbors' labels; converged when no label changes.
    *
    * Returns (node, label) where label = the component's minimum node id
    * — exactly the "survivor" a dedup pass keeps.
    *
    * Scale shape: each round is one shuffle join (edges ⋈ labels on the
    * neighbor key) + one partial-aggregable min. Rounds = graph diameter,
    * and near-dup graphs are shallow (clusters are cliques-ish, diameter
    * 1-3). `localCheckpoint` after each round cuts the lineage so the
    * plan doesn't grow O(rounds); the convergence check is a count of
    * changed labels (an action per round — the standard Pregel-style
    * driver loop, nothing per-row on the driver). For web-scale graphs
    * with long chains, the alternating large-star/small-star algorithm
    * (Kiveris et al.) halves rounds; diameter-bounded dedup graphs don't
    * need it.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // neighbor labels, min-combined into each node's current label
      val neighborMin = sym.join(labels, sym("b") === labels("node"))
        .groupBy(sym("a").as("n2"))
        .agg(min(col("label")).as("nl"))
      val next = labels.join(neighborMin, labels("node") === col("n2"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint()
      val changed = next.as("n").join(labels.as("o"), "node")
        .filter(col("n.label") =!= col("o.label")).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    require(converged, s"connectedComponents: no fixpoint after $maxIter rounds")
    labels
  }

  /** Incremental connected components by GRAPH CONTRACTION: fold a batch
    * of NEW edges into an existing component assignment without
    * re-closing the old graph.
    *
    * `oldLabels` is the prior state — (node, label) with label = the
    * component's min node id, exactly [[connectedComponents]]' output
    * (in production: the cluster table read from the versioned catalog).
    * `newEdges` is the delta — every (a, b) pair that involves the new
    * batch (e.g. [[NearDup.minhashLshIncremental]]'s output). Old
    * endpoints contract to their prior label, so each old cluster enters
    * the merge as ONE node; min-label propagation then runs on a graph
    * whose size is ∝ the delta, never the corpus. Because an old
    * cluster's label IS its minimum member id, the contracted minimum
    * equals the full-graph minimum — the result is bit-identical to
    * re-running [[connectedComponents]] on old ∪ new edges (the q217
    * oracle proves this equality per run).
    *
    * Returns (node, repr, label) for every node of the merged graph:
    * `repr` = the contracted representative (prior label for old nodes,
    * self for new ones), `label` = the final component min id. Nodes of
    * old clusters untouched by the delta pass through unchanged.
    *
    * Scale shape: one left join to contract endpoints (delta-sized),
    * one CC over the contracted graph (rounds = its diameter — merges
    * are shallow star-unions), one delta-sized left join to relabel.
    * The corpus-sized `oldLabels` table is touched by exactly one
    * broadcast-able join against the delta's endpoint set and one
    * union into the output — no corpus-wide iteration. */
  def mergeComponents(oldLabels: DataFrame, newEdges: DataFrame): DataFrame = {
    val lbl = oldLabels.select(col("node").as("_n"), col("label").as("_l"))
    val ends = newEdges.select(col("a").as("node"))
      .unionAll(newEdges.select(col("b").as("node")))
      .distinct()
    // contracted representative per delta endpoint: the prior label when
    // the node was already clustered, itself otherwise (old singletons
    // and genuinely new nodes look the same to the merge)
    val endRepr = ends.join(lbl, ends("node") === lbl("_n"), "left")
      .select(col("node"), coalesce(col("_l"), col("node")).as("repr"))
    val ra = endRepr.select(col("node").as("a"), col("repr").as("ra"))
    val rb = endRepr.select(col("node").as("b"), col("repr").as("rb"))
    // edges between representatives; edges inside one old cluster vanish
    val contracted = newEdges
      .join(ra, "a").join(rb, "b")
      .filter(col("ra") =!= col("rb"))
      .select(col("ra").as("a"), col("rb").as("b"))
    val small = connectedComponents(contracted)
      .select(col("node").as("repr"), col("label").as("flbl"))
    // merged node set: every previously-clustered node + every delta
    // endpoint (old endpoints appear in both with the SAME repr — the
    // distinct collapses them)
    val allNodes = oldLabels.select(col("node"), col("label").as("repr"))
      .unionAll(endRepr)
      .distinct()
    allNodes.join(small, Seq("repr"), "left")
      .select(col("node"), col("repr"),
        coalesce(col("flbl"), col("repr")).as("label"))
  }

  /** Fixed-iteration PageRank in exact int64 arithmetic: ranks live in
    * `scale`-ths (millionths by default), each node contributes
    * `rank div outdeg` to its out-neighbors, and the damped update is
    * `0.15·scale + (85·Σcontrib) div 100` — every operation is integer,
    * so any engine reproduces the ranks bit-for-bit (floating-point
    * PageRank never survives a cross-engine hash compare). Dangling
    * nodes keep receiving but stop redistributing — the standard
    * simplified variant; add self-loops upstream if mass conservation
    * matters.
    *
    * Scale shape: one equi-join + partial-aggregable sum per iteration
    * (the classic Pregel round as declarative plans); `localCheckpoint`
    * every `ckptEvery` rounds cuts lineage so the plan doesn't grow
    * O(iters), without paying an eager materialization barrier EVERY
    * round — for short fixed runs (the default 3) the whole chain
    * executes as one job. Fixed iteration count, not convergence —
    * rank ordering stabilizes in a handful of rounds and a
    * deterministic round count keeps the result reproducible and
    * oracle-expressible (each round = one SQL CTE).
    */
  def pageRank(edges: DataFrame, iters: Int = 3, scale: Long = 1000000L,
      ckptEvery: Int = 4, edgesDistinct: Boolean = false): DataFrame = {
    require(ckptEvery > 0,
      s"pageRank: ckptEvery must be positive (got $ckptEvery) — 0 would " +
        "divide by zero and a negative value would never cut lineage")
    // LAZY checkpoints (eager = false): construction schedules no jobs —
    // the base tables materialize on the first action that needs them
    // and are reused across all rounds from then on, exactly like the
    // eager form, minus 3 up-front job barriers. At fixture scale those
    // barriers blocked construction (the r11 verdict's q75 cold/warm
    // split); at cluster scale they serialize scheduling the same way.
    // Dropping the checkpoints ENTIRELY measures ~1.8x slower at sf0.1
    // (6.9 vs 3.8 s bench-contract): ReuseExchange does not dedup the
    // repeated distinct/deg subtrees across the per-round joins, so each
    // round recomputes them. The ROUND-cadence checkpoints below stay
    // eager: cutting lineage mid-loop is their whole point.
    //
    // `edgesDistinct` (r19): a caller whose edge table is distinct BY
    // CONSTRUCTION (q75 mirrors a deduped pair list across disjoint id
    // namespaces) skips the defensive distinct — one full edge-table
    // shuffle fewer before the loop even starts (guide §2.4).
    val e0 = edges.select(col("src"), col("dst"))
    val e = if (edgesDistinct) e0 else e0.distinct()
    // ONE exchange builds the loop's co-partitioned degree-attached
    // edge table (r19; guide §2.4 "share one exchange"): hash by src,
    // then deg as a window count over that same partitioning — the
    // former groupBy+join spent TWO more edge-scale exchanges (the
    // partial-agg shuffle and the join's re-exchange of e) to attach
    // the same column. The window's per-partition sort is local work;
    // its output keeps the hashpartitioning(src) the rounds join on.
    val eP = e.repartition(col("src"))
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .localCheckpoint(eager = false)
    val nodes = eP.select(col("src").as("id"))
      .unionAll(eP.select(col("dst").as("id"))).distinct()
    pageRankRounds(eP, nodes, iters, scale, ckptEvery,
      eDegPartitioned = true)
  }

  /** The rank-iteration loop over a PRE-BUILT degree-attached edge
    * table (src, dst, deg) and node table (id) — the serving entry
    * point (q146): when the base tables are persisted catalog
    * artifacts (graph-as-data, the index-as-data discipline), repeated
    * rank runs skip the distinct/degree materialization entirely and
    * each round re-reads columnar files instead of recomputing
    * subtrees — the files ARE the checkpoint. */
  def pageRankRounds(eDeg: DataFrame, nodes: DataFrame, iters: Int,
      scale: Long = 1000000L, ckptEvery: Int = 4,
      eDegPartitioned: Boolean = false): DataFrame = {
    require(ckptEvery > 0,
      s"pageRank: ckptEvery must be positive (got $ckptEvery) — 0 would " +
        "divide by zero and a negative value would never cut lineage")
    // CO-PARTITION the loop-invariant tables ONCE, baked into lazy
    // checkpoints (round-17 measurement, q75 3.9 → 2.4 s at sf0.1):
    // every round joins eDeg.src = ranks.id, and ranks emerges from a
    // groupBy(id) already hash-partitioned — with the edge table
    // pre-partitioned by src (and nodes by id for the damped-update
    // join), the BIG side shuffles once for the whole run and only
    // node-sized tables move per round. Checkpointed tables carry no
    // stats, so without this the planner sort-merge-joined with a
    // fresh edge-table exchange EVERY round — at 1000 executors the
    // difference between iters× and 1× edge traffic.
    // `eDegPartitioned` (r19): [[pageRank]] hands over a table that is
    // already hashpartitioned(src) AND lazily checkpointed — a second
    // repartition+checkpoint here would materialize one more full copy
    // of the edge table for nothing.
    val eP =
      if (eDegPartitioned) eDeg
      else eDeg.repartition(col("src")).localCheckpoint(eager = false)
    val nP = nodes.repartition(col("id")).localCheckpoint(eager = false)
    val base = (scale * 15L) / 100L
    var ranks = nP.withColumn("rank", lit(scale))
    for (round <- 1 to iters) {
      val contrib = eP.join(ranks, eP("src") === ranks("id"))
        .select(col("dst").as("id"), expr("rank div deg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      ranks = nP.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100"))
            .as("rank"))
      if (round % ckptEvery == 0 && round < iters) ranks = ranks.localCheckpoint()
    }
    // Round-18 closing measurement for the standing "batch rank rounds
    // per job" experiment: an eager AQE-off evaluation of the whole
    // 3-round plan (one statically-planned job, zero AQE stage
    // barriers) benched SLOWER than this lazy shape at sf0.1 warm
    // (5.18 s vs 4.66 s min-of-passes, idle box) — the wall clock is
    // the distinct + co-partitioned round work itself, not scheduling
    // floor, so the adjudication vs the single-process oracle is
    // permanent (BENCH_NOTES r18).
    ranks
  }
}
