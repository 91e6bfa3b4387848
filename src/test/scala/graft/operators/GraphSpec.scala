package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class GraphSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Graph.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference union-find for the property check. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // min-id per component as the canonical label
    val byRoot = nodes.groupBy(find)
    nodes.map(n => n -> byRoot(find(n)).min).toMap
  }

  test("chain, pair, and triangle resolve to min-id components") {
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L))
    val got = cc(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("random graphs match union-find (property)") {
    val edgesGen = Gen.listOf(for {
      a <- Gen.choose(0L, 30L); b <- Gen.choose(0L, 30L) if a != b
    } yield (a, b)).suchThat(_.nonEmpty)
    (0 until 10).flatMap(i =>
      edgesGen.apply(Gen.Parameters.default, Seed(1234L + i))).foreach { edges =>
      assert(cc(edges) == unionFind(edges))
    }
  }

  private def merge(oldEdges: Seq[(Long, Long)],
      newEdges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val oldLabels = Graph.connectedComponents(oldEdges.toDF("a", "b"))
    Graph.mergeComponents(oldLabels, newEdges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  test("mergeComponents: delta fold equals full recompute (chain, star-union, singleton bridge)") {
    // old graph: {1,2} and {5,6}; delta bridges them through new node 9
    // and pulls in old singleton 7 (never in the old label table)
    val old1 = Seq((1L, 2L), (5L, 6L))
    val delta = Seq((2L, 9L), (9L, 5L), (7L, 9L), (30L, 31L))
    assert(merge(old1, delta) == unionFind(old1 ++ delta))
  }

  test("mergeComponents: empty delta endpoints pass old clusters through; label-only merges") {
    // delta edge connects two old LABELS directly (both endpoints old)
    val old1 = Seq((10L, 12L), (20L, 22L), (40L, 41L))
    val delta = Seq((12L, 22L))
    val got = merge(old1, delta)
    assert(got == unionFind(old1 ++ delta))
    assert(got(41L) == 40L) // untouched old cluster passes through
  }

  test("mergeComponents: random old/new splits match full union-find (property)") {
    val edgesGen = Gen.listOf(for {
      a <- Gen.choose(0L, 24L); b <- Gen.choose(0L, 24L) if a != b
    } yield (a, b)).suchThat(_.nonEmpty)
    (0 until 8).flatMap(i =>
      edgesGen.apply(Gen.Parameters.default, Seed(777L + i))).foreach { edges =>
      // the q217 split: "old" = both endpoints even, delta = the rest
      val (oldE, newE) = edges.partition(e => e._1 % 2 == 0 && e._2 % 2 == 0)
      if (newE.nonEmpty) {
        val got = merge(oldE, newE)
        val full = unionFind(edges)
        // merge output covers old-graph nodes + delta endpoints; full
        // union-find has the same node set here by construction
        assert(got == full, s"old=$oldE new=$newE")
      }
    }
  }

  test("pageRank: hub dominates a star; symmetric nodes tie; matches scalar model") {
    val s = spark
    import s.implicits._
    // undirected star: 1 is the hub, 2..5 are leaves
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val got = Graph.pageRank(star.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) > got(2L))
    assert(Set(got(2L), got(3L), got(4L), got(5L)).size == 1) // leaves tie
    assert(got == scalarPageRank(star, 3))
  }

  test("pageRank: checkpoint cadence is value-invariant and validated") {
    val s = spark
    import s.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    // iters=9 with ckptEvery=2 EXECUTES the mid-loop checkpoint branch
    // (rounds 2,4,6,8); ckptEvery=100 never does — results must agree
    // exactly (integer recurrence, checkpointing is pure materialization)
    def run(ck: Int) = Graph.pageRank(star.toDF("src", "dst"),
        iters = 9, ckptEvery = ck)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ckpted = run(2)
    assert(ckpted == run(100))
    assert(ckpted == scalarPageRank(star, 9))
    intercept[IllegalArgumentException] {
      Graph.pageRank(star.toDF("src", "dst"), iters = 3, ckptEvery = 0)
    }
  }

  /** Scalar replay of pageRank's exact integer recurrence. */
  private def scalarPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val distinctEdges = edges.distinct
    val nodes = distinctEdges.flatMap(e => Seq(e._1, e._2)).distinct
    val out = distinctEdges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var ranks = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, vs) <- out; v <- vs) contrib(v) += ranks(u) / vs.size
      ranks = nodes.map(n => n -> (150000L + 85L * contrib(n) / 100L)).toMap
    }
    ranks
  }

  test("pageRank: edgesDistinct=true on pre-deduped edges matches the defensive path") {
    val s = spark
    import s.implicits._
    // already-distinct digraph with asymmetric degrees so the window
    // degree count is exercised on partitions of different sizes
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 1L), (5L, 2L))
    def run(skip: Boolean) = Graph.pageRank(edges.toDF("src", "dst"),
        iters = 3, edgesDistinct = skip)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = run(true)
    assert(fast == run(false))
    assert(fast == scalarPageRank(edges, 3))
  }

  test("pageRank: random digraphs match the scalar model (property)") {
    val s = spark
    import s.implicits._
    val edgesGen = Gen.listOf(for {
      a <- Gen.choose(0L, 20L); b <- Gen.choose(0L, 20L) if a != b
    } yield (a, b)).suchThat(_.nonEmpty)
    (0 until 5).flatMap(i =>
      edgesGen.apply(Gen.Parameters.default, Seed(4321L + i))).foreach { edges =>
      val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == scalarPageRank(edges, 2), s"edges: $edges")
    }
  }
}
