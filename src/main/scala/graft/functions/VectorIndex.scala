package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Compiled IVF cell assignment: argmin squared-L2 over a fixed centroid
  * matrix. The declarative formulation (a fold over an array literal of
  * centroid structs, with a nested zip_with distance fold) evaluates
  * interpreted lambdas per centroid element — nCells × dim boxed ops per
  * row; this kernel runs the whole double loop in compiled JVM code and
  * participates in whole-stage codegen via a reference object. Ties
  * resolve to the lowest cell index, matching the fold's strict `<`.
  */
object VectorIndex {
  def nearestCell(fd: ArrayData, centroids: Array[Array[Double]]): Int = {
    if (centroids.length == 0)
      throw new IllegalArgumentException(
        "nearest_centroid: empty centroid matrix — the IVF index has no cells")
    val dims = fd.numElements()
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      // fail fast on dimension mismatch: silently truncating the loop
      // would assign vectors to wrong cells (one length compare per
      // centroid, negligible next to the dim loop)
      if (ctr.length != dims)
        throw new IllegalArgumentException(
          s"nearest_centroid: vector has $dims dims but centroid $c has ${ctr.length}")
      var d = 0.0
      var i = 0
      while (i < dims) {
        val diff = fd.getDouble(i) - ctr(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    // NaN input makes every compare false: best stays -1 and the caller
    // would group on a phantom cell id SILENTLY — fail fast like
    // PqEncode's no-finite-distance guard
    if (best < 0)
      throw new ArithmeticException(
        "nearest_centroid: no finite distance — vector contains NaN/Infinity " +
          "or overflows double")
    best
  }

  /** The `nProbe` nearest cells by (distance, cell) ascending — the
    * probe stage of IVF serving as ONE compiled kernel call per query
    * row. The declarative shape this replaces (crossJoin against a
    * broadcast centroid table + interpreted `zip_with`/`aggregate`
    * fold + a `row_number` window) materializes queries × nCells rows
    * through a per-query window — nothing at 16 cells, the scale-killer
    * at the 10⁵-cell design point with a corpus-sized query batch.
    * Here the queries × nCells intermediate never exists: distances
    * stay in one on-stack array and only the nProbe winners leave the
    * kernel. Distance folds ascending over dims ((x−c)² terms, same
    * IEEE sequence as the oracle's list_aggregate) and ties resolve to
    * the lower cell id, so the emitted set — in rank order — is
    * bit-identical to the window formulation's. */
  def topCells(fd: ArrayData, centroids: Array[Array[Double]], nProbe: Int)
      : ArrayData = {
    if (centroids.length == 0)
      throw new IllegalArgumentException(
        "top_cells: empty centroid matrix — the IVF index has no cells")
    val dims = fd.numElements()
    val n = centroids.length
    val ds = new Array[Double](n)
    var c = 0
    while (c < n) {
      val ctr = centroids(c)
      if (ctr.length != dims)
        throw new IllegalArgumentException(
          s"top_cells: vector has $dims dims but centroid $c has ${ctr.length}")
      var d = 0.0
      var i = 0
      while (i < dims) {
        val diff = fd.getDouble(i) - ctr(i)
        d += diff * diff
        i += 1
      }
      ds(c) = d
      c += 1
    }
    selectTopByDistance(ds, null, nProbe, "top_cells")
  }

  /** Selection of the `w` smallest (distance, id) entries, ids emitted
    * in rank order — shared by the flat and two-level probe kernels so
    * the (dist, cell)-ascending tie rule is ONE piece of code. `ids`
    * maps candidate position → cell id (null = position IS the id).
    * w passes over ≤ nCells entries — selection beats a heap at probe
    * widths (w ≤ ~8) and keeps the loop branch-predictable. NaN
    * distances compare false everywhere: a slot that cannot fill
    * fails fast (the NearestCentroid guard), never emits a phantom
    * cell. nProbe < 1 throws rather than silently clamping up: the
    * removed declarative probe emitted ZERO rows for that degenerate
    * config, so serving answers from one arbitrary cell would be a
    * silent behavior change. */
  private[functions] def selectTopByDistance(
      ds: Array[Double], ids: Array[Int], w0: Int, name: String): ArrayData = {
    if (w0 < 1)
      throw new IllegalArgumentException(
        s"$name: nProbe must be >= 1, got $w0")
    val n = ds.length
    val w = math.min(w0, n)
    val out = new Array[Int](w)
    val taken = new Array[Boolean](n)
    var p = 0
    while (p < w) {
      var best = -1
      var bestId = Int.MaxValue
      var bestD = Double.MaxValue
      var c = 0
      while (c < n) {
        if (!taken(c)) {
          val id = if (ids == null) c else ids(c)
          if (ds(c) < bestD || (ds(c) == bestD && best >= 0 && id < bestId)) {
            bestD = ds(c); best = c; bestId = id
          }
        }
        c += 1
      }
      if (best < 0)
        throw new ArithmeticException(
          s"$name: no finite distance — vector contains NaN/Infinity " +
            "or overflows double")
      taken(best) = true
      out(p) = bestId
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Two-level (coarse-quantized) cell assignment — the 10⁵-cell form of
  * [[VectorIndex.nearestCell]]: the flat scan costs nCells × dim
  * mult-adds per vector, which at SemDeDup's paper-scale ~10⁵ cells ×
  * 64 dims is 6.4M FLOPs per vector — the wrong plan. Here cells are
  * grouped under ~√nCells super-cells (driver-side deterministic Lloyd
  * fit over the driver-small centroid table, [[fit]]); a vector probes
  * the `wProbe` nearest super-cells, then scans ONLY their member
  * cells: ~(√n + wProbe·√n)·dim evals ≈ 2√nCells·dim at wProbe=1 —
  * ~160× fewer FLOPs at 10⁵ cells. The standard IVF coarse-quantizer
  * trade: wProbe=1 may miss a nearest cell that sits just across a
  * super-cell boundary (assignment stays a valid cell, SemDeDup
  * semantics degrade gracefully — a borderline vector lands in a
  * neighboring cluster); wProbe = nCoarse reproduces the flat scan
  * EXACTLY, ties and all (SemanticPqSpec pins both properties).
  * SCALE.md §Index builds states the cost arithmetic and the regime
  * (≳10⁴ cells) where this kernel replaces the flat one. */
object TwoLevelIndex {

  private[functions] def nearestIdx(
      v: Array[Double], mat: Array[Array[Double]]): Int = {
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < mat.length) {
      val ctr = mat(c)
      var d = 0.0
      var i = 0
      while (i < v.length) {
        val diff = v(i) - ctr(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    if (best < 0) // NaN centroid table: cnt(-1) in fit would AIOOBE
      throw new ArithmeticException(
        "two_level_fit: no finite distance — centroid table contains NaN/Infinity")
    best
  }

  /** Deterministic driver-side Lloyd fit of `nCoarse` super-centroids
    * over the cell-centroid matrix (nCells rows — driver-small by the
    * same argument as the assignment kernel's reference object). No
    * RNG: seeds are evenly strided rows, ties resolve to the lowest
    * index, fixed `iters` sweeps. Returns (coarse matrix, member cell
    * ids per super-cell, ascending). Every cell appears in exactly one
    * member list.
    *
    * `fitSampleStride` is the driver-cost escape hatch (SCALE.md
    * §Assignment cost): the fit itself is O(iters·nCells·nCoarse·dim)
    * — ~2×10¹⁰ FLOPs at the 10⁵-cell design point, a tens-of-seconds
    * one-time stall. Supers only need APPROXIMATE boundaries, so the
    * Lloyd sweeps may run on every `stride`-th cell (cutting the fit
    * `stride`×) while the FINAL assignment still scans every cell:
    * membership stays a partition of ALL cells, every downstream
    * guarantee that holds for any partition (full probe ≡ flat scan,
    * ties included) is unaffected, and only wProbe<nCoarse boundary
    * quality can shift. Stride 1 (default) is the exact fit. */
  def fit(cents: Array[Array[Double]], nCoarse: Int, iters: Int = 10,
      fitSampleStride: Int = 1)
      : (Array[Array[Double]], Array[Array[Int]]) = {
    require(cents.nonEmpty, "two_level_fit: empty centroid matrix")
    require(fitSampleStride >= 1,
      s"two_level_fit: fitSampleStride must be >= 1, got $fitSampleStride")
    val n = cents.length
    val dim = cents(0).length
    require(cents.forall(_.length == dim),
      "two_level_fit: mixed centroid dimensionalities")
    // the sweep set: every stride-th cell (all of them at stride 1)
    val sample: Array[Array[Double]] =
      if (fitSampleStride == 1) cents
      else (0 until n by fitSampleStride).map(cents).toArray
    val m = sample.length
    val k = math.max(1, math.min(nCoarse, m))
    val coarse = Array.tabulate(k)(i => sample((i.toLong * m / k).toInt).clone())
    val sAssign = new Array[Int](m)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < m) { sAssign(i) = nearestIdx(sample(i), coarse); i += 1 }
      val sums = Array.fill(k)(new Array[Double](dim))
      val cnt = new Array[Int](k)
      i = 0
      while (i < m) {
        val a = sAssign(i); cnt(a) += 1
        var d = 0
        while (d < dim) { sums(a)(d) += sample(i)(d); d += 1 }
        i += 1
      }
      var c = 0
      while (c < k) {
        // an emptied super-cell keeps its previous centroid (standard
        // Lloyd degenerate-cluster handling, deterministic)
        if (cnt(c) > 0) {
          var d = 0
          while (d < dim) { coarse(c)(d) = sums(c)(d) / cnt(c); d += 1 }
        }
        c += 1
      }
      it += 1
    }
    // final assignment covers EVERY cell, sampled fit or not — the
    // member lists must partition the full cell table
    val assign = new Array[Int](n)
    var i = 0
    while (i < n) { assign(i) = nearestIdx(cents(i), coarse); i += 1 }
    val members = Array.tabulate(k)(c =>
      (0 until n).filter(assign(_) == c).toArray)
    (coarse, members)
  }

  /** [[fit]] with ORACLE-EXPRESSIBLE arithmetic, for centroid tables
    * whose values are exact 1e-4 multiples (the md5-derived tables):
    * centroid sums accumulate as ×1e4 int64 — exact and ORDER-FREE, so
    * a SQL `SUM` reproduces them regardless of aggregation order — and
    * each mean materializes as the single division sumInt/(cnt·1e4),
    * identical IEEE on any engine. [[fit]]'s double accumulation is
    * order-dependent (fine for the engine, unmirrorable in SQL); this
    * variant lets the PARTIAL-probe assignment be hash-checked (q94)
    * by unrolling the `iters` Lloyd sweeps as oracle CTEs. Same seeds,
    * same tie rules, same empty-super-cell carryover as [[fit]]. */
  def fitExact(cents: Array[Array[Double]], nCoarse: Int, iters: Int = 10)
      : (Array[Array[Double]], Array[Array[Int]]) = {
    require(cents.nonEmpty, "two_level_fit_exact: empty centroid matrix")
    val n = cents.length
    val dim = cents(0).length
    require(cents.forall(_.length == dim),
      "two_level_fit_exact: mixed centroid dimensionalities")
    val ci: Array[Array[Long]] = cents.map(_.map { v =>
      val k = math.round(v * 1e4)
      require(k / 1e4 == v,
        "two_level_fit_exact: centroid values must be exact 1e-4 multiples " +
          "(md5-derived tables are; KMeans output is not — use fit)")
      k
    })
    val k = math.max(1, math.min(nCoarse, n))
    // coarse state as (int sum per dim, member count): the mean NEVER
    // exists as an accumulated double, only as one division on demand
    val sums = Array.tabulate(k)(i => ci((i.toLong * n / k).toInt).clone())
    val cnts = Array.fill(k)(1L)
    def mean(c: Int, d: Int): Double =
      sums(c)(d).toDouble / (cnts(c) * 10000L).toDouble
    val assign = new Array[Int](n)
    // materialize the k×dim means once per sweep (the SQL mirror's mv_i
    // does the same) and reuse nearestIdx — IEEE-identical to an inline
    // recompute, without n×k×dim redundant divisions per sweep
    def assignAll(): Unit = {
      val m = Array.tabulate(k, dim)(mean)
      var i = 0
      while (i < n) { assign(i) = nearestIdx(cents(i), m); i += 1 }
    }
    var it = 0
    while (it < iters) {
      assignAll()
      val ns = Array.fill(k)(new Array[Long](dim))
      val ncnt = Array.fill(k)(0L)
      var i = 0
      while (i < n) {
        val a = assign(i); ncnt(a) += 1
        var d = 0
        while (d < dim) { ns(a)(d) += ci(i)(d); d += 1 }
        i += 1
      }
      var c = 0
      while (c < k) { // empty super keeps its previous (sum, cnt) state
        if (ncnt(c) > 0) { sums(c) = ns(c); cnts(c) = ncnt(c) }
        c += 1
      }
      it += 1
    }
    assignAll()
    val coarse = Array.tabulate(k, dim)(mean)
    val members = Array.tabulate(k)(c => (0 until n).filter(assign(_) == c).toArray)
    (coarse, members)
  }

  /** The shared probe-selection prologue of [[nearestCellTwoLevel]]
    * and [[topCellsTwoLevel]]: copy the input vector, score every
    * super-centroid, and select the `wProbe` nearest NON-EMPTY
    * super-cells (distance ties to the lower super id — mirrored by
    * the oracle's `ORDER BY dist, j`). Returns (v, probed super ids,
    * count). ONE definition so the assignment and serving kernels can
    * never drift on the memberless-super skip or the tie rule. */
  private def probeSupers(fd: ArrayData,
      coarse: Array[Array[Double]], members: Array[Array[Int]],
      wProbe: Int): (Array[Double], Array[Int], Int) = {
    val dims = fd.numElements()
    val v = new Array[Double](dims)
    var i = 0
    while (i < dims) { v(i) = fd.getDouble(i); i += 1 }
    val nc = coarse.length
    val cd = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      val ctr = coarse(c)
      if (ctr.length != dims)
        throw new IllegalArgumentException(
          s"two_level_assign: vector has $dims dims but super-centroid $c has ${ctr.length}")
      var d = 0.0
      i = 0
      while (i < dims) { val diff = v(i) - ctr(i); d += diff * diff; i += 1 }
      cd(c) = d
      c += 1
    }
    val w = math.max(1, math.min(wProbe, nc))
    val probed = new Array[Int](w)
    val taken = new Array[Boolean](nc)
    var nProbed = 0
    var p = 0
    while (p < w) { // selection over ≤ √nCells entries, w passes — tiny
      var best = -1
      var bestD = Double.MaxValue
      c = 0
      while (c < nc) {
        // a super-cell emptied by the Lloyd fit keeps a (stale)
        // centroid — probing it would waste a wProbe slot, or throw
        // when EVERY probe lands empty: never select memberless supers
        if (!taken(c) && members(c).length > 0 && cd(c) < bestD) {
          bestD = cd(c); best = c
        }
        c += 1
      }
      if (best < 0) { p = w } // no selectable super-cell left (or NaN)
      else { probed(nProbed) = best; taken(best) = true; nProbed += 1; p += 1 }
    }
    if (nProbed == 0)
      throw new ArithmeticException(
        "two_level_assign: no probeable super-cell — vector contains " +
          "NaN/Infinity or every super-cell is empty")
    (v, probed, nProbed)
  }

  /** argmin cell over the `wProbe` nearest super-cells' members. Tie
    * rules match the flat scan: coarse probes break distance ties on
    * the lower super-cell id, and the final argmin breaks distance
    * ties on the lower CELL id — so wProbe = nCoarse is bit-identical
    * to [[VectorIndex.nearestCell]]. */
  def nearestCellTwoLevel(fd: ArrayData,
      coarse: Array[Array[Double]], members: Array[Array[Int]],
      centroids: Array[Array[Double]], wProbe: Int): Int = {
    val (v, probed, nProbed) = probeSupers(fd, coarse, members, wProbe)
    val dims = v.length
    var i = 0
    var bestCell = -1
    var bestD = Double.MaxValue
    var p = 0
    while (p < nProbed) {
      val mem = members(probed(p))
      var m = 0
      while (m < mem.length) {
        val cell = mem(m)
        val ctr = centroids(cell)
        if (ctr.length != dims)
          throw new IllegalArgumentException(
            s"two_level_assign: vector has $dims dims but centroid $cell has ${ctr.length}")
        var d = 0.0
        i = 0
        while (i < dims) { val diff = v(i) - ctr(i); d += diff * diff; i += 1 }
        if (d < bestD || (d == bestD && cell < bestCell)) { bestD = d; bestCell = cell }
        m += 1
      }
      p += 1
    }
    // probed supers are non-empty by selection, so a miss here means
    // every member distance compared false — the NaN case, same
    // fail-fast as the flat kernel
    if (bestCell < 0)
      throw new ArithmeticException(
        "two_level_assign: no finite member distance — vector contains " +
          "NaN/Infinity or overflows double")
    bestCell
  }

  /** The `nProbe` nearest cells AMONG the `wProbe` nearest super-cells'
    * members — [[VectorIndex.topCells]]'s two-level form, for the
    * serving probe stage at the ≳10⁴-cell design point: scoring all
    * nCells centroids per query costs nCells×dim FLOPs; probing wProbe
    * of ~√nCells supers scans only their members (~2√nCells·dim at
    * wProbe=1). Tie rules match [[topCells]] exactly ((dist, cell)
    * ascending, supers tie to the lower j), so wProbe = nCoarse emits
    * the bit-identical probe set in the bit-identical order. May emit
    * FEWER than nProbe cells when the probed supers hold fewer members
    * — the candidate set the caller scans shrinks accordingly, the
    * standard partial-probe recall trade. */
  def topCellsTwoLevel(fd: ArrayData,
      coarse: Array[Array[Double]], members: Array[Array[Int]],
      centroids: Array[Array[Double]], wProbe: Int, nProbe: Int): ArrayData = {
    val (v, probed, nProbed) = probeSupers(fd, coarse, members, wProbe)
    val dims = v.length
    var total = 0
    var p = 0
    while (p < nProbed) { total += members(probed(p)).length; p += 1 }
    val ids = new Array[Int](total)
    val ds = new Array[Double](total)
    var k = 0
    p = 0
    while (p < nProbed) {
      val mem = members(probed(p))
      var m = 0
      while (m < mem.length) {
        val cell = mem(m)
        val ctr = centroids(cell)
        if (ctr.length != dims)
          throw new IllegalArgumentException(
            s"two_level_probe: vector has $dims dims but centroid $cell has ${ctr.length}")
        var d = 0.0
        var i = 0
        while (i < dims) { val diff = v(i) - ctr(i); d += diff * diff; i += 1 }
        ids(k) = cell
        ds(k) = d
        k += 1
        m += 1
      }
      p += 1
    }
    VectorIndex.selectTopByDistance(ds, ids, nProbe, "two_level_probe")
  }
}

/** Structural equality for expressions that hold Array parameters:
  * case-class equality compares Array fields by REFERENCE, so two
  * identically-constructed kernels never compare equal — defeating
  * Catalyst common-subexpression elimination whenever the column is
  * duplicated in a plan. Implementors list the array fields once;
  * equality is (class, children, deep array contents). */
private[functions] trait ArrayParamEquality { self: Expression =>
  /** The Array-typed constructor params, in declaration order. */
  protected def arrayParams: Seq[AnyRef]
  /** The non-array, non-child constructor params. */
  protected def scalarParams: Seq[Any]

  override def equals(other: Any): Boolean = other match {
    case that: ArrayParamEquality =>
      getClass == that.getClass &&
        children == that.asInstanceOf[Expression].children &&
        scalarParams == that.scalarParams &&
        arrayParams.length == that.arrayParams.length &&
        arrayParams.zip(that.arrayParams).forall { case (a, b) =>
          java.util.Arrays.deepEquals(Array[AnyRef](a), Array[AnyRef](b))
        }
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(getClass, children, scalarParams,
      Integer.valueOf(java.util.Arrays.deepHashCode(arrayParams.toArray)))
}

/** array<double> vector → int cell id via the two-level coarse-quantized
  * scan ([[TwoLevelIndex.nearestCellTwoLevel]]). */
case class NearestCentroidTwoLevel(child: Expression,
    coarse: Array[Array[Double]], members: Array[Array[Int]],
    centroids: Array[Array[Double]], wProbe: Int)
    extends UnaryExpression with ArrayParamEquality {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "two_level_assign"
  override protected def arrayParams: Seq[AnyRef] = Seq(coarse, members, centroids)
  override protected def scalarParams: Seq[Any] = Seq(wProbe)

  override def nullSafeEval(input: Any): Any =
    TwoLevelIndex.nearestCellTwoLevel(
      input.asInstanceOf[ArrayData], coarse, members, centroids, wProbe)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coarseRef = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val memRef = ctx.addReferenceObj("members", members, "int[][]")
    val centRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TwoLevelIndex.nearestCellTwoLevel($c, $coarseRef, $memRef, $centRef, $wProbe)")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroidTwoLevel =
    copy(child = c)
}

/** array<double> vector → int cell id (argmin L2 against `centroids`,
  * whose row index IS the cell id — callers pass rows sorted by cell). */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with ArrayParamEquality {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  override protected def arrayParams: Seq[AnyRef] = Seq(centroids)
  override protected def scalarParams: Seq[Any] = Nil

  override def nullSafeEval(input: Any): Any =
    VectorIndex.nearestCell(input.asInstanceOf[ArrayData], centroids)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorIndex.nearestCell($c, $centRef)")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

/** array<double> query vector → array<int> of the nProbe nearest cell
  * ids in (dist, cell)-ascending rank order ([[VectorIndex.topCells]])
  * — the compiled IVF probe stage. */
case class TopCells(child: Expression, centroids: Array[Array[Double]],
    nProbe: Int) extends UnaryExpression with ArrayParamEquality {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells"
  override protected def arrayParams: Seq[AnyRef] = Seq(centroids)
  override protected def scalarParams: Seq[Any] = Seq(nProbe)

  override def nullSafeEval(input: Any): Any =
    VectorIndex.topCells(input.asInstanceOf[ArrayData], centroids, nProbe)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorIndex.topCells($c, $centRef, $nProbe)")
  }

  override protected def withNewChildInternal(c: Expression): TopCells =
    copy(child = c)
}

/** array<double> query vector → array<int> of ≤ nProbe nearest cell ids
  * among the wProbe nearest super-cells' members
  * ([[TwoLevelIndex.topCellsTwoLevel]]) — the probe stage at the
  * ≳10⁴-cell design point. */
case class TopCellsTwoLevel(child: Expression,
    coarse: Array[Array[Double]], members: Array[Array[Int]],
    centroids: Array[Array[Double]], wProbe: Int, nProbe: Int)
    extends UnaryExpression with ArrayParamEquality {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "two_level_probe"
  override protected def arrayParams: Seq[AnyRef] = Seq(coarse, members, centroids)
  override protected def scalarParams: Seq[Any] = Seq(wProbe, nProbe)

  override def nullSafeEval(input: Any): Any =
    TwoLevelIndex.topCellsTwoLevel(
      input.asInstanceOf[ArrayData], coarse, members, centroids, wProbe, nProbe)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coarseRef = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val memRef = ctx.addReferenceObj("members", members, "int[][]")
    val centRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TwoLevelIndex.topCellsTwoLevel($c, $coarseRef, $memRef, $centRef, $wProbe, $nProbe)")
  }

  override protected def withNewChildInternal(c: Expression): TopCellsTwoLevel =
    copy(child = c)
}

/** Compiled product-quantization encoder: split an `array<double>`
  * vector into M contiguous subspaces of `subDim` dims, assign each
  * subspace to its nearest of K sub-centroids (argmin squared-L2, ties
  * to the lowest code — same tie rule as [[NearestCentroid]]), and
  * return `array<bigint>` [packed_code, err_e9] where
  * packed_code = Σ_m code_m << (codeBits·m) and err_e9 = Σ_m
  * floor(minDist_m · 1e9) — the per-subspace distances fold ascending
  * over dims exactly like DuckDB's `list_aggregate(…, 'sum')`, and the
  * e9 flooring makes the cross-subspace sum exact integer arithmetic,
  * so both halves are bit-comparable across engines.
  *
  * This is the PQ compression step of an IVF-PQ index (Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011): a
  * 64-dim float vector becomes M·codeBits bits (8 subspaces × 16 codes
  * = 32 bits here vs 2048 for the raw floats — a 64× index shrink),
  * and err_e9 is the audit signal for codebook quality. One compiled
  * pass per row, zero shuffle — the same whole-stage-codegen rationale
  * as [[NearestCentroid]].
  */
object PqEncode {
  def encode(fd: ArrayData, codebooks: Array[Array[Array[Double]]])
      : ArrayData = {
    val m = codebooks.length
    if (m == 0 || m > 15)
      throw new IllegalArgumentException(
        s"pq_encode: need 1..15 subspaces to pack 4-bit codes into int64, got $m")
    val k = codebooks(0).length
    if (k == 0)
      throw new IllegalArgumentException(
        "pq_encode: subspace 0 has no codes — empty sub-codebook")
    if (k > 16)
      throw new IllegalArgumentException(
        s"pq_encode: $k codes per subspace; 4-bit packing caps at 16")
    val subDim = codebooks(0)(0).length
    if (fd.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${fd.numElements()} dims but $m subspaces " +
          s"of $subDim dims need ${m * subDim}")
    var code = 0L
    var errE9 = 0L
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      // ragged per-subspace code counts would decode fine here but
      // corrupt PqLut/PqAdc's uniform m×k layout at SERVING time —
      // fail at encode, where the bad codebook enters the index
      if (book.length != k)
        throw new IllegalArgumentException(
          s"pq_encode: subspace $s has ${book.length} codes, expected $k — " +
            "ragged codebooks break the uniform ADC LUT layout")
      val off = s * subDim
      var best = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val ctr = book(c)
        // ragged codebooks would silently truncate or AIOOBE mid-task;
        // fail fast like NearestCentroid's per-centroid length check
        if (ctr.length != subDim)
          throw new IllegalArgumentException(
            s"pq_encode: subspace $s centroid $c has ${ctr.length} dims, expected $subDim")
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val diff = fd.getDouble(off + i) - ctr(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      // NaN/Infinity input makes every `d < bestD` compare false: best
      // stays -1 and `-1L << …` would corrupt every higher nibble of
      // the packed code SILENTLY — the worst failure mode for an index
      if (best < 0)
        throw new ArithmeticException(
          s"pq_encode: no finite distance in subspace $s — vector " +
            "contains NaN/Infinity or overflows double")
      code |= best.toLong << (4 * s)
      errE9 += math.floor(bestD * 1e9).toLong
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(code, errE9))
  }
}

/** The query-side half of PQ asymmetric distance computation (ADC):
  * precompute, once per query vector, the e9-floored squared-L2 from
  * each of its M subvectors to every one of the K sub-centroids — an
  * M·K int64 lookup table. Scoring a candidate's packed code is then
  * M integer array reads + adds ([[PqAdc]]), no float math per
  * candidate: the 1024-mult table build amortizes over every candidate
  * the query scans (the Jégou et al. ADC trick). Distances fold
  * ascending over dims like [[PqEncode]], so lut[m·K + c] ==
  * floor(dist_m_c · 1e9) exactly as the oracle computes it.
  */
object PqLut {
  def build(fd: ArrayData, codebooks: Array[Array[Array[Double]]])
      : ArrayData = {
    val m = codebooks.length
    if (m == 0 || m > 15)
      throw new IllegalArgumentException(
        s"pq_lut: need 1..15 subspaces (adc packs 4-bit codes), got $m")
    val k = codebooks(0).length
    if (k == 0)
      throw new IllegalArgumentException(
        "pq_lut: subspace 0 has no codes — empty sub-codebook")
    if (k > 16)
      throw new IllegalArgumentException(
        s"pq_lut: $k codes per subspace; adc's 4-bit nibble extraction caps at 16")
    val subDim = codebooks(0)(0).length
    if (fd.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_lut: vector has ${fd.numElements()} dims but $m subspaces " +
          s"of $subDim dims need ${m * subDim}")
    val out = new Array[Long](m * k)
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      if (book.length != k)
        throw new IllegalArgumentException(
          s"pq_lut: subspace $s has ${book.length} codes, expected $k — " +
            "ragged code counts would corrupt the m×k LUT layout")
      val off = s * subDim
      var c = 0
      while (c < k) {
        val ctr = book(c)
        if (ctr.length != subDim)
          throw new IllegalArgumentException(
            s"pq_lut: subspace $s centroid $c has ${ctr.length} dims, expected $subDim")
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val diff = fd.getDouble(off + i) - ctr(i)
          d += diff * diff
          i += 1
        }
        out(s * k + c) = math.floor(d * 1e9).toLong
        c += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Σ_m lut[m·K + code_m] — integer-only candidate scoring. The code's
    * nibbles are bounds-checked against k: a corrupted code would
    * otherwise read ANOTHER subspace's LUT entry and return a wrong
    * distance instead of an error (one compare per subspace, noise
    * next to the array read). */
  def adc(lut: ArrayData, code: Long, m: Int, k: Int): Long = {
    var tot = 0L
    var s = 0
    while (s < m) {
      val c = ((code >> (4 * s)) & 15L).toInt
      if (c >= k)
        throw new IllegalArgumentException(
          s"pq_adc: code nibble $c in subspace $s out of range for $k codes")
      tot += lut.getLong(s * k + c)
      s += 1
    }
    tot
  }
}

/** array<double> query vector → array<bigint> M·K ADC lookup table. */
case class PqLutExpr(child: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with ArrayParamEquality {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "pq_lut"
  override protected def arrayParams: Seq[AnyRef] = Seq(codebooks)
  override protected def scalarParams: Seq[Any] = Nil

  override def nullSafeEval(input: Any): Any =
    PqLut.build(input.asInstanceOf[ArrayData], codebooks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqLut.build($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): PqLutExpr =
    copy(child = c)
}

/** (lut array<bigint>, packed code bigint) → ADC distance_e9 bigint. */
case class PqAdc(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(lut: Any, code: Any): Any =
    PqLut.adc(lut.asInstanceOf[ArrayData], code.asInstanceOf[Long], m, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c) =>
      s"graft.functions.PqLut.adc($l, $c, $m, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** array<double> vector → array<bigint> [packed PQ code, err_e9]. */
case class PqEncodeExpr(child: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with ArrayParamEquality {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override protected def arrayParams: Seq[AnyRef] = Seq(codebooks)
  override protected def scalarParams: Seq[Any] = Nil

  override def nullSafeEval(input: Any): Any =
    PqEncode.encode(input.asInstanceOf[ArrayData], codebooks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqEncode.encode($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

object VectorIndexFunctions {
  def nearestCentroid(fd: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(fd), centroids))

  /** Two-level assignment column: fit the coarse level once
    * ([[TwoLevelIndex.fit]], driver-side over the driver-small centroid
    * matrix) and pass its parts here. Use at ≳10⁴ cells where the flat
    * [[nearestCentroid]] scan's nCells×dim cost dominates (SCALE.md). */
  def nearestCentroidTwoLevel(fd: Column,
      coarse: Array[Array[Double]], members: Array[Array[Int]],
      centroids: Array[Array[Double]], wProbe: Int): Column =
    ColumnBridge.column(NearestCentroidTwoLevel(
      ColumnBridge.expression(fd), coarse, members, centroids, wProbe))

  /** Compiled flat probe: the nProbe nearest cells per query row, in
    * (dist, cell)-ascending rank order. */
  def topCells(fd: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    ColumnBridge.column(TopCells(ColumnBridge.expression(fd), centroids, nProbe))

  /** Compiled two-level probe — [[topCells]] restricted to the wProbe
    * nearest super-cells' members; wProbe = nCoarse is bit-identical
    * to the flat probe (use at ≳10⁴ cells, SCALE.md). */
  def topCellsTwoLevel(fd: Column,
      coarse: Array[Array[Double]], members: Array[Array[Int]],
      centroids: Array[Array[Double]], wProbe: Int, nProbe: Int): Column =
    ColumnBridge.column(TopCellsTwoLevel(
      ColumnBridge.expression(fd), coarse, members, centroids, wProbe, nProbe))

  def pqEncode(fd: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(fd), codebooks))

  def pqLut(fd: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqLutExpr(ColumnBridge.expression(fd), codebooks))

  def pqAdc(lut: Column, code: Column, m: Int, k: Int): Column =
    ColumnBridge.column(PqAdc(
      ColumnBridge.expression(lut), ColumnBridge.expression(code), m, k))

  /** md5-derived deterministic PQ codebook, shared with the oracle SQL:
    * value(m, c, d) = ((md5h60("pq m c d") mod 4001) - 2000) / 1e4 —
    * the same construction as q81's serving centroids, so any engine
    * rebuilds the identical codebook from the three indices alone. A
    * production build would fit per-subspace KMeans instead (sampled,
    * like [[graft.operators.SimilarityJoin.ivfBuildIndex]]) and persist
    * the books through the catalog; the encoding kernel is identical. */
  def pqCodebooks(m: Int, k: Int, subDim: Int): Array[Array[Array[Double]]] =
    Array.tabulate(m, k, subDim) { (s, c, d) =>
      ((HashKernels.md5h60(org.apache.spark.unsafe.types.UTF8String
        .fromString(s"pq $s $c $d")) % 4001L) - 2000L) / 10000.0
    }
}
