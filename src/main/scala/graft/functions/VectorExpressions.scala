package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact int64 dot product of two `array<bigint>` columns.
  *
  * The scale path for similarity search: embeddings are pre-scaled to
  * exact int64 (TextDsl.scaledVec), and the pairwise kernel inside the
  * O(n·m) candidate loop must be compiled code, not an interpreted
  * higher-order-function chain — `aggregate(zip_with(a, b, _*_), …)`
  * allocates and interprets per element, ~100× slower, which dominates
  * wall-clock on a brute-force or LSH-bucketed neighbor join.
  *
  * Participates in whole-stage codegen via [[doGenCode]]: the loop below
  * compiles into the generated join-stage Java, reading the unsafe array
  * words directly with no boxing.
  *
  * Semantics match the HOF formulation for well-formed inputs (equal
  * lengths, no null elements — both guaranteed by scaledVec): sum over i
  * of a[i]*b[i] in wrapping int64 arithmetic.
  */
case class DotProductInt64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_int64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductInt64 =
    copy(left = newLeft, right = newRight)
}

/** Deterministic ±1 random projection (Johnson-Lindenstrauss sketch) of
  * an exact-int64 scaled vector: out[j] = Σ_i v[i]·sign(i,j), where the
  * sign matrix is derived from md5 (see [[VectorFunctions.rpSigns]]) so
  * any engine reproduces the projection bit-for-bit — a seeded RNG
  * would not.
  *
  * Int64 envelope — sized for the SQUARED-NORM consumer, not just the
  * coordinates: downstream code computes dot_int64(proj, proj) (q76),
  * so the binding constraint is Σ_j out[j]² < 2^63, i.e. |out[j]| ≤
  * √(2^63/k) ≈ 7.6e8 at k = 16 — NOT the ~1e10 per-coordinate bound
  * coordinates alone would allow. With scaledVec's ×1e7 inputs that
  * means |x| ≲ 1.1 per input float over 64 dims (unit-ish embeddings:
  * |x| < 0.5 → |out[j]| ≤ 3.2e8, half the envelope). [[project]]
  * enforces that the EXACT Σ out[j]² fits int64 (cheap envelope first,
  * overflow-checked exact norm only when the envelope trips) and throws
  * ArithmeticException on violation — Spark would otherwise WRAP the
  * downstream square silently where DuckDB errors, a cross-engine
  * divergence worse than a failure.
  *
  * The scale role: projecting 64→16 dims shrinks every downstream
  * shuffle and pairwise kernel 4× before LSH/IVF candidate generation —
  * the standard sketch-first layout for ANN over 100 TB of embeddings.
  * Compiled for the same reason as [[DotProductInt64]]: the HOF
  * formulation (transform over j of aggregate over i) re-evaluates the
  * child per output dim.
  */
case class SignedProject(child: Expression, signs: Array[Array[Long]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ArrayParamEquality {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "signed_project"
  override protected def arrayParams: Seq[AnyRef] = Seq(signs)
  override protected def scalarParams: Seq[Any] = Nil

  override def nullSafeEval(input: Any): Any =
    SignedProject.project(input.asInstanceOf[ArrayData], signs)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signs", signs, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignedProject.project($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): SignedProject =
    copy(child = c)
}

object SignedProject {
  def project(v: ArrayData, signs: Array[Array[Long]]): ArrayData = {
    val n = v.numElements()
    if (n != signs.length)
      throw new IllegalArgumentException(
        s"signed_project: vector has $n dims but the sign matrix has ${signs.length} rows")
    val k = if (signs.length == 0) 0 else signs(0).length
    val out = new Array[Long](k)
    var i = 0
    while (i < n) {
      val x = v.getLong(i)
      val row = signs(i)
      var j = 0
      while (j < k) { out(j) += x * row(j); j += 1 }
      i += 1
    }
    // Squared-norm guard (see class doc): dot_int64(out, out) must stay
    // inside int64. Two stages: the fast path checks the conservative
    // per-coordinate envelope |out[j]| ≤ √(2^63/k) — k compares per row,
    // noise next to the n×k multiply loop above — and only when a
    // coordinate exceeds it does the slow path compute the ACTUAL
    // Σ out[j]² with overflow-checked arithmetic, so a vector whose true
    // squared norm fits (one huge coordinate, rest ~0) is no longer
    // falsely rejected. Accept ⟺ the exact norm is representable — the
    // same predicate under which DuckDB's checked p*p/SUM arithmetic
    // succeeds, so cross-engine parity (Spark would otherwise WRAP where
    // DuckDB errors) is preserved exactly.
    if (k > 0) {
      val bound = (math.sqrt(Long.MaxValue.toDouble / k) - 1).toLong
      var needExact = false
      var j = 0
      while (j < k && !needExact) {
        if (out(j) > bound || out(j) < -bound) needExact = true
        j += 1
      }
      if (needExact) {
        // terms are non-negative, so every partial sum ≤ the total:
        // addExact overflowing ⟺ the full squared norm doesn't fit
        try {
          var s = 0L
          var i2 = 0
          while (i2 < k) {
            s = Math.addExact(s, Math.multiplyExact(out(i2), out(i2)))
            i2 += 1
          }
        } catch {
          case _: ArithmeticException =>
            throw new ArithmeticException(
              s"signed_project: Σ out[j]² overflows int64 for $k output " +
                "dims — input magnitudes too large for an exact int64 " +
                "projected norm")
        }
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Multi-table sign-LSH signatures of an exact-int64 scaled vector: the
  * sign matrix (inDims × L·bits, md5-derived like
  * [[VectorFunctions.rpSigns]] so both engines build it identically)
  * projects v once, then each consecutive group of `bits` projected
  * coordinates packs into one signature — out[t] = Σ_j (proj[t·bits+j]
  * ≥ 0 ? 1<<j : 0), one int64 bucket key per hash table.
  *
  * Why L tables instead of one: a single b-bit sign signature has ≤ 2^b
  * buckets and recall ~p^b (p = 1 − θ/π per hyperplane) — the failure
  * mode q166 measured on the single-table path (recall@3 = 66 bps).
  * Multi-table LSH (Indyk-Motwani; the Faiss/Datasketch default) unions
  * candidates across L independent tables: miss probability (1−p^b)^L
  * decays exponentially in L while per-table bucket selectivity stays
  * 2^b. The signature pack is ONE compiled pass (n·L·b multiply-adds
  * per row, map-side, whole-stage-codegen'd); no norm guard is needed
  * because only the projection SIGNS are consumed — the int64 envelope
  * for the raw coordinates (|Σ v_i| ≤ n·max|v| ≪ 2^63) cannot trip at
  * scaledVec magnitudes.
  */
case class SignLshSignatures(
    child: Expression, signs: Array[Array[Long]], bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ArrayParamEquality {
  require(bits >= 1 && bits <= 63, s"sign_lsh_sigs: bits must be 1..63, got $bits")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_lsh_sigs"
  override protected def arrayParams: Seq[AnyRef] = Seq(signs)
  override protected def scalarParams: Seq[Any] = Seq(bits)

  override def nullSafeEval(input: Any): Any =
    SignLshSignatures.signatures(input.asInstanceOf[ArrayData], signs, bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signs", signs, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignLshSignatures.signatures($c, $ref, $bits)")
  }

  override protected def withNewChildInternal(c: Expression): SignLshSignatures =
    copy(child = c)
}

object SignLshSignatures {
  def signatures(v: ArrayData, signs: Array[Array[Long]], bits: Int): ArrayData = {
    val n = v.numElements()
    if (n != signs.length)
      throw new IllegalArgumentException(
        s"sign_lsh_sigs: vector has $n dims but the sign matrix has ${signs.length} rows")
    val k = if (signs.length == 0) 0 else signs(0).length
    require(k % bits == 0,
      s"sign_lsh_sigs: $k projected dims do not split into $bits-bit tables")
    val proj = new Array[Long](k)
    var i = 0
    while (i < n) {
      val x = v.getLong(i)
      val row = signs(i)
      var j = 0
      while (j < k) { proj(j) += x * row(j); j += 1 }
      i += 1
    }
    val tables = k / bits
    val sigs = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var s = 0L
      var j = 0
      while (j < bits) {
        if (proj(t * bits + j) >= 0) s |= 1L << j
        j += 1
      }
      sigs(t) = s
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }
}

/** Morton/Z-order key: interleaves the low 31 bits of two non-negative
  * int64 keys (result bit 2i = a's bit i, 2i+1 = b's bit i — 62 bits,
  * always positive). Sorting by the interleaved key clusters rows into
  * rectangles of the (a, b) plane, so files hold bounded ranges of BOTH
  * columns and parquet min/max stats prune selective reads on either —
  * the multi-column generalization of single-key sort clustering.
  * Negative inputs fail fast (pre-rank or shift arbitrary keys first);
  * bits ≥ 31 are ignored, which only coarsens locality, never breaks
  * ordering correctness (the sort is still total via tiebreaks).
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.InterleaveBits.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  def interleave(a: Long, b: Long): Long = {
    if (a < 0 || b < 0)
      throw new IllegalArgumentException(
        s"interleave_bits: keys must be non-negative, got ($a, $b)")
    var out = 0L
    var i = 0
    while (i < 31) {
      out |= ((a >>> i) & 1L) << (2 * i)
      out |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }
}

object VectorFunctions {
  /** Exact int64 dot product (codegen'd). */
  def dotInt64(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductInt64(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Morton/Z-order interleave of two non-negative int64 keys. */
  def interleaveBits(a: Column, b: Column): Column =
    ColumnBridge.column(InterleaveBits(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** md5-derived ±1 sign matrix shared with the oracle SQL:
    * sign(i,j) = 1 - 2·(md5h60("<tag> i j") mod 2). Distinct tags
    * decouple independent sign universes (the JL sketch's "rp" vs the
    * multi-table LSH's "mlsh") so adding one can never perturb the
    * other's projections. */
  def rpSignsTagged(tag: String, inDims: Int, outDims: Int): Array[Array[Long]] =
    Array.tabulate(inDims, outDims) { (i, j) =>
      1L - 2L * (HashKernels.md5h60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"$tag $i $j")) % 2L)
    }

  /** [[rpSignsTagged]] at the original "rp" tag (q76's JL sketch). */
  def rpSigns(inDims: Int, outDims: Int): Array[Array[Long]] =
    rpSignsTagged("rp", inDims, outDims)

  /** Deterministic ±1 random projection of a scaled int64 vector. */
  def signedProject(v: Column, signs: Array[Array[Long]]): Column =
    ColumnBridge.column(SignedProject(ColumnBridge.expression(v), signs))

  /** Multi-table sign-LSH bucket signatures (one int64 per table) of a
    * scaled int64 vector — see [[SignLshSignatures]]. */
  def signLshSigs(v: Column, signs: Array[Array[Long]], bits: Int): Column =
    ColumnBridge.column(SignLshSignatures(ColumnBridge.expression(v), signs, bits))
}
