package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi segmentation kernel (Kudo, "Subword
  * Regularization", ACL 2018) — the per-word minimum-total-cost DP as a
  * compiled per-row expression over a broadcast-style (piece, cost)
  * table, the exact [[BpeTable]] discipline: one map pass over the
  * distinct-word stream, zero per-round shuffles.
  *
  * SEMANTICS (the cross-engine contract, mirrored step for step by the
  * relational DP in [[graft.ext.UnigramLm.viterbi]] and by the DuckDB
  * oracle's unrolled MATERIALIZED CTE rounds — UnigramLmSpec asserts
  * kernel ≡ relational on fixture and seeded random corpora):
  * positions are CODE POINTS (Spark `substring` semantics); position
  * i's best state = argmin over predecessors j ∈ [0, i) with
  * w[j..i) ∈ pieces of (best(j) + cost, np(j) + 1), ties broken by
  * SMALLEST j (the relational `ORDER BY best, np, j`); the winning
  * segmentation string rides the DP exactly as the `seg` column does.
  * Words longer than `lmax` code points return NULL — the relational
  * DP runs exactly `lmax` rounds, so such words never reach a final
  * state there either (and the piece universe is built from ≤ lmax
  * substrings, so within a ≤ lmax-char word every predecessor is in
  * range). Unreachable words (a gap no piece covers — possible only
  * under an adversarial piece table, never the seed/pruned vocabularies
  * whose single chars always survive) also return NULL, matching the
  * relational `pos = length(w)` final filter dropping them.
  *
  * 100 TB shape: the piece table is vocabulary-derived (the tokenizer
  * artifact — KBs to MBs) and rides the codegen references like a
  * broadcast dim; the DP is O(len²) per DISTINCT word with zero
  * shuffles, vs the relational unrolling's lmax × (join + window +
  * checkpoint) Spark stages per corpus. The relational form remains in
  * [[graft.ext.UnigramLm]] as the spec-level law witness.
  */
final class UnigramCostTable(val pieces: Array[String],
    val costs: Array[Long], val lmax: Int) extends Serializable {
  require(pieces.length == costs.length,
    s"unigram: ${pieces.length} pieces vs ${costs.length} costs")

  @transient private lazy val map: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), costs(i)); i += 1 }
    m
  }

  /** Minimum-cost segmentation of one word: struct(best, np, seg), or
    * null when the word exceeds lmax code points or cannot be covered
    * (see class doc — both cases are exactly the relational DP's
    * dropped rows). */
  def segment(w: UTF8String): InternalRow = {
    val s = w.toString
    // code-point positions, mirroring Spark substring() semantics
    val cp = new Array[Int](s.codePointCount(0, s.length) + 1)
    var n = 0
    var ci = 0
    while (ci < s.length) {
      cp(n) = ci
      n += 1
      ci += Character.charCount(s.codePointAt(ci))
    }
    cp(n) = s.length
    if (n == 0 || n > lmax) return null
    val best = new Array[Long](n + 1)
    val np = new Array[Long](n + 1)
    val seg = new Array[String](n + 1)
    seg(0) = ""
    var i = 1
    while (i <= n) {
      var bi = 0L
      var ni = 0L
      var si: String = null
      var j = 0
      while (j < i) {
        if (seg(j) != null) {
          val c = map.get(s.substring(cp(j), cp(i)))
          if (c != null) {
            val cb = best(j) + c.longValue()
            val cn = np(j) + 1L
            // strict improvement only: iterating j ascending makes
            // equal (best, np) keep the smaller j — the relational
            // ORDER BY best, np, j tie-break
            if (si == null || cb < bi || (cb == bi && cn < ni)) {
              bi = cb
              ni = cn
              si = if (seg(j).isEmpty) s.substring(cp(j), cp(i))
                else seg(j) + " " + s.substring(cp(j), cp(i))
            }
          }
        }
        j += 1
      }
      best(i) = bi
      np(i) = ni
      seg(i) = si
      i += 1
    }
    if (seg(n) == null) return null
    new GenericInternalRow(Array[Any](best(n), np(n),
      UTF8String.fromString(seg(n))))
  }
}

/** string word → struct<best, np, seg> minimum-cost unigram-LM
  * segmentation under the given (piece, cost) table; null when the
  * word is longer than lmax or uncoverable (the relational DP's
  * dropped-row semantics). */
case class UnigramViterbiSegment(child: Expression,
    pieces: Array[String], costs: Array[Long], lmax: Int)
    extends UnaryExpression with ArrayParamEquality {

  override def dataType: DataType = StructType(Seq(
    StructField("best", LongType, nullable = false),
    StructField("np", LongType, nullable = false),
    StructField("seg", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_viterbi_segment"
  override protected def arrayParams: Seq[AnyRef] = Seq(pieces, costs)
  override protected def scalarParams: Seq[Any] = Seq(lmax)

  @transient private lazy val table = new UnigramCostTable(pieces, costs, lmax)

  override def nullSafeEval(input: Any): Any =
    table.segment(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uvit", table,
      classOf[UnigramCostTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = $ref.segment($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): UnigramViterbiSegment =
    copy(child = c)
}

object UnigramFunctions {
  /** Compiled Viterbi segmentation under a driver-collected
    * vocabulary-sized (piece, cost) table. */
  def viterbiSegment(word: Column, pieces: Seq[(String, Long)],
      lmax: Int): Column =
    ColumnBridge.column(UnigramViterbiSegment(ColumnBridge.expression(word),
      pieces.map(_._1).toArray, pieces.map(_._2).toArray, lmax))
}
