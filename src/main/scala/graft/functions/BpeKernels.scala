package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding segmentation kernels (Sennrich, Haddow & Birch,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016) — the subword tokenizer a training-data pipeline actually
  * counts budgets in, as compiled per-row kernels over the word stream.
  *
  * SEMANTICS (the exact cross-engine contract, mirrored by the DuckDB
  * oracle in [[graft.ext.Bpe]]): a word splits into single code points;
  * merges then apply IN RANK ORDER, each as ONE greedy left-to-right
  * non-overlapping pass (scan the symbol list; at the first/every
  * occurrence of (left, right) emit left+right and skip both; a merged
  * symbol never re-pairs with its own right neighbor within the pass —
  * merging (L,R) can only create pairs (prev,LR)/(LR,next), and LR is
  * strictly longer than both L and R, so the pass IS exhaustive for its
  * own pair). For a WELL-FORMED merges table — each side is a single
  * code point or the product of a strictly earlier merge, which is what
  * BPE training produces by construction — this sequential application
  * is equivalent to the classic lowest-rank-first loop: a later merge
  * can never create an occurrence of an earlier pair, because the
  * earlier pair's sides already existed when that earlier rank was
  * chosen. Rank order is therefore the ONLY order the kernel needs, and
  * it is the order a single string-`replace` fold can mirror in SQL —
  * which is exactly how the oracle stays bit-identical.
  *
  * 100 TB shape: segmentation is strictly map-side — the merges table
  * (vocabulary-sized, KBs) rides the closure/codegen references like a
  * broadcast dim, and each task caches word→segmentation (Zipf: a few
  * thousand distinct words cover almost every token instance), so the
  * per-token cost degenerates to one hash lookup. Nothing shuffles
  * until whatever aggregation consumes the counts.
  */
final class BpeTable(val lefts: Array[String], val rights: Array[String],
    val byteLevel: Boolean = false)
    extends Serializable {
  require(lefts.length == rights.length,
    s"bpe: ${lefts.length} lefts vs ${rights.length} rights")
  locally {
    var i = 0
    while (i < lefts.length) {
      if (lefts(i) == null || rights(i) == null ||
          lefts(i).isEmpty || rights(i).isEmpty)
        throw new IllegalArgumentException(
          s"bpe: empty merge symbol at rank ${i + 1} — a merge side must " +
            "be a non-empty symbol (BpeFuzzSpec contract)")
      i += 1
    }
  }

  /** Per-task (post-deserialization) word→segmentation cache. Bounded:
    * beyond the cap new words are segmented but not cached. */
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]](1024)
  private final val CacheCap = 1 << 16

  def size: Int = lefts.length

  /** Greedy rank-order segmentation of one word (see class doc).
    * Byte-level tables split into UTF-8 BYTES first, each byte a
    * two-hex-digit uppercase symbol ("the" → 54|68|65) — GPT-2-style
    * byte fallback: EVERY byte has a base symbol, so no word is ever
    * out of vocabulary, astral code points merely span 4 base symbols.
    * Hex text (not raw bytes) keeps symbols engine-portable: both
    * Spark's hex() and DuckDB's hex(encode()) produce the identical
    * uppercase form, so the SQL replace-fold oracle applies unchanged. */
  def segmentString(word: String): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    var syms = if (byteLevel) hexBytes(word) else codePoints(word)
    var m = 0
    while (m < lefts.length) {
      val l = lefts(m)
      val r = rights(m)
      // cheap presence scan before allocating the output pass
      var i = 0
      var found = false
      while (i < syms.length - 1 && !found) {
        if (syms(i) == l && syms(i + 1) == r) found = true else i += 1
      }
      if (found) {
        val out = new Array[String](syms.length)
        var n = 0
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out(n) = l + r; n += 1; j += 2
          } else {
            out(n) = syms(j); n += 1; j += 1
          }
        }
        syms = java.util.Arrays.copyOf(out, n)
      }
      m += 1
    }
    if (cache.size < CacheCap) cache.put(word, syms)
    syms
  }

  private def hexBytes(word: String): Array[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = String.format("%02X", Integer.valueOf(bytes(i) & 0xff))
      i += 1
    }
    out
  }

  private def codePoints(word: String): Array[String] = {
    val out = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var n = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val w = Character.charCount(cp)
      out(n) = word.substring(i, i + w)
      n += 1
      i += w
    }
    out
  }

  /** string word → array<string> BPE symbols. */
  def segmentWord(w: UTF8String): ArrayData = {
    val syms = segmentString(w.toString)
    val out = new Array[AnyRef](syms.length)
    var i = 0
    while (i < syms.length) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** array<string> word tokens → flat array<string> of all BPE symbols
    * in document order (words never merge across boundaries). */
  def encodeTokens(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val parts = new Array[Array[String]](n)
    var total = 0
    var i = 0
    while (i < n) {
      parts(i) = segmentString(tokens.getUTF8String(i).toString)
      total += parts(i).length
      i += 1
    }
    val out = new Array[AnyRef](total)
    var k = 0
    i = 0
    while (i < n) {
      val p = parts(i)
      var j = 0
      while (j < p.length) { out(k) = UTF8String.fromString(p(j)); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** GREEDY whole-word chunking in subword units — the context-window
    * prep pass: scan words left to right; a word joins the current
    * chunk unless adding its subword count would exceed `budget` and
    * the chunk is non-empty, in which case it OPENS the next chunk. A
    * single word longer than the budget becomes its own oversized chunk
    * (words are atomic here — splitting them is q47/q132's
    * concat-and-chunk semantic, a different operator). Returns one
    * struct<n_words, n_subwords> per chunk, in order. Row-local and
    * sequential by nature — exactly what a compiled per-row kernel is
    * for; the oracle mirrors the same scan as a recursive CTE. */
  def chunkCounts(tokens: ArrayData, budget: Long): ArrayData = {
    val n = tokens.numElements()
    val out = new java.util.ArrayList[AnyRef]()
    var words = 0L
    var used = 0L
    var i = 0
    while (i < n) {
      val wn = segmentString(tokens.getUTF8String(i).toString).length.toLong
      if (words > 0L && used + wn > budget) {
        out.add(org.apache.spark.sql.catalyst.InternalRow(words, used))
        words = 0L
        used = 0L
      }
      words += 1L
      used += wn
      i += 1
    }
    if (words > 0L) out.add(org.apache.spark.sql.catalyst.InternalRow(words, used))
    new GenericArrayData(out.toArray)
  }

  /** array<string> word tokens → total BPE symbol count, without
    * materializing the symbols (the budget-arithmetic fast path). */
  def countTokens(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      total += segmentString(tokens.getUTF8String(i).toString).length
      i += 1
    }
    total
  }
}

/** string word → array<string> BPE symbols under the given merges. */
case class BpeSegmentWord(child: Expression,
    lefts: Array[String], rights: Array[String], byteLevel: Boolean = false)
    extends UnaryExpression with ArrayParamEquality {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segment_word"
  override protected def arrayParams: Seq[AnyRef] = Seq(lefts, rights)
  override protected def scalarParams: Seq[Any] = Seq(byteLevel)

  @transient private lazy val table = new BpeTable(lefts, rights, byteLevel)

  override def nullSafeEval(input: Any): Any =
    table.segmentWord(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.segmentWord($c)")
  }

  override protected def withNewChildInternal(c: Expression): BpeSegmentWord =
    copy(child = c)
}

/** array<string> word tokens → flat array<string> BPE symbol stream. */
case class BpeEncodeTokens(child: Expression,
    lefts: Array[String], rights: Array[String], byteLevel: Boolean = false)
    extends UnaryExpression with ArrayParamEquality {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_tokens"
  override protected def arrayParams: Seq[AnyRef] = Seq(lefts, rights)
  override protected def scalarParams: Seq[Any] = Seq(byteLevel)

  @transient private lazy val table = new BpeTable(lefts, rights, byteLevel)

  override def nullSafeEval(input: Any): Any =
    table.encodeTokens(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodeTokens($c)")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncodeTokens =
    copy(child = c)
}

/** array<string> word tokens → bigint total BPE symbol count. */
case class BpeCountTokens(child: Expression,
    lefts: Array[String], rights: Array[String], byteLevel: Boolean = false)
    extends UnaryExpression with ArrayParamEquality {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count_tokens"
  override protected def arrayParams: Seq[AnyRef] = Seq(lefts, rights)
  override protected def scalarParams: Seq[Any] = Seq(byteLevel)

  @transient private lazy val table = new BpeTable(lefts, rights, byteLevel)

  override def nullSafeEval(input: Any): Any =
    table.countTokens(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
  }

  override protected def withNewChildInternal(c: Expression): BpeCountTokens =
    copy(child = c)
}

/** array<string> word tokens → array<struct<n_words, n_subwords>>:
  * greedy whole-word chunks under a subword budget
  * ([[BpeTable.chunkCounts]]). */
case class BpeChunkCounts(child: Expression,
    lefts: Array[String], rights: Array[String], budget: Long,
    byteLevel: Boolean = false)
    extends UnaryExpression with ArrayParamEquality {
  private val structType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_words", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_subwords", LongType, nullable = false)))
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def prettyName: String = "bpe_chunk_counts"
  override protected def arrayParams: Seq[AnyRef] = Seq(lefts, rights)
  override protected def scalarParams: Seq[Any] = Seq(budget, byteLevel)

  @transient private lazy val table = new BpeTable(lefts, rights, byteLevel)

  override def nullSafeEval(input: Any): Any =
    table.chunkCounts(input.asInstanceOf[ArrayData], budget)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.chunkCounts($c, ${budget}L)")
  }

  override protected def withNewChildInternal(c: Expression): BpeChunkCounts =
    copy(child = c)
}

object BpeFunctions {
  private def split(merges: Seq[(String, String)]) =
    (merges.map(_._1).toArray, merges.map(_._2).toArray)

  /** Byte-level builders: merges operate over two-hex-digit UTF-8 byte
    * symbols (see [[BpeTable.segmentString]]). */
  def segmentWordBytes(word: Column, merges: Seq[(String, String)]): Column = {
    val (l, r) = split(merges)
    ColumnBridge.column(BpeSegmentWord(ColumnBridge.expression(word), l, r,
      byteLevel = true))
  }

  def encodeTokensBytes(tokens: Column, merges: Seq[(String, String)]): Column = {
    val (l, r) = split(merges)
    ColumnBridge.column(BpeEncodeTokens(ColumnBridge.expression(tokens), l, r,
      byteLevel = true))
  }

  def countTokensBytes(tokens: Column, merges: Seq[(String, String)]): Column = {
    val (l, r) = split(merges)
    ColumnBridge.column(BpeCountTokens(ColumnBridge.expression(tokens), l, r,
      byteLevel = true))
  }

  def segmentWord(word: Column, merges: Seq[(String, String)]): Column = {
    val (l, r) = split(merges)
    ColumnBridge.column(BpeSegmentWord(ColumnBridge.expression(word), l, r))
  }

  def encodeTokens(tokens: Column, merges: Seq[(String, String)]): Column = {
    val (l, r) = split(merges)
    ColumnBridge.column(BpeEncodeTokens(ColumnBridge.expression(tokens), l, r))
  }

  def countTokens(tokens: Column, merges: Seq[(String, String)]): Column = {
    val (l, r) = split(merges)
    ColumnBridge.column(BpeCountTokens(ColumnBridge.expression(tokens), l, r))
  }

  def chunkCounts(tokens: Column, merges: Seq[(String, String)],
      budget: Long): Column = {
    val (l, r) = split(merges)
    ColumnBridge.column(BpeChunkCounts(
      ColumnBridge.expression(tokens), l, r, budget))
  }
}
