package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Compiled hashing kernels for the dedup pipelines.
  *
  * Bit-for-bit identical to the declarative formulation in
  * graft.ext.TextDsl (which the DuckDB oracles still use): the shared
  * 60-bit hash is the first 15 hex digits of MD5 — i.e. the first 60
  * bits of the digest — and all reductions are exact int64 arithmetic.
  *
  * Why native: the HOF formulation (`transform(sh, conv(substring(
  * md5(x),1,15),16,10) % P)` + fold) evaluates interpreted expression
  * trees per array element with boxing — measured ~3 ms per document,
  * which makes the signature scan the bottleneck of every near-dup
  * job. These kernels run the whole per-row loop in compiled JVM code
  * (~50× faster) and emit a single static call in whole-stage codegen,
  * so the surrounding projection stays fused.
  */
object HashKernels {
  final val P = 2147483647L // 2^31-1, as TextDsl.P

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(utf8 bytes) = value of the first 15 hex
    * digits — matches conv(substring(md5(s),1,15),16,10). */
  def md5h60(s: UTF8String): Long = {
    val d = digests.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** MinHash signature over the distinct shingle strings: sig[i] =
    * min over shingles of ((1 + 7919 i)·(h60 % P) + 104729 (i+1)) % P,
    * init P — matches TextDsl.minhashSig ∘ hp. */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, P)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      val h = md5h60(shingles.getUTF8String(j)) % P
      var i = 0
      while (i < k) {
        val v = ((1L + 7919L * i) * h + 104729L * (i + 1)) % P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** 60-bit SimHash over token strings: bit j set iff
    * Σ_tokens (2·bit_j(md5h60) − 1) > 0 — matches TextDsl.simhash ∘ h60. */
  def simhash60(tokens: ArrayData): Long = {
    val counts = new Array[Int](60)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val h = md5h60(tokens.getUTF8String(t))
      var j = 0
      while (j < 60) {
        counts(j) += (((h >>> j) & 1L) * 2L - 1L).toInt
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (counts(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  /** Positional document fingerprint: Σ_i (md5h60(token_i) mod P)·i
    * mod P over 1-based positions, 0 for empty — matches the HOF
    * formulation in q34 (and its DuckDB oracle) step for step: the
    * modulo is applied after every addition, exactly like the fold. */
  def positionalFingerprint(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val h = md5h60(tokens.getUTF8String(i)) % P
      acc = (acc + h * (i + 1)) % P // h < 2^31, i+1 ≤ n → product < 2^62
      i += 1
    }
    acc
  }

  private val sgnPrefix = UTF8String.fromString("sgn ")

  /** Hashed bag-of-words (feature hashing): token t adds
    * sign ∈ {±1} at bucket md5h60(t) % dim, sign = +1 iff
    * md5h60("sgn " + t) is even — matches TextDsl.hashedBowHof
    * term for term (h60 ≥ 0 makes % 2 ≡ & 1). */
  def hashedBow(tokens: ArrayData, dim: Int): ArrayData = {
    val v = new Array[Long](dim)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      val j = (md5h60(t) % dim).toInt
      v(j) += (if ((md5h60(UTF8String.concat(sgnPrefix, t)) & 1L) == 0L) 1L else -1L)
      i += 1
    }
    new GenericArrayData(v)
  }

  /** All (ids[i], ids[j]) with i<j as struct rows; see SortedIdPairs. */
  def sortedIdPairs(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    // Pair count in Long: n ≳ 65536 overflows Int n*(n-1)/2 to a negative
    // array size. Callers cap bucket sizes upstream; this guard turns a
    // mis-capped degenerate bucket into a diagnosable error, not a JVM one.
    val pairs = n.toLong * (n - 1) / 2
    require(pairs <= Int.MaxValue,
      s"sortedIdPairs: bucket of $n ids expands to $pairs pairs; cap buckets upstream")
    val out = new Array[Any](pairs.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(a, ids.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Pair expansion carrying a payload: array<struct<id,v>> sorted by id
    * → (id_i, id_j, v_i, v_j) for all i<j — the SimHash bucket shape,
    * where v rides along so no verify join-back is needed. Same Long
    * pair-count guard as [[sortedIdPairs]]. */
  def sortedPayloadPairs(items: ArrayData): ArrayData = {
    val n = items.numElements()
    val pairs = n.toLong * (n - 1) / 2
    require(pairs <= Int.MaxValue,
      s"sortedPayloadPairs: bucket of $n items expands to $pairs pairs; cap buckets upstream")
    val ids = new Array[Long](n)
    val vs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = items.getStruct(i, 2)
      ids(i) = r.getLong(0)
      vs(i) = r.getLong(1)
      i += 1
    }
    val out = new Array[Any](pairs.toInt)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(ids(i), ids(j), vs(i), vs(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

object TextKernels {
  /** Compiled equivalent of filter(split(regexp_replace(lower(c),
    * "[^a-z0-9 ]", " "), " +"), t != "") for ASCII text: lowercase A-Z,
    * keep [a-z0-9] runs as tokens, everything else delimits. Multibyte
    * UTF-8 units fall into the delimiter class exactly like the regex
    * (each non-matching char becomes a space; adjacent spaces collapse
    * in the split). Verified equal to the HOF formulation on the
    * fixtures by HashKernelsSpec. */
  def tokenizeAsciiLower(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val out = new java.util.ArrayList[AnyRef]()
    val buf = new Array[Byte](bytes.length)
    var blen = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val c = if (b >= 'A' && b <= 'Z') b + 32 else b
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        buf(blen) = c.toByte; blen += 1
      } else if (blen > 0) {
        out.add(UTF8String.fromBytes(java.util.Arrays.copyOf(buf, blen)))
        blen = 0
      }
      i += 1
    }
    if (blen > 0) out.add(UTF8String.fromBytes(java.util.Arrays.copyOf(buf, blen)))
    new GenericArrayData(out.toArray)
  }

  /** Compiled word n-grams: ["a","b","c","d"], n=3 → ["a b c","b c d"];
    * fewer than n tokens → empty. Matches TextDsl.shingles. */
  def wordShingles(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(new Array[AnyRef](0))
    val out = new Array[AnyRef](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** string → array<string> ASCII-lowercase alphanumeric tokens. */
case class TokenizeAsciiLower(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "tokenize_ascii_lower"

  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenizeAsciiLower(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.tokenizeAsciiLower($c)")

  override protected def withNewChildInternal(c: Expression): TokenizeAsciiLower =
    copy(child = c)
}

/** array<string> tokens → array<string> space-joined word n-grams. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    TextKernels.wordShingles(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.wordShingles($c, $n)")

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** array<string> shingles → array<bigint> k-wide MinHash signature. */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashSig(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.minhashSig($c, $k)")

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** array<string> tokens → 60-bit SimHash fingerprint (bigint). */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    HashKernels.simhash60(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash60($c)")

  override protected def withNewChildInternal(c: Expression): SimHash60 =
    copy(child = c)
}

/** array<string> tokens → array<bigint> dim-wide hashed bag-of-words
  * vector (the feature-hashing trick). */
case class HashedBow(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_bow"

  override def nullSafeEval(input: Any): Any =
    HashKernels.hashedBow(input.asInstanceOf[ArrayData], dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.hashedBow($c, $dim)")

  override protected def withNewChildInternal(c: Expression): HashedBow =
    copy(child = c)
}

/** array<string> tokens → order-sensitive 60-bit-hash positional
  * fingerprint mod P (bigint). */
case class PositionalFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "positional_fingerprint"

  override def nullSafeEval(input: Any): Any =
    HashKernels.positionalFingerprint(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.positionalFingerprint($c)")

  override protected def withNewChildInternal(c: Expression): PositionalFingerprint =
    copy(child = c)
}

/** array<bigint> of SORTED DISTINCT ids → array<struct<a,b>> of all
  * index pairs i<j (hence a<b). The in-row pair expansion after a
  * bucket group-by: bucket sizes are small but buckets are many, and
  * the HOF formulation (nested transform + flatten + filter) allocates
  * interpreted structs per candidate — measured >1M per run on the
  * n-gram baseline. */
case class SortedIdPairs(child: Expression) extends UnaryExpression {
  private val structType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("a", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("b", LongType, nullable = false)))
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def prettyName: String = "sorted_id_pairs"

  override def nullSafeEval(input: Any): Any =
    HashKernels.sortedIdPairs(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.sortedIdPairs($c)")

  override protected def withNewChildInternal(c: Expression): SortedIdPairs =
    copy(child = c)
}

/** array<struct<id:bigint, v:bigint>> sorted by id → array<struct<
  * doc_a, doc_b, sa, sb>> of all index pairs i<j with payloads. */
case class SortedPayloadPairs(child: Expression) extends UnaryExpression {
  private val structType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_a", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("doc_b", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sa", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sb", LongType, nullable = false)))
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def prettyName: String = "sorted_payload_pairs"

  override def nullSafeEval(input: Any): Any =
    HashKernels.sortedPayloadPairs(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.sortedPayloadPairs($c)")

  override protected def withNewChildInternal(c: Expression): SortedPayloadPairs =
    copy(child = c)
}

object HashFunctions {
  def minhashSignature(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles), k))

  def simhash60(tokens: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(tokens)))

  def tokenize(text: Column): Column =
    ColumnBridge.column(TokenizeAsciiLower(ColumnBridge.expression(text)))

  def shingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(tokens), n))

  def sortedIdPairs(ids: Column): Column =
    ColumnBridge.column(SortedIdPairs(ColumnBridge.expression(ids)))

  def positionalFingerprint(tokens: Column): Column =
    ColumnBridge.column(PositionalFingerprint(ColumnBridge.expression(tokens)))

  def hashedBow(tokens: Column, dim: Int): Column =
    ColumnBridge.column(HashedBow(ColumnBridge.expression(tokens), dim))

  def sortedPayloadPairs(items: Column): Column =
    ColumnBridge.column(SortedPayloadPairs(ColumnBridge.expression(items)))
}
