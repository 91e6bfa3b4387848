package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the compiled kernels: register with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`, then call
  * from SQL:
  *
  *   SELECT minhash_signature(word_shingles(tokenize_ascii_lower(text), 3), 12)
  *   FROM documents
  *
  * Kept deliberately small: functions only, no planner rules — the
  * relational surface is fully served by Catalyst built-ins
  * (SURVEY.md §4.2), so the optimizer surface stays zero.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // foldable (not just Literal): SQL wraps numeric literals in casts
  // that only constant-fold later in analysis
  private def numArg(e: Expression, fn: String, pos: Int): Long =
    (if (e.foldable) e.eval() else null) match {
      case v: java.lang.Integer => v.toLong
      case v: java.lang.Long => v
      case _ => throw new IllegalArgumentException(
        s"$fn: argument $pos must be an integer literal, got $e")
    }

  private def intArg(e: Expression, fn: String, pos: Int): Int = {
    val v = numArg(e, fn, pos)
    require(v >= Int.MinValue && v <= Int.MaxValue,
      s"$fn: argument $pos out of int range: $v")
    v.toInt
  }

  // a wrong argument count would otherwise surface as a raw
  // IndexOutOfBoundsException during analysis with no mention of the
  // function; every other validation here produces a named message
  private def arity(args: Seq[Expression], fn: String, n: Int): Seq[Expression] = {
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$fn: expected $n argument(s), got ${args.length}")
    args
  }

  private def dblArg(e: Expression, fn: String, pos: Int): Double =
    (if (e.foldable) e.eval() else null) match {
      case v: java.lang.Double => v
      case v: org.apache.spark.sql.types.Decimal => v.toDouble
      case v: java.lang.Float => v.toDouble
      case _ => throw new IllegalArgumentException(
        s"$fn: argument $pos must be a numeric literal, got $e")
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("tokenize_ascii_lower"),
      new ExpressionInfo(classOf[TokenizeAsciiLower].getName, "tokenize_ascii_lower"),
      (args: Seq[Expression]) => TokenizeAsciiLower(arity(args, "tokenize_ascii_lower", 1).head)))

    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => { val a = arity(args, "word_shingles", 2)
        WordShingles(a.head, intArg(a(1), "word_shingles", 2)) }))

    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => { val a = arity(args, "minhash_signature", 2)
        MinHashSignature(a.head, intArg(a(1), "minhash_signature", 2)) }))

    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (args: Seq[Expression]) => SimHash60(arity(args, "simhash60", 1).head)))

    ext.injectFunction((
      FunctionIdentifier("dot_int64"),
      new ExpressionInfo(classOf[DotProductInt64].getName, "dot_int64"),
      (args: Seq[Expression]) => { val a = arity(args, "dot_int64", 2)
        DotProductInt64(a.head, a(1)) }))

    ext.injectFunction((
      FunctionIdentifier("positional_fingerprint"),
      new ExpressionInfo(classOf[PositionalFingerprint].getName, "positional_fingerprint"),
      (args: Seq[Expression]) => PositionalFingerprint(arity(args, "positional_fingerprint", 1).head)))

    ext.injectFunction((
      FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopKOrdered].getName, "top_k"),
      (args: Seq[Expression]) => { val a = arity(args, "top_k", 2)
        TopKOrdered(a.head, intArg(a(1), "top_k", 2)) }))

    ext.injectFunction((
      FunctionIdentifier("bloom_build"),
      new ExpressionInfo(classOf[BloomBuildAgg].getName, "bloom_build"),
      (args: Seq[Expression]) => { val a = arity(args, "bloom_build", 3)
        BloomBuildAgg(a.head,
          numArg(a(1), "bloom_build", 2),
          dblArg(a(2), "bloom_build", 3)).toAggregateExpression() }))

    ext.injectFunction((
      FunctionIdentifier("ppm_header"),
      new ExpressionInfo(classOf[PpmHeader].getName, "ppm_header"),
      (args: Seq[Expression]) => PpmHeader(arity(args, "ppm_header", 1).head)))

    ext.injectFunction((
      FunctionIdentifier("ppm_resize"),
      new ExpressionInfo(classOf[PpmResize].getName, "ppm_resize"),
      (args: Seq[Expression]) => { val a = arity(args, "ppm_resize", 3)
        PpmResize(a.head, a(1), a(2)) }))

    ext.injectFunction((
      FunctionIdentifier("ppm_crop_cols"),
      new ExpressionInfo(classOf[PpmCropCols].getName, "ppm_crop_cols"),
      (args: Seq[Expression]) => { val a = arity(args, "ppm_crop_cols", 3)
        PpmCropCols(a.head, a(1), a(2)) }))

    ext.injectFunction((
      FunctionIdentifier("ppm_channel_stats"),
      new ExpressionInfo(classOf[PpmChannelStats].getName, "ppm_channel_stats"),
      (args: Seq[Expression]) =>
        PpmChannelStats(arity(args, "ppm_channel_stats", 1).head)))

    ext.injectFunction((
      FunctionIdentifier("wav_header"),
      new ExpressionInfo(classOf[WavHeader].getName, "wav_header"),
      (args: Seq[Expression]) => WavHeader(arity(args, "wav_header", 1).head)))

    ext.injectFunction((
      FunctionIdentifier("wav_channel_stats"),
      new ExpressionInfo(classOf[WavChannelStats].getName, "wav_channel_stats"),
      (args: Seq[Expression]) =>
        WavChannelStats(arity(args, "wav_channel_stats", 1).head)))

    ext.injectFunction((
      FunctionIdentifier("wav_wrap"),
      new ExpressionInfo(classOf[WavWrap].getName, "wav_wrap"),
      (args: Seq[Expression]) => { val a = arity(args, "wav_wrap", 2)
        WavWrap(a.head, a(1)) }))

    ext.injectFunction((
      FunctionIdentifier("wav_crop_frames"),
      new ExpressionInfo(classOf[WavCropFrames].getName, "wav_crop_frames"),
      (args: Seq[Expression]) => { val a = arity(args, "wav_crop_frames", 3)
        WavCropFrames(a.head, a(1), a(2)) }))
  }
}
