package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** A REAL byte-level media codec for the multimodal column family: the
  * netpbm P6 (binary PPM) container header parse — magic check,
  * whitespace/`#`-comment skipping, ASCII integer fields, and exact
  * pixel-byte accounting against the declared dimensions. This is the
  * genuine decode half of the [[graft.ext.Multimodal]] seam (the
  * feature-extraction stub remains a documented stand-in for ML-model
  * featurizers, which have no in-container implementation): it parses
  * actual container bytes, not metadata carried alongside them, and
  * fails fast on every malformation class a real ingest job meets
  * (wrong magic, truncated header, junk dimensions, short pixel data).
  *
  * One compiled pass per row, zero shuffle — the payload never leaves
  * its partition; only the few header words flow downstream (the
  * 100 TB contract of every multimodal kernel here).
  */
object PpmCodec {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t'

  /** Parse a P6 header; returns [width, height, maxval, data_offset,
    * pixel_bytes] as int64. Grammar (netpbm spec): "P6", then three
    * whitespace-separated ASCII integers (width, height, maxval) where
    * any whitespace run may contain `#`-to-end-of-line comments, then
    * EXACTLY ONE whitespace byte, then raw pixel data — 3·w·h samples
    * of 1 byte (maxval ≤ 255) or 2 bytes (maxval ≤ 65535). A payload
    * whose pixel run disagrees with its declared dims is corrupt and
    * throws — silent tolerance here is how a truncated shard poisons a
    * training set. */
  def parseHeader(bytes: Array[Byte]): ArrayData = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6')
      throw new IllegalArgumentException(
        "ppm_header: bad magic — payload is not a P6 PPM container")
    // the spec requires whitespace after the magic: without this check
    // a fused token like "P6123" would silently parse width=123
    if (bytes.length < 3 || !isWs(bytes(2)))
      throw new IllegalArgumentException(
        "ppm_header: missing whitespace after the P6 magic")
    var pos = 2

    def skipSeparators(): Unit = {
      var again = true
      while (again) {
        while (pos < bytes.length && isWs(bytes(pos))) pos += 1
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else again = false
      }
    }

    def readInt(field: String): Long = {
      skipSeparators()
      if (pos >= bytes.length || bytes(pos) < '0' || bytes(pos) > '9')
        throw new IllegalArgumentException(
          s"ppm_header: expected ASCII integer for $field at byte $pos")
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10L + (bytes(pos) - '0')
        if (v > Int.MaxValue)
          throw new IllegalArgumentException(
            s"ppm_header: $field overflows int32 — corrupt header")
        pos += 1
      }
      v
    }

    val w = readInt("width")
    val h = readInt("height")
    val maxv = readInt("maxval")
    if (w < 1 || h < 1)
      throw new IllegalArgumentException(
        s"ppm_header: degenerate dimensions ${w}x$h")
    if (maxv < 1 || maxv > 65535)
      throw new IllegalArgumentException(
        s"ppm_header: maxval $maxv outside [1, 65535]")
    // the spec demands a SINGLE whitespace byte between maxval and the
    // pixel run (a comment here would be pixel data in disguise)
    if (pos >= bytes.length || !isWs(bytes(pos)))
      throw new IllegalArgumentException(
        "ppm_header: missing single whitespace after maxval")
    pos += 1
    val bytesPerSample = if (maxv > 255) 2L else 1L
    val pixelBytes = bytes.length.toLong - pos
    val expected = 3L * w * h * bytesPerSample
    if (pixelBytes != expected)
      throw new IllegalArgumentException(
        s"ppm_header: payload carries $pixelBytes pixel bytes but " +
          s"${w}x$h@$maxv promises $expected — truncated or padded container")
    new GenericArrayData(Array(w, h, maxv, pos.toLong, pixelBytes))
  }

  /** Canonical minimal P6 header for an output container. Every kernel
    * here emits this exact form so downstream parses (and the oracle's
    * byte arithmetic) see one canonical layout: no comments, single
    * '\n' separators. */
  private def canonicalHeader(w: Int, h: Int, maxv: Long): Array[Byte] =
    s"P6\n$w $h\n$maxv\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** REAL pixel-level nearest-neighbor resample: parse the source
    * container, map every output pixel (x, y) to source pixel
    * (⌊x·srcW/outW⌋, ⌊y·srcH/outH⌋), and emit a NEW canonical P6
    * container with the resampled pixel bytes. Handles both 1- and
    * 2-byte-per-sample containers (maxval ≤ 255 / ≤ 65535). One
    * compiled pass per row; the payload never leaves its partition. */
  def resize(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    if (outW < 1 || outH < 1)
      throw new IllegalArgumentException(
        s"ppm_resize: degenerate target dimensions ${outW}x$outH")
    val hdr = parseHeader(bytes)
    val srcW = hdr.getLong(0).toInt
    val srcH = hdr.getLong(1).toInt
    val maxv = hdr.getLong(2)
    val off = hdr.getLong(3).toInt
    val px = if (maxv > 255) 6 else 3 // bytes per pixel (3 samples)
    val head = canonicalHeader(outW, outH, maxv)
    // size the output in LONG space: the kernel is SQL-reachable, so
    // absurd target dims must fail as the contract error, not wrap int
    // arithmetic into a NegativeArraySizeException (or worse, a
    // too-small allocation that AIOOBEs mid-copy)
    val outBytes = head.length.toLong + outW.toLong * outH * px
    if (outBytes > Int.MaxValue)
      throw new IllegalArgumentException(
        s"ppm_resize: target ${outW}x$outH needs $outBytes bytes — " +
          "exceeds the 2 GiB single-container bound")
    val out = new Array[Byte](outBytes.toInt)
    System.arraycopy(head, 0, out, 0, head.length)
    var o = head.length
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * srcH / outH).toInt
      val rowBase = off + sy.toLong * srcW * px
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * srcW / outW).toInt
        System.arraycopy(bytes, (rowBase + sx.toLong * px).toInt, out, o, px)
        o += px
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL pixel-level channel statistics: one pass over the decoded
    * sample values (1- or 2-byte big-endian per the parsed maxval)
    * computing per-channel (sum, min, max) — the deterministic half of
    * a media featurizer: channel means and dynamic range are the
    * classic dark/blank/clipped-image curation signals, computed here
    * from ACTUAL pixels, not payload-byte hashes. Returns
    * [n_px, sumR, sumG, sumB, minR, minG, minB, maxR, maxG, maxB]
    * as int64 — integer-exact, so both engines agree bit-for-bit and
    * downstream means materialize as single divisions. */
  def channelStats(bytes: Array[Byte]): ArrayData = {
    val hdr = parseHeader(bytes)
    val w = hdr.getLong(0).toInt
    val h = hdr.getLong(1).toInt
    val maxv = hdr.getLong(2)
    val off = hdr.getLong(3).toInt
    val two = maxv > 255
    val n = w.toLong * h
    val sums = new Array[Long](3)
    val mins = Array.fill(3)(Long.MaxValue)
    val maxs = Array.fill(3)(Long.MinValue)
    var p = off
    var i = 0L
    while (i < n) {
      var c = 0
      while (c < 3) {
        val v =
          if (two) (((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)).toLong
          else (bytes(p) & 0xff).toLong
        sums(c) += v
        if (v < mins(c)) mins(c) = v
        if (v > maxs(c)) maxs(c) = v
        p += (if (two) 2 else 1)
        c += 1
      }
      i += 1
    }
    new GenericArrayData(Array(n, sums(0), sums(1), sums(2),
      mins(0), mins(1), mins(2), maxs(0), maxs(1), maxs(2)))
  }

  /** TRUE 2D convolution + pooling over the decoded pixel grid: K
    * integer 3×3×3 kernels (all three channels feed every kernel) in
    * VALID mode — conv(k, ox, oy) = Σ_{dy,dx,c} W[k][dy·9+dx·3+c] ·
    * v(ox+dx, oy+dy, c) for ox < w−2, oy < h−2 — followed by 2×2
    * stride-2 MAX pooling (floor dims; odd remainder dropped). Output
    * is the flattened pooled planes, index ((k·pH)+py)·pW + px, as
    * exact int64 (|conv| ≤ Σ|W| · maxval — callers pick weights that
    * keep downstream arithmetic in range; the md5-derived ±2 grid of
    * [[graft.ext.Multimodal.convWeights]] bounds it at 13 770 for
    * 8-bit samples).
    *
    * Requires at least one pooled cell (w ≥ 4, h ≥ 4) — a genuine
    * shape contract, thrown as the named error; and this kernel, unlike
    * the patch-mean featurizer, is sensitive to VERTICAL structure
    * (MultimodalSpec checks a hand-built multi-row container against a
    * scalar reference), even though the fixture wrap's h = 1 sources
    * arrive with replicated rows after resize. */
  def convPool3x3(bytes: Array[Byte], weights: Array[Array[Long]]): ArrayData = {
    val hdr = parseHeader(bytes)
    val w = hdr.getLong(0).toInt
    val h = hdr.getLong(1).toInt
    val maxv = hdr.getLong(2)
    val off = hdr.getLong(3).toInt
    val two = maxv > 255
    val convW = w - 2
    val convH = h - 2
    val pW = convW / 2
    val pH = convH / 2
    if (pW < 1 || pH < 1)
      throw new IllegalArgumentException(
        s"ppm_conv_pool_3x3: ${w}x$h yields no pooled cells (need ≥ 4x4)")
    // decode once into an int plane: v(x, y, c) at (y·w + x)·3 + c
    val v = new Array[Int](w * h * 3)
    var p = off
    var i = 0
    while (i < v.length) {
      v(i) =
        if (two) { val x = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff); p += 2; x }
        else { val x = bytes(p) & 0xff; p += 1; x }
      i += 1
    }
    val k = weights.length
    val out = new Array[Long](k * pH * pW)
    val conv = new Array[Long](convW * convH)
    var ki = 0
    while (ki < k) {
      val wt = weights(ki)
      var oy = 0
      while (oy < convH) {
        var ox = 0
        while (ox < convW) {
          var acc = 0L
          var dy = 0
          while (dy < 3) {
            val rowBase = ((oy + dy) * w + ox) * 3
            var dx = 0
            while (dx < 3) {
              val pix = rowBase + dx * 3
              val wb = dy * 9 + dx * 3
              acc += wt(wb) * v(pix) + wt(wb + 1) * v(pix + 1) + wt(wb + 2) * v(pix + 2)
              dx += 1
            }
            dy += 1
          }
          conv(oy * convW + ox) = acc
          ox += 1
        }
        oy += 1
      }
      var py = 0
      while (py < pH) {
        var px2 = 0
        while (px2 < pW) {
          val a = conv((2 * py) * convW + 2 * px2)
          val b = conv((2 * py) * convW + 2 * px2 + 1)
          val c = conv((2 * py + 1) * convW + 2 * px2)
          val d = conv((2 * py + 1) * convW + 2 * px2 + 1)
          out((ki * pH + py) * pW + px2) =
            math.max(math.max(a, b), math.max(c, d))
          px2 += 1
        }
        py += 1
      }
      ki += 1
    }
    new GenericArrayData(out)
  }

  /** REAL pixel-level column crop [x0, x1): copy the pixel bytes of
    * columns x0..x1-1 from every source row into a NEW canonical P6
    * container of width x1−x0. This is the frame-extraction primitive:
    * frame i of n = columns [⌊w·i/n⌋, ⌊w·(i+1)/n⌋). */
  def cropCols(bytes: Array[Byte], x0: Int, x1: Int): Array[Byte] = {
    val hdr = parseHeader(bytes)
    val srcW = hdr.getLong(0).toInt
    val srcH = hdr.getLong(1).toInt
    val maxv = hdr.getLong(2)
    val off = hdr.getLong(3).toInt
    if (x0 < 0 || x1 <= x0 || x1 > srcW)
      throw new IllegalArgumentException(
        s"ppm_crop_cols: column range [$x0, $x1) outside source width $srcW")
    val px = if (maxv > 255) 6 else 3
    val outW = x1 - x0
    val head = canonicalHeader(outW, srcH, maxv)
    // [x0, x1) ⊆ [0, srcW) is already proven, so the output is never
    // larger than the (valid, int-sized) source — long math here is
    // belt-and-braces symmetry with resize
    val outBytes = head.length.toLong + outW.toLong * srcH * px
    if (outBytes > Int.MaxValue)
      throw new IllegalArgumentException(
        s"ppm_crop_cols: crop ${outW}x$srcH needs $outBytes bytes — " +
          "exceeds the 2 GiB single-container bound")
    val out = new Array[Byte](outBytes.toInt)
    System.arraycopy(head, 0, out, 0, head.length)
    var o = head.length
    var y = 0
    while (y < srcH) {
      val src = off + (y.toLong * srcW + x0) * px
      System.arraycopy(bytes, src.toInt, out, o, outW * px)
      o += outW * px
      y += 1
    }
    out
  }

  /** Perceptual difference hash (dHash — Krawetz, "Kind of Like That",
    * hackerfactor.com 2013; the gradient variant of the aHash family)
    * over the decoded pixel run in scan order: per-pixel luminance
    * (the exact integer r+g+b sum — no /3, so no division drift),
    * `buckets` position buckets (pixel i → bucket i·buckets div n —
    * the same floor map as resize), bucket mean = sum div count (both
    * operands non-negative), and bit j = mean(j) > mean(j+1) packed
    * little-endian into bits [0, buckets-1) of an int64. With
    * buckets ≤ 64 the hash occupies ≤ 63 bits — always NON-NEGATIVE,
    * so cross-engine shift/mask/xor arithmetic never touches the sign
    * bit. Robust to small pixel edits by construction (an edit moves
    * one or two bucket means slightly; MultimodalSpec pins a planted
    * 3-byte edit at hamming ≤ 2) while content changes flip many
    * gradient bits.
    *
    * Shape contract (named error, the codec-fuzz discipline): needs
    * n ≥ buckets so every bucket is non-empty (pigeonhole on the floor
    * map), and 2 ≤ buckets ≤ 64. One compiled pass per row, zero
    * shuffle — only the 8-byte hash flows downstream, which is what
    * makes LSH-banded near-dup joins over billions of images cheap. */
  def dhash(bytes: Array[Byte], buckets: Int): Long = {
    if (buckets < 2 || buckets > 64)
      throw new IllegalArgumentException(
        s"ppm_dhash: buckets $buckets outside [2, 64]")
    val hdr = parseHeader(bytes)
    val w = hdr.getLong(0)
    val h = hdr.getLong(1)
    val maxv = hdr.getLong(2)
    val off = hdr.getLong(3).toInt
    val two = maxv > 255
    val n = w * h
    if (n < buckets)
      throw new IllegalArgumentException(
        s"ppm_dhash: ${w}x$h carries $n pixels < $buckets buckets — " +
          "every bucket must be non-empty")
    val sums = new Array[Long](buckets)
    val cnts = new Array[Long](buckets)
    var p = off
    var i = 0L
    while (i < n) {
      var lum = 0L
      var c = 0
      while (c < 3) {
        lum +=
          (if (two) (((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)).toLong
           else (bytes(p) & 0xff).toLong)
        p += (if (two) 2 else 1)
        c += 1
      }
      val j = (i * buckets / n).toInt
      sums(j) += lum
      cnts(j) += 1L
      i += 1
    }
    var hash = 0L
    var j = 0
    while (j < buckets - 1) {
      if (sums(j) / cnts(j) > sums(j + 1) / cnts(j + 1)) hash |= 1L << j
      j += 1
    }
    hash
  }
}

/** binary P6 payload → array<bigint> [width, height, maxval,
  * data_offset, pixel_bytes] ([[PpmCodec.parseHeader]]). */
case class PpmHeader(child: Expression) extends UnaryExpression {
  // analysis-time contract: reject non-binary inputs with a clean
  // AnalysisException instead of a runtime ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ppm_header requires a BINARY payload column, got ${child.dataType.sql}")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ppm_header"

  override def nullSafeEval(input: Any): Any =
    PpmCodec.parseHeader(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PpmCodec.parseHeader($c)")

  override protected def withNewChildInternal(c: Expression): PpmHeader =
    copy(child = c)
}

/** (binary P6 payload, outW, outH) → binary: a NEW canonical P6
  * container holding the nearest-neighbor resample
  * ([[PpmCodec.resize]]). */
case class PpmResize(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType && second.dataType == IntegerType
        && third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, INT, INT), got " +
        s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "ppm_resize"

  override def nullSafeEval(payload: Any, w: Any, h: Any): Any =
    PpmCodec.resize(payload.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, w, h) =>
      s"graft.functions.PpmCodec.resize($b, $w, $h)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PpmResize =
    copy(first = f, second = s, third = t)
}

/** (binary P6 payload, x0, x1) → binary: a NEW canonical P6 container
  * holding columns [x0, x1) of every source row
  * ([[PpmCodec.cropCols]]). */
case class PpmCropCols(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType && second.dataType == IntegerType
        && third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, INT, INT), got " +
        s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "ppm_crop_cols"

  override def nullSafeEval(payload: Any, x0: Any, x1: Any): Any =
    PpmCodec.cropCols(payload.asInstanceOf[Array[Byte]],
      x0.asInstanceOf[Int], x1.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, a, z) =>
      s"graft.functions.PpmCodec.cropCols($b, $a, $z)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PpmCropCols =
    copy(first = f, second = s, third = t)
}

/** binary P6 payload → array<bigint> [n_px, sumR, sumG, sumB, minR,
  * minG, minB, maxR, maxG, maxB] ([[PpmCodec.channelStats]]). */
case class PpmChannelStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ppm_channel_stats requires a BINARY payload column, got ${child.dataType.sql}")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ppm_channel_stats"

  override def nullSafeEval(input: Any): Any =
    PpmCodec.channelStats(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PpmCodec.channelStats($c)")

  override protected def withNewChildInternal(c: Expression): PpmChannelStats =
    copy(child = c)
}

/** binary P6 payload → array<bigint>: K 3×3×3 integer convolution
  * kernels (valid mode) over the decoded pixel grid, then 2×2 stride-2
  * MAX pooling — the deterministic conv featurizer one level deeper
  * than patch means ([[PpmCodec.convPool3x3]]). */
case class PpmConvPool3x3(child: Expression, weights: Array[Array[Long]])
    extends UnaryExpression with ArrayParamEquality {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ppm_conv_pool_3x3 requires a BINARY payload column, got ${child.dataType.sql}")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ppm_conv_pool_3x3"
  override protected def arrayParams: Seq[AnyRef] = Seq(weights)
  override protected def scalarParams: Seq[Any] = Nil

  override def nullSafeEval(input: Any): Any =
    PpmCodec.convPool3x3(input.asInstanceOf[Array[Byte]], weights)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weights", weights, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PpmCodec.convPool3x3($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): PpmConvPool3x3 =
    copy(child = c)
}

/** binary P6 payload → int64: perceptual difference hash over `buckets`
  * position buckets of the luminance run ([[PpmCodec.dhash]]) — packed
  * gradient bits, always non-negative (≤ 63 bits), the map-side half of
  * hamming-LSH image near-dup. */
case class PpmDHash(child: Expression, buckets: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ppm_dhash requires a BINARY payload column, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "ppm_dhash"

  override def nullSafeEval(input: Any): Any =
    PpmCodec.dhash(input.asInstanceOf[Array[Byte]], buckets)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PpmCodec.dhash($c, $buckets)")

  override protected def withNewChildInternal(c: Expression): PpmDHash =
    copy(child = c)
}

object MediaCodecFunctions {
  def ppmHeader(payload: Column): Column =
    ColumnBridge.column(PpmHeader(ColumnBridge.expression(payload)))

  def ppmDHash(payload: Column, buckets: Int): Column =
    ColumnBridge.column(PpmDHash(ColumnBridge.expression(payload), buckets))

  def ppmConvPool3x3(payload: Column, weights: Array[Array[Long]]): Column =
    ColumnBridge.column(PpmConvPool3x3(
      ColumnBridge.expression(payload), weights))

  def ppmChannelStats(payload: Column): Column =
    ColumnBridge.column(PpmChannelStats(ColumnBridge.expression(payload)))

  def ppmResize(payload: Column, outW: Column, outH: Column): Column =
    ColumnBridge.column(PpmResize(ColumnBridge.expression(payload),
      ColumnBridge.expression(outW), ColumnBridge.expression(outH)))

  def ppmCropCols(payload: Column, x0: Column, x1: Column): Column =
    ColumnBridge.column(PpmCropCols(ColumnBridge.expression(payload),
      ColumnBridge.expression(x0), ColumnBridge.expression(x1)))
}
