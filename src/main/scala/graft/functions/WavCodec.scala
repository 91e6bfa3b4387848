package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** A REAL byte-level RIFF/WAVE (PCM) codec — the second container
  * format behind the multimodal codec seam, proving the
  * [[PpmCodec]] pattern generalizes past one magic: chunk-walking
  * header parse (RIFF size accounting, fmt fields, data run), PCM-16
  * little-endian sample decode, and per-channel statistics — all on
  * actual container bytes in compiled codegen Expressions, with
  * fail-fast malformation classes for everything a real audio ingest
  * meets (wrong magic, truncated chunk walk, non-PCM format, byte-rate
  * inconsistency, partial frames).
  *
  * One compiled pass per row, zero shuffle — the payload never leaves
  * its partition; only header words and per-channel int64 stats flow
  * downstream (the 100 TB contract of every multimodal kernel here).
  */
object WavCodec {

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a RIFF/WAVE header; returns [n_channels, sample_rate,
    * bits_per_sample, n_frames, data_offset, data_bytes] as int64.
    * Grammar (RIFF spec + the canonical WAVE layout): "RIFF", uint32 LE
    * riff_size (= total − 8), "WAVE", then a chunk walk — each chunk is
    * a 4-byte tag + uint32 LE size + body, padded to even length — that
    * must yield a 16-byte PCM "fmt " chunk (audio_format 1, consistent
    * byte_rate = rate·block_align and block_align = channels·bits/8)
    * BEFORE the "data" chunk, whose size must divide into whole frames
    * and fit the payload exactly. Unknown chunks (LIST, cue, …) are
    * SKIPPED, as a real decoder must; every inconsistency throws —
    * silent tolerance is how a truncated shard poisons a training
    * set. */
  def parseHeader(bytes: Array[Byte]): ArrayData = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF")
      throw new IllegalArgumentException(
        "wav_header: bad magic — payload is not a RIFF container")
    if (tag(bytes, 8) != "WAVE")
      throw new IllegalArgumentException(
        "wav_header: RIFF form type is not WAVE")
    val riffSize = u32(bytes, 4)
    if (riffSize != bytes.length.toLong - 8L)
      throw new IllegalArgumentException(
        s"wav_header: RIFF size $riffSize disagrees with payload length " +
          s"${bytes.length} − 8 — truncated or padded container")
    var pos = 12
    var haveFmt = false
    var channels = 0; var rate = 0L; var bits = 0; var blockAlign = 0
    var dataOff = -1L; var dataBytes = -1L
    while (pos + 8 <= bytes.length && dataOff < 0) {
      val id = tag(bytes, pos)
      val sz = u32(bytes, pos + 4)
      val body = pos + 8
      if (body + sz > bytes.length)
        throw new IllegalArgumentException(
          s"wav_header: chunk '$id' promises $sz bytes at offset $body — " +
            "runs past the payload end")
      id match {
        case "fmt " =>
          if (sz < 16)
            throw new IllegalArgumentException(
              s"wav_header: fmt chunk carries $sz bytes, PCM needs 16")
          val audioFormat = u16(bytes, body)
          if (audioFormat != 1)
            throw new IllegalArgumentException(
              s"wav_header: audio format $audioFormat is not PCM (1)")
          channels = u16(bytes, body + 2)
          rate = u32(bytes, body + 4)
          val byteRate = u32(bytes, body + 8)
          blockAlign = u16(bytes, body + 12)
          bits = u16(bytes, body + 14)
          if (channels < 1 || channels > 2)
            throw new IllegalArgumentException(
              s"wav_header: $channels channels outside the supported [1, 2]")
          if (bits != 8 && bits != 16)
            throw new IllegalArgumentException(
              s"wav_header: $bits bits/sample — only PCM-8/PCM-16 supported")
          if (blockAlign != channels * bits / 8)
            throw new IllegalArgumentException(
              s"wav_header: block_align $blockAlign disagrees with " +
                s"$channels ch × $bits bits")
          if (byteRate != rate * blockAlign)
            throw new IllegalArgumentException(
              s"wav_header: byte_rate $byteRate disagrees with " +
                s"rate $rate × block_align $blockAlign")
          haveFmt = true
        case "data" =>
          if (!haveFmt)
            throw new IllegalArgumentException(
              "wav_header: data chunk precedes fmt — undecodable layout")
          if (sz % blockAlign != 0)
            throw new IllegalArgumentException(
              s"wav_header: data size $sz is not whole frames of $blockAlign")
          dataOff = body.toLong
          dataBytes = sz
        case _ => // unknown chunk: skip (LIST, cue, fact, …)
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      pos = body + sz.toInt + (sz.toInt & 1)
    }
    if (dataOff < 0)
      throw new IllegalArgumentException(
        "wav_header: no data chunk found in chunk walk")
    new GenericArrayData(Array(channels.toLong, rate, bits.toLong,
      dataBytes / blockAlign, dataOff, dataBytes))
  }

  /** Per-channel PCM sample statistics in one pass over the decoded
    * samples (int16 LE or uint8 per the parsed fmt): returns
    * [n_frames, n_channels, sum0, min0, max0, sum1, min1, max1] as
    * int64 — the q106 channel-stats pattern for audio (mean level, DC
    * offset and clipping detection are the classic audio-curation
    * signals). Mono payloads report (0, 0, 0) in the channel-1 slots.
    * Integer-exact, so engines agree bit-for-bit and downstream means
    * materialize as single divisions. */
  def channelStats(bytes: Array[Byte]): ArrayData = {
    val hdr = parseHeader(bytes)
    val channels = hdr.getLong(0).toInt
    val bits = hdr.getLong(2).toInt
    val nFrames = hdr.getLong(3)
    val off = hdr.getLong(4).toInt
    val sums = new Array[Long](2)
    val mins = new Array[Long](2)
    val maxs = new Array[Long](2)
    var c = 0
    while (c < channels) { mins(c) = Long.MaxValue; maxs(c) = Long.MinValue; c += 1 }
    var p = off
    var i = 0L
    while (i < nFrames) {
      var ch = 0
      while (ch < channels) {
        val v =
          if (bits == 16) (((bytes(p + 1) & 0xff) << 8) | (bytes(p) & 0xff)).toShort.toLong
          else (bytes(p) & 0xff).toLong
        sums(ch) += v
        if (v < mins(ch)) mins(ch) = v
        if (v > maxs(ch)) maxs(ch) = v
        p += bits / 8
        ch += 1
      }
      i += 1
    }
    if (channels < 2) { mins(1) = 0L; maxs(1) = 0L }
    if (nFrames == 0L) { // degenerate-but-valid: zero frames, empty stats
      mins(0) = 0L; maxs(0) = 0L; mins(1) = 0L; maxs(1) = 0L
    }
    new GenericArrayData(Array(nFrames, channels.toLong,
      sums(0), mins(0), maxs(0), sums(1), mins(1), maxs(1)))
  }

  /** Deterministic fixture adapter (the [[graft.ext.Multimodal.ppmWrap]]
    * pattern for audio): wrap raw bytes as a REAL canonical PCM-16
    * stereo RIFF/WAVE container — 44-byte header (RIFF size, 16-byte
    * PCM fmt, data size — all little-endian, built byte by byte) over
    * the input truncated to whole 4-byte frames — so the genuine
    * chunk-walking parser has actual container bytes to decode and
    * both engines can compute every expected field and sample from the
    * construction inputs. A byte-level builder (not string concat like
    * ppmWrap's ASCII header) because RIFF carries binary LE fields that
    * UTF-8 string casts would corrupt. */
  def wrapPcm16Stereo(bytes: Array[Byte], rate: Int): Array[Byte] = {
    if (rate < 1)
      throw new IllegalArgumentException(
        s"wav_wrap: sample rate $rate must be positive")
    val nFrames = bytes.length / 4
    buildCanonical(2, rate.toLong, 16, bytes, 0, nFrames * 4)
  }

  /** A canonical 44-byte-header PCM container over `data[off, off+len)`
    * — the one builder behind [[wrapPcm16Stereo]] and [[cropFrames]],
    * so a wrapped fixture and a cropped window can never disagree on
    * header layout. */
  private def buildCanonical(channels: Int, rate: Long, bits: Int,
      data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new Array[Byte](44 + len)
    def putTag(p: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { out(p + i) = s.charAt(i).toByte; i += 1 }
    }
    def put16(p: Int, v: Int): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(p: Int, v: Long): Unit = {
      out(p) = (v & 0xff).toByte
      out(p + 1) = ((v >> 8) & 0xff).toByte
      out(p + 2) = ((v >> 16) & 0xff).toByte
      out(p + 3) = ((v >> 24) & 0xff).toByte
    }
    val blockAlign = channels * bits / 8
    putTag(0, "RIFF"); put32(4, 36L + len); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16L)
    put16(20, 1); put16(22, channels); put32(24, rate)
    put32(28, rate * blockAlign); put16(32, blockAlign); put16(34, bits)
    putTag(36, "data"); put32(40, len.toLong)
    System.arraycopy(data, off, out, 44, len)
    out
  }

  /** Frames [a, b) of a parsed container, re-wrapped as a canonical
    * PCM container with the SAME fmt fields — the audio twin of
    * [[PpmCodec.cropCols]]: window-local analysis composes this with
    * [[channelStats]] without the payload ever leaving its partition.
    * Bounds are fail-fast (0 ≤ a ≤ b ≤ n_frames) — a silent clamp
    * would make a miscomputed window read as quiet audio instead of an
    * error. */
  /** Perceptual audio fingerprint — the dHash discipline
    * ([[PpmCodec.dhash]]) applied to a TWO-BAND energy envelope of the
    * decoded sample stream (band-energy sign hashing, the
    * chromaprint/Philips-robust-hash family's shape: Haitsma &
    * Kalker, "A Highly Robust Audio Fingerprint System", ISMIR 2002 —
    * their FFT band energies replaced by two exact integer bands so
    * both engines agree bit for bit):
    *
    *  - mono fold per frame: m_f = Σ channel samples (sum, not mean —
    *    no division, no rounding);
    *  - LOW band (envelope): e_f = |m_f|; HIGH band (first-difference
    *    roughness, the integer proxy for high-frequency energy):
    *    r_f = |m_f − m_{f−1}| (f ≥ 1);
    *  - `buckets` time buckets by the same i·B div n floor map as
    *    dHash; per-bucket means = sum div count (non-negative exact
    *    operands);
    *  - bits [0, B−1): adjacent-mean env gradients; bits
    *    [B−1, 2B−3]: adjacent-mean roughness gradients; bit 2B−2:
    *    spectral tilt (total roughness > total envelope).
    *
    * B = 32 packs exactly 63 bits (31 + 31 + 1), sharing the 7×9-band
    * Hamming LSH tail with the image hash. Loudness scaling shifts
    * every bucket mean together, so gradients are robust to gain-like
    * edits; a few-sample edit moves one or two bucket means slightly
    * (MultimodalSpec pins a planted 3-byte edit at small hamming)
    * while content changes flip many bits.
    *
    * Shape contract: 2 ≤ buckets ≤ 32 and nFrames ≥ 2·buckets (floor
    * map then puts ≥ 2 frames in every bucket, so every bucket has
    * ≥ 1 roughness diff — counts never zero). One compiled pass per
    * row, zero shuffle; 8 bytes flow downstream. */
  def envHash(bytes: Array[Byte], buckets: Int): Long = {
    if (buckets < 2 || buckets > 32)
      throw new IllegalArgumentException(
        s"wav_env_hash: buckets $buckets outside [2, 32]")
    val hdr = parseHeader(bytes)
    val channels = hdr.getLong(0).toInt
    val bits = hdr.getLong(2).toInt
    val n = hdr.getLong(3)
    val off = hdr.getLong(4).toInt
    if (n < 2L * buckets)
      throw new IllegalArgumentException(
        s"wav_env_hash: $n frames < ${2 * buckets} — every bucket needs " +
          "at least two frames for the roughness band")
    val envSum = new Array[Long](buckets)
    val envCnt = new Array[Long](buckets)
    val rghSum = new Array[Long](buckets)
    val rghCnt = new Array[Long](buckets)
    var p = off
    var prev = 0L
    var i = 0L
    while (i < n) {
      var m = 0L
      var ch = 0
      while (ch < channels) {
        m +=
          (if (bits == 16) (((bytes(p + 1) & 0xff) << 8) | (bytes(p) & 0xff)).toShort.toLong
           else (bytes(p) & 0xff).toLong)
        p += bits / 8
        ch += 1
      }
      val j = (i * buckets / n).toInt
      envSum(j) += math.abs(m)
      envCnt(j) += 1L
      if (i > 0L) {
        rghSum(j) += math.abs(m - prev)
        rghCnt(j) += 1L
      }
      prev = m
      i += 1
    }
    var hash = 0L
    var j = 0
    while (j < buckets - 1) {
      if (envSum(j) / envCnt(j) > envSum(j + 1) / envCnt(j + 1))
        hash |= 1L << j
      if (rghSum(j) / rghCnt(j) > rghSum(j + 1) / rghCnt(j + 1))
        hash |= 1L << (buckets - 1 + j)
      j += 1
    }
    var te = 0L; var tr = 0L
    j = 0
    while (j < buckets) { te += envSum(j); tr += rghSum(j); j += 1 }
    if (tr > te) hash |= 1L << (2 * buckets - 2)
    hash
  }

  def cropFrames(bytes: Array[Byte], a: Long, b: Long): Array[Byte] = {
    val hdr = parseHeader(bytes)
    val nFrames = hdr.getLong(3)
    if (a < 0 || b < a || b > nFrames)
      throw new IllegalArgumentException(
        s"wav_crop_frames: window [$a, $b) out of bounds for $nFrames frames")
    val channels = hdr.getLong(0).toInt
    val bits = hdr.getLong(2).toInt
    val blockAlign = channels * bits / 8
    val off = hdr.getLong(4)
    buildCanonical(channels, hdr.getLong(1), bits, bytes,
      (off + a * blockAlign).toInt, ((b - a) * blockAlign).toInt)
  }
}

/** binary WAV payload → array<bigint> [n_channels, sample_rate,
  * bits_per_sample, n_frames, data_offset, data_bytes]
  * ([[WavCodec.parseHeader]]). */
case class WavHeader(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_header requires a BINARY payload column, got ${child.dataType.sql}")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "wav_header"

  override def nullSafeEval(input: Any): Any =
    WavCodec.parseHeader(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WavCodec.parseHeader($c)")

  override protected def withNewChildInternal(c: Expression): WavHeader =
    copy(child = c)
}

/** binary WAV payload → array<bigint> [n_frames, n_channels, sum0,
  * min0, max0, sum1, min1, max1] ([[WavCodec.channelStats]]). */
case class WavChannelStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_channel_stats requires a BINARY payload column, got ${child.dataType.sql}")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "wav_channel_stats"

  override def nullSafeEval(input: Any): Any =
    WavCodec.channelStats(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WavCodec.channelStats($c)")

  override protected def withNewChildInternal(c: Expression): WavChannelStats =
    copy(child = c)
}

/** (binary WAV payload, buckets INT) → BIGINT two-band envelope
  * fingerprint ([[WavCodec.envHash]]) — the audio twin of [[PpmDHash]]. */
case class WavEnvHash(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType &&
        right.dataType == org.apache.spark.sql.types.IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_env_hash requires (BINARY, INT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType
  override def prettyName: String = "wav_env_hash"

  override def nullSafeEval(payload: Any, buckets: Any): Any =
    WavCodec.envHash(payload.asInstanceOf[Array[Byte]],
      buckets.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.functions.WavCodec.envHash($b, $k)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): WavEnvHash = copy(left = l, right = r)
}

/** (binary raw bytes, rate INT) → binary: a REAL canonical PCM-16
  * stereo RIFF/WAVE container ([[WavCodec.wrapPcm16Stereo]]) — the
  * fixture adapter, compiled like the kernels it feeds. */
case class WavWrap(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType &&
        right.dataType == org.apache.spark.sql.types.IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_wrap requires (BINARY, INT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_wrap"

  override def nullSafeEval(payload: Any, rate: Any): Any =
    WavCodec.wrapPcm16Stereo(
      payload.asInstanceOf[Array[Byte]], rate.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, r) =>
      s"graft.functions.WavCodec.wrapPcm16Stereo($b, $r)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): WavWrap = copy(left = l, right = r)
}

/** (binary WAV payload, a BIGINT, b BIGINT) → binary: frames [a, b)
  * re-wrapped canonically ([[WavCodec.cropFrames]]) — the audio twin
  * of [[PpmCropCols]]. */
case class WavCropFrames(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType && second.dataType == LongType
        && third.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, BIGINT, BIGINT), got " +
        s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_crop_frames"

  override def nullSafeEval(payload: Any, a: Any, b: Any): Any =
    WavCodec.cropFrames(payload.asInstanceOf[Array[Byte]],
      a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, a, b) =>
      s"graft.functions.WavCodec.cropFrames($p, $a, $b)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WavCropFrames =
    copy(first = f, second = s, third = t)
}

object WavCodecFunctions {
  def wavHeader(payload: Column): Column =
    ColumnBridge.column(WavHeader(ColumnBridge.expression(payload)))

  def wavChannelStats(payload: Column): Column =
    ColumnBridge.column(WavChannelStats(ColumnBridge.expression(payload)))

  def wavWrap(payload: Column, rate: Column): Column =
    ColumnBridge.column(WavWrap(ColumnBridge.expression(payload),
      ColumnBridge.expression(rate)))

  def wavCropFrames(payload: Column, a: Column, b: Column): Column =
    ColumnBridge.column(WavCropFrames(ColumnBridge.expression(payload),
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def wavEnvHash(payload: Column, buckets: Int): Column =
    ColumnBridge.column(WavEnvHash(ColumnBridge.expression(payload),
      org.apache.spark.sql.catalyst.expressions.Literal(buckets)))
}
