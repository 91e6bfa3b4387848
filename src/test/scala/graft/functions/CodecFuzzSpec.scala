package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import scala.util.{Failure, Success, Try}

/** Codec fuzz properties: random byte MUTATIONS over valid PPM / WAV
  * containers must either decode exactly as before (mutation outside
  * the region a codec reads for that decision), decode to a different
  * but well-formed result (a pixel/sample changed), or fail fast with
  * the NAMED contract error (IllegalArgumentException) — NEVER escape
  * with a raw JVM error (ArrayIndexOutOfBounds, NegativeArraySize,
  * NumberFormat, …), which is what silently-wrong offset arithmetic
  * looks like one refactor before it mis-decodes. The hand-picked
  * malformation classes live in MultimodalSpec; this suite sweeps the
  * space BETWEEN them. Deterministic seeds (the PropertySpec
  * discipline) so any failure is reproducible.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed0 + i)))

  /** The fuzz contract for one decode op: success, or IAE — nothing else. */
  private def iaeOrSuccess(label: String)(op: => Any): Unit =
    Try(op) match {
      case Success(_) => ()
      case Failure(_: IllegalArgumentException) => ()
      case Failure(e) =>
        fail(s"$label escaped with ${e.getClass.getName}: ${e.getMessage}")
    }

  // ---------------------------------------------------------------- PPM

  private case class PpmCase(bytes: Array[Byte], w: Int, h: Int, two: Boolean,
      dataOff: Int)

  private val ppmGen: Gen[PpmCase] = for {
    w <- Gen.choose(1, 12)
    h <- Gen.choose(1, 5)
    two <- Gen.oneOf(false, true)
    comment <- Gen.oneOf("", "# c\n", "#x y\n# z\n")
    sep <- Gen.oneOf(" ", "\n", "\t")
    px <- Gen.listOfN(w * h * 3 * (if (two) 2 else 1),
      Gen.choose(0, 255).map(_.toByte))
  } yield {
    val maxv = if (two) 65535 else 255
    val head = s"P6\n$comment$w$sep$h\n$maxv\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    PpmCase(head ++ px.toArray, w, h, two, head.length)
  }

  private def ppmOps(bytes: Array[Byte]): Seq[(String, () => Any)] = Seq(
    "ppm_header" -> (() => PpmCodec.parseHeader(bytes)),
    "ppm_channel_stats" -> (() => PpmCodec.channelStats(bytes)),
    "ppm_resize" -> (() => PpmCodec.resize(bytes, 5, 3)),
    "ppm_crop" -> (() => PpmCodec.cropCols(bytes, 0, 1)),
    "ppm_conv" -> (() => PpmCodec.convPool3x3(
      bytes, graft.ext.Multimodal.convWeights(1))),
    "ppm_dhash" -> (() => PpmCodec.dhash(bytes, 4)))

  test("PPM: valid containers parse to construction; every op succeeds") {
    samples(ppmGen, 120, 1000L).foreach { c =>
      val hdr = PpmCodec.parseHeader(c.bytes).toLongArray()
      assert(hdr.toSeq == Seq(c.w.toLong, c.h.toLong,
        if (c.two) 65535L else 255L, c.dataOff.toLong,
        c.w.toLong * c.h * 3 * (if (c.two) 2 else 1)))
      // ops with shape preconditions may IAE (conv needs ≥4×4); the
      // unconditional ones must succeed
      PpmCodec.channelStats(c.bytes)
      PpmCodec.resize(c.bytes, 5, 3)
      PpmCodec.cropCols(c.bytes, 0, 1)
      iaeOrSuccess("ppm_conv")(PpmCodec.convPool3x3(
        c.bytes, graft.ext.Multimodal.convWeights(1)))
      // dhash needs ≥ 4 pixels for 4 buckets; in contract it must be
      // non-negative (63-bit), out of contract it must IAE
      if (c.w * c.h >= 4) assert(PpmCodec.dhash(c.bytes, 4) >= 0L)
      else intercept[IllegalArgumentException](PpmCodec.dhash(c.bytes, 4))
    }
  }

  test("PPM: single-byte mutations never escape the IAE contract") {
    val mutated = for {
      c <- ppmGen
      idx <- Gen.choose(0, c.bytes.length - 1)
      b <- Gen.choose(0, 255).map(_.toByte)
    } yield (c, idx, b)
    samples(mutated, 400, 2000L).foreach { case (c, idx, b) =>
      val m = c.bytes.clone(); m(idx) = b
      ppmOps(m).foreach { case (label, op) => iaeOrSuccess(label)(op()) }
      // a mutation strictly inside the PIXEL region cannot change the
      // header parse — a codec whose header fields depend on pixel bytes
      // is reading out of its lane
      if (idx >= c.dataOff) {
        assert(PpmCodec.parseHeader(m).toLongArray().toSeq ==
          PpmCodec.parseHeader(c.bytes).toLongArray().toSeq,
          s"pixel-region mutation at $idx moved the header parse")
      }
    }
  }

  test("PPM: random truncations never escape the IAE contract") {
    val truncated = for {
      c <- ppmGen
      keep <- Gen.choose(0, c.bytes.length)
    } yield (c, keep)
    samples(truncated, 200, 3000L).foreach { case (c, keep) =>
      val m = java.util.Arrays.copyOf(c.bytes, keep)
      ppmOps(m).foreach { case (label, op) => iaeOrSuccess(label)(op()) }
    }
  }

  test("PPM: random garbage bytes never escape the IAE contract") {
    val garbage = for {
      n <- Gen.choose(0, 64)
      bs <- Gen.listOfN(n, Gen.choose(0, 255).map(_.toByte))
    } yield bs.toArray
    samples(garbage, 200, 4000L).foreach { m =>
      ppmOps(m).foreach { case (label, op) => iaeOrSuccess(label)(op()) }
    }
  }

  // ---------------------------------------------------------------- WAV

  private case class WavCase(bytes: Array[Byte], nFrames: Int)

  private val wavGen: Gen[WavCase] = for {
    nFrames <- Gen.choose(1, 24)
    rate <- Gen.oneOf(8000, 16000, 44100)
    data <- Gen.listOfN(nFrames * 4, Gen.choose(0, 255).map(_.toByte))
  } yield WavCase(WavCodec.wrapPcm16Stereo(data.toArray, rate), nFrames)

  private def wavOps(bytes: Array[Byte]): Seq[(String, () => Any)] = Seq(
    "wav_header" -> (() => WavCodec.parseHeader(bytes)),
    "wav_channel_stats" -> (() => WavCodec.channelStats(bytes)),
    "wav_crop" -> (() => WavCodec.cropFrames(bytes, 0L, 1L)))

  test("WAV: wrapped containers parse to construction; every op succeeds") {
    samples(wavGen, 120, 5000L).foreach { c =>
      val hdr = WavCodec.parseHeader(c.bytes).toLongArray()
      assert(hdr(0) == 2L && hdr(2) == 16L && hdr(3) == c.nFrames.toLong,
        s"header ${hdr.toSeq}")
      WavCodec.channelStats(c.bytes)
      WavCodec.cropFrames(c.bytes, 0L, c.nFrames.toLong)
    }
  }

  test("WAV: single-byte mutations never escape the IAE contract") {
    val mutated = for {
      c <- wavGen
      idx <- Gen.choose(0, c.bytes.length - 1)
      b <- Gen.choose(0, 255).map(_.toByte)
    } yield (c, idx, b)
    samples(mutated, 400, 6000L).foreach { case (c, idx, b) =>
      val m = c.bytes.clone(); m(idx) = b
      wavOps(m).foreach { case (label, op) => iaeOrSuccess(label)(op()) }
      // the canonical wrap puts the data chunk at byte 44; a mutation in
      // the sample region must leave the header parse untouched
      if (idx >= 44) {
        assert(WavCodec.parseHeader(m).toLongArray().toSeq ==
          WavCodec.parseHeader(c.bytes).toLongArray().toSeq,
          s"sample-region mutation at $idx moved the header parse")
      }
    }
  }

  test("WAV: random truncations and garbage never escape the IAE contract") {
    val truncated = for {
      c <- wavGen
      keep <- Gen.choose(0, c.bytes.length)
    } yield java.util.Arrays.copyOf(c.bytes, keep)
    samples(truncated, 200, 7000L).foreach { m =>
      wavOps(m).foreach { case (label, op) => iaeOrSuccess(label)(op()) }
    }
    val garbage = for {
      n <- Gen.choose(0, 64)
      bs <- Gen.listOfN(n, Gen.choose(0, 255).map(_.toByte))
    } yield bs.toArray
    samples(garbage, 200, 8000L).foreach { m =>
      wavOps(m).foreach { case (label, op) => iaeOrSuccess(label)(op()) }
    }
  }
}
