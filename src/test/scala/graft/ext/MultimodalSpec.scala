package graft.ext

import graft.SparkSpec
import graft.ext.Multimodal._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}

class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("attachBinary: BinaryType payload + typed metadata struct") {
    val df = attachBinary(graft.Tables.documents(spark, dir))
    assert(df.schema("content").dataType == BinaryType)
    val meta = df.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq ==
      Seq("media_type", "width", "height", "duration_ms"))
    val row = df.orderBy("media_id").head()
    assert(row.getAs[Array[Byte]]("content").nonEmpty)
  }

  test("binary payload round-trips through parquet") {
    withTempDir { tmp =>
      val df = attachBinary(graft.Tables.documents(spark, dir)).limit(10)
      df.write.mode("overwrite").parquet(s"$tmp/media")
      val back = spark.read.parquet(s"$tmp/media")
      assert(back.count() == 10)
      assert(back.schema("content").dataType == BinaryType)
    }
  }

  test("decode stub is deterministic and batch shape is respected") {
    val bytes = "hello multimodal world".getBytes("UTF-8")
    val a = decodeStubFeatures(bytes, 32)
    val b = decodeStubFeatures(bytes, 32)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 32)
    assert(a.toSeq != decodeStubFeatures("different".getBytes, 32).toSeq)

    val media = mediaFromDocs(spark, dir)
    val feats = extractFeatures(media, dim = 16, batchSize = 8)
    val rows = feats.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(r => r.n_bytes > 0))
    // determinism across runs
    val again = extractFeatures(media, dim = 16, batchSize = 200).collect()
    assert(rows.sortBy(_.media_id).map(_.features.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.features.toSeq).toSeq)
  }

  private def px(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v + 1).toByte, (v + 2).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  test("PpmCodec.resize: hand-computed nearest-neighbor resample is pixel-exact") {
    import graft.functions.PpmCodec
    // 2x2 RGB source: pixels 10 20 / 30 40, each a distinct 3-byte run
    val src = ascii("P6\n2 2\n255\n") ++ px(10) ++ px(20) ++ px(30) ++ px(40)
    // 4x4 upscale: sx = ⌊x·2/4⌋, sy = ⌊y·2/4⌋ → each pixel duplicates 2×2
    val up = PpmCodec.resize(src, 4, 4)
    val upRowTop = px(10) ++ px(10) ++ px(20) ++ px(20)
    val upRowBot = px(30) ++ px(30) ++ px(40) ++ px(40)
    assert(up.toSeq == (ascii("P6\n4 4\n255\n") ++
      upRowTop ++ upRowTop ++ upRowBot ++ upRowBot).toSeq)
    // kernel output must itself parse as a valid container
    assert(PpmCodec.parseHeader(up).toLongArray().toSeq ==
      Seq(4L, 4L, 255L, 11L, 48L))
    // 1x1 downscale picks source pixel (0,0)
    assert(PpmCodec.resize(src, 1, 1).toSeq ==
      (ascii("P6\n1 1\n255\n") ++ px(10)).toSeq)
    // asymmetric: 2x2 → 1x2 keeps column 0 of each row
    assert(PpmCodec.resize(src, 1, 2).toSeq ==
      (ascii("P6\n1 2\n255\n") ++ px(10) ++ px(30)).toSeq)
    // 16-bit container: 6-byte pixels copied whole
    val wide = ascii("P6\n2 1\n65535\n") ++
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    assert(PpmCodec.resize(wide, 1, 1).toSeq ==
      (ascii("P6\n1 1\n65535\n") ++ Array[Byte](1, 2, 3, 4, 5, 6)).toSeq)
    intercept[IllegalArgumentException](PpmCodec.resize(src, 0, 1))
    intercept[IllegalArgumentException](PpmCodec.resize(src, 1, -1))
    intercept[IllegalArgumentException]( // malformed source still fails fast
      PpmCodec.resize(ascii("P5\n1 1\n255\n") ++ px(0), 1, 1))
  }

  test("PpmCodec.convPool3x3: true 2D conv + max pool against a scalar reference") {
    import graft.functions.PpmCodec
    // 6x4 RGB source; the px helper makes sample (x, y, c) = f(x, y)+c,
    // so channel wiring matters too. f is QUADRATIC in (x, y): a linear
    // f is annihilated position-independently by zero-sum kernels (conv
    // of an affine plane is constant), which would mask pooling bugs.
    def grid(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] =
      ascii(s"P6\n$w $h\n255\n") ++
        (0 until h).flatMap(y => (0 until w).flatMap(x => px(f(x, y)))).toArray
    val q: (Int, Int) => Int = (x, y) => (x * x + 7 * y * y + 3 * x * y) % 97
    val qFlip: (Int, Int) => Int = (x, y) => q(x, 3 - y)
    val src = grid(6, 4, q)
    val wts = graft.ext.Multimodal.convWeights(2)
    // scalar reference: independent re-derivation of valid conv + 2x2/2 pool
    def ref(w: Int, h: Int, f: (Int, Int) => Int): Seq[Long] = {
      val convW = w - 2; val convH = h - 2
      val pW = convW / 2; val pH = convH / 2
      for {
        k <- 0 until wts.length; py <- 0 until pH; px2 <- 0 until pW
      } yield {
        def conv(ox: Int, oy: Int): Long =
          (for (dy <- 0 until 3; dx <- 0 until 3; c <- 0 until 3)
            yield wts(k)(dy * 9 + dx * 3 + c) * (f(ox + dx, oy + dy) + c)).sum
        Seq(conv(2 * px2, 2 * py), conv(2 * px2 + 1, 2 * py),
          conv(2 * px2, 2 * py + 1), conv(2 * px2 + 1, 2 * py + 1)).max
      }
    }
    assert(PpmCodec.convPool3x3(src, wts).toLongArray().toSeq == ref(6, 4, q))
    // vertical sensitivity: flipping the rows changes output
    val flipped = grid(6, 4, qFlip)
    assert(PpmCodec.convPool3x3(flipped, wts).toLongArray().toSeq ==
      ref(6, 4, qFlip))
    assert(PpmCodec.convPool3x3(src, wts).toLongArray().toSeq !=
      PpmCodec.convPool3x3(flipped, wts).toLongArray().toSeq)
    // zero-sum weights ⇒ a PER-CHANNEL-uniform image (flat f plus the
    // +c channel offset, uniform per channel) convolves to exactly 0:
    // Σ_i W·const + Σ_c (Σ_{dy,dx} W[·][c])·c — the first term dies by
    // zero-sum; the second is position-independent and cancels against
    // itself... it does NOT in general, so check against the reference
    // instead of asserting 0, and assert the CONSTANT-f response is
    // position-independent (all pooled cells equal per kernel)
    val flat = PpmCodec.convPool3x3(grid(6, 4, (_, _) => 137), wts)
      .toLongArray().toSeq
    assert(flat == ref(6, 4, (_, _) => 137))
    assert(flat.grouped(2).forall(g => g.distinct.size == 1),
      "constant image must give position-independent responses")
    // shape contract: fewer than one pooled cell fails fast
    intercept[IllegalArgumentException](
      PpmCodec.convPool3x3(grid(3, 4, (x, y) => x + y), wts))
    intercept[IllegalArgumentException](
      PpmCodec.convPool3x3(grid(6, 3, (x, y) => x + y), wts))
  }

  test("convWeights: md5-derived, zero-sum per kernel, deterministic") {
    val wts = graft.ext.Multimodal.convWeights(4)
    assert(wts.length == 4 && wts.forall(_.length == 27))
    wts.foreach(k => assert(k.sum == 0L, "zero-sum"))
    // bound used by the envelope arithmetic: |W| ≤ 27·2 + 54 = 108
    wts.foreach(k => assert(k.forall(w => math.abs(w) <= 108L)))
    assert(graft.ext.Multimodal.convWeights(4).map(_.toSeq).toSeq ==
      wts.map(_.toSeq).toSeq)
  }

  test("PpmCodec.cropCols: column strips are pixel-exact sub-containers") {
    import graft.functions.PpmCodec
    // 3x2 source; crop [1,2) picks the middle column of BOTH rows
    val src = ascii("P6\n3 2\n255\n") ++
      px(1) ++ px(2) ++ px(3) ++ px(4) ++ px(5) ++ px(6)
    assert(PpmCodec.cropCols(src, 1, 2).toSeq ==
      (ascii("P6\n1 2\n255\n") ++ px(2) ++ px(5)).toSeq)
    // full-width crop is an identity on pixels (header canonicalized)
    assert(PpmCodec.cropCols(src, 0, 3).toSeq == src.toSeq)
    intercept[IllegalArgumentException](PpmCodec.cropCols(src, 2, 2))
    intercept[IllegalArgumentException](PpmCodec.cropCols(src, -1, 1))
    intercept[IllegalArgumentException](PpmCodec.cropCols(src, 1, 4))
  }

  test("PpmCodec.channelStats: hand-computed per-channel sums/extrema, 8- and 16-bit") {
    import graft.functions.PpmCodec
    // 2x2 RGB: pixels (10,11,12) (20,21,22) / (30,31,32) (0,255,5)
    val src = ascii("P6\n2 2\n255\n") ++ Array[Byte](10, 11, 12, 20, 21, 22,
      30, 31, 32, 0, -1 /* 255 */, 5)
    // [n_px, sums RGB, mins RGB, maxs RGB]
    assert(PpmCodec.channelStats(src).toLongArray().toSeq == Seq(
      4L, 60L, 318L, 71L, 0L, 11L, 5L, 30L, 255L, 32L))
    // 16-bit samples decode big-endian: (0x0102, 0x0304, 0x0506)
    val wide = ascii("P6\n1 1\n65535\n") ++ Array[Byte](1, 2, 3, 4, 5, 6)
    assert(PpmCodec.channelStats(wide).toLongArray().toSeq == Seq(
      1L, 0x0102L, 0x0304L, 0x0506L, 0x0102L, 0x0304L, 0x0506L,
      0x0102L, 0x0304L, 0x0506L))
    // malformed containers still fail fast through the shared parse
    intercept[IllegalArgumentException](
      PpmCodec.channelStats(ascii("P5\n1 1\n255\n") ++ px(0)))
    // Column surface through the codegen path + analysis-time rejection
    val s = spark
    import s.implicits._
    val got = Seq(src).toDF("content")
      .select(graft.functions.MediaCodecFunctions.ppmChannelStats(
        org.apache.spark.sql.functions.col("content")).as("st"))
      .head().getSeq[Long](0)
    assert(got == Seq(4L, 60L, 318L, 71L, 0L, 11L, 5L, 30L, 255L, 32L))
    val err = intercept[org.apache.spark.sql.AnalysisException](
      Seq(1).toDF("x").select(
        graft.functions.MediaCodecFunctions.ppmChannelStats(
          org.apache.spark.sql.functions.col("x"))).collect())
    assert(err.getMessage.contains("ppm_channel_stats"))
  }

  test("sampleFramesPpm: frames partition the pixel columns; each parses as a valid container") {
    val wrapped = ppmWrap(
      graft.Tables.documents(spark, dir).filter(col("doc_id") % 3 === 2))
    val srcW = wrapped.select(col("media_id"),
      element_at(graft.functions.MediaCodecFunctions.ppmHeader(col("content")), 1)
        .as("w")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = sampleFramesPpm(wrapped, 4)
      .select(col("media_id"), col("frame_idx"), col("frame_w"),
        graft.functions.MediaCodecFunctions.ppmHeader(col("content")).as("h"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getSeq[Long](3)
      assert(h(0) == r.getLong(2)) // parsed width == declared frame_w
      assert(h(1) == 1L && h(2) == 255L)
    }
    rows.groupBy(_.getLong(0)).foreach { case (id, fs) =>
      assert(fs.map(_.getLong(2)).sum == srcW(id)) // strips partition columns
    }
  }

  test("resizePpm on wrapped docs: output containers re-parse at 16x2 with source pixel (0,0) first") {
    // deterministic 20-row subset: an unordered limit(20) re-executes
    // independently on each side of the self-join below and may pick
    // DIFFERENT rows per execution, shrinking the join
    val wrapped = ppmWrap(graft.Tables.documents(spark, dir))
      .filter(col("media_id") < 20)
    val out = resizePpm(wrapped, 16, 2)
      .select(col("media_id"),
        graft.functions.MediaCodecFunctions.ppmHeader(col("content")).as("h"),
        expr("substring(content, 13, 3)").as("p0"))
      .join(wrapped.select(col("media_id"),
        graft.functions.MediaCodecFunctions.ppmHeader(col("content")).as("sh"),
        col("content").as("src"))
        .select(col("media_id"),
          expr("substring(src, CAST(element_at(sh, 4) + 1 AS INT), 3)").as("src_p0")),
        "media_id")
      .collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getSeq[Long](1).take(2) == Seq(16L, 2L))
      // first output pixel == source pixel (0,0)
      assert(r.getAs[Array[Byte]]("p0").toSeq == r.getAs[Array[Byte]]("src_p0").toSeq)
    }
  }

  test("PpmCodec.dhash: hand-computed gradient bits, 8/16-bit, shape contracts") {
    import graft.functions.PpmCodec
    // 8x1 RGB, buckets=4 → 2 px per bucket. Luminance sums per pixel:
    // 33, 63, 18, 273, 3, 0, 765, 6 → bucket means (sum div cnt):
    // 48, 145, 1, 385 → bits: 48>145 F, 145>1 T, 1>385 F → hash = 2
    val src = ascii("P6\n8 1\n255\n") ++ px(10) ++ px(20) ++ px(5) ++
      px(90) ++ px(0) ++ Array[Byte](0, 0, 0) ++
      Array[Byte](-1, -1, -1) ++ px(1)
    assert(PpmCodec.dhash(src, 4) == 2L)

    // bucket boundaries follow the i·B div n floor map: same pixels as a
    // 4x2 container scan identically (row-major), so the hash is equal
    val twoRow = ascii("P6\n4 2\n255\n") ++ src.drop(ascii("P6\n8 1\n255\n").length)
    assert(PpmCodec.dhash(twoRow, 4) == 2L)

    // 16-bit samples: 4 px, lum = 258, 0, 256, 65535 → bits T,F,F → 1
    def px16(v: Int): Array[Byte] =
      Array[Byte]((v >> 8).toByte, v.toByte, 0, 0, 0, 0)
    val wide = ascii("P6\n4 1\n65535\n") ++
      px16(258) ++ px16(0) ++ px16(256) ++ px16(65535)
    assert(PpmCodec.dhash(wide, 4) == 1L)

    // shape contracts: named errors, never raw JVM faults
    intercept[IllegalArgumentException](PpmCodec.dhash(src, 1))
    intercept[IllegalArgumentException](PpmCodec.dhash(src, 65))
    intercept[IllegalArgumentException](PpmCodec.dhash(src, 9)) // 8 px < 9
  }

  test("dhash corpus: hashes non-negative; planted 3-byte edits within hamming 2") {
    val dh = dhashCorpus(graft.Tables.documents(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dh.valuesIterator.forall(_ >= 0L), "63-bit hash must stay non-negative")
    val planted = dh.keys.filter(_ >= DHashVariantOffset)
    assert(planted.nonEmpty)
    planted.foreach { vid =>
      val ham = java.lang.Long.bitCount(dh(vid) ^ dh(vid - DHashVariantOffset))
      assert(ham <= 2, s"variant $vid drifted to hamming $ham")
    }
    // and a CONTENT change flips many gradient bits: different docs are far
    val ids = dh.keys.filter(_ < DHashVariantOffset).toSeq.sorted.take(2)
    assert(java.lang.Long.bitCount(dh(ids(0)) ^ dh(ids(1))) > DHashMaxHamming)
  }

  test("WavCodec.envHash: hand-computed two-band bits, layout, shape contracts") {
    import graft.functions.WavCodec
    def pcm(frames: Seq[(Int, Int)]): Array[Byte] = {
      val raw = frames.flatMap { case (l, r) =>
        Seq(l & 0xff, (l >> 8) & 0xff, r & 0xff, (r >> 8) & 0xff)
      }.map(_.toByte).toArray
      WavCodec.wrapPcm16Stereo(raw, 8000)
    }
    // B=2 layout: bit 0 env gradient, bit 1 rough gradient, bit 2 tilt.
    // m = [10,10,2,2]: env means 10 vs 2 -> bit0; rough means 0 vs 4 ->
    // no bit1; tilt 8 < 24 -> no bit2
    assert(WavCodec.envHash(pcm(Seq((10, 0), (10, 0), (2, 0), (2, 0))), 2) == 1L)
    // m = [200,-200,200,-200]: env means equal, rough means equal,
    // tilt 1200 > 800 -> only bit2
    assert(WavCodec.envHash(
      pcm(Seq((100, 100), (-100, -100), (100, 100), (-100, -100))), 2) == 4L)
    // loudness scaling preserves every bit (gradients compare together)
    assert(WavCodec.envHash(pcm(Seq((20, 0), (20, 0), (4, 0), (4, 0))), 2) == 1L)
    // shape contracts: named errors
    intercept[IllegalArgumentException](
      WavCodec.envHash(pcm(Seq((1, 0), (1, 0), (1, 0), (1, 0))), 1))
    intercept[IllegalArgumentException](
      WavCodec.envHash(pcm(Seq((1, 0), (1, 0), (1, 0), (1, 0))), 33))
    intercept[IllegalArgumentException]( // 4 frames < 2*4 buckets
      WavCodec.envHash(pcm(Seq((1, 0), (1, 0), (1, 0), (1, 0))), 4))
  }

  test("audio fp corpus: hashes non-negative; planted 3-byte edits within hamming 6") {
    val ah = audioFpCorpus(graft.Tables.documents(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ah.valuesIterator.forall(_ >= 0L), "63-bit hash must stay non-negative")
    val planted = ah.keys.filter(_ >= DHashVariantOffset)
    assert(planted.nonEmpty)
    planted.foreach { vid =>
      val ham = java.lang.Long.bitCount(ah(vid) ^ ah(vid - DHashVariantOffset))
      assert(ham <= DHashMaxHamming, s"variant $vid drifted to hamming $ham")
    }
    // different clips are far apart
    val ids = ah.keys.filter(_ < DHashVariantOffset).toSeq.sorted.take(2)
    assert(java.lang.Long.bitCount(ah(ids(0)) ^ ah(ids(1))) > DHashMaxHamming)
  }

  test("dhash banding is exact at the radius: all-old-bands-touched hamming-6 pair collides") {
    // Adversarial pair for the pre-round-14 4×16 banding: 6 differing
    // bits spread 2+2+1+1 across the four old 16-bit bands
    // ({1,9, 17,25, 33, 49}) — every old band touched, so the old band
    // join produced NO candidate and silently dropped an in-radius
    // pair. Pigeonhole needs bands ≥ radius+1: with 7×9 bands over 63
    // bits, any ≤6-bit diff leaves ≥1 band untouched.
    val a = 0x123456789ABCDL // arbitrary 63-bit hash
    val diff = Seq(1, 9, 17, 25, 33, 49).map(1L << _).reduce(_ | _)
    val b = a ^ diff
    assert(java.lang.Long.bitCount(a ^ b) == DHashMaxHamming)
    def bandsOf(h: Long, nBands: Int, bits: Int, mask: Long): Seq[(Int, Long)] =
      (0 until nBands).map(i => i -> ((h >>> (bits * i)) & mask))
    // old banding: no shared band (the bug ADVICE flagged)
    val oldShared = bandsOf(a, 4, 16, 65535L).toSet
      .intersect(bandsOf(b, 4, 16, 65535L).toSet)
      .filter { case (i, _) => i < 3 } ++ // last old band was 15-bit
      (if (((a >>> 48) & 32767L) == ((b >>> 48) & 32767L)) Set(3 -> 0L) else Set())
    assert(oldShared.isEmpty, "pair deliberately constructed to defeat 4x16 banding")
    // current banding (the q155 constants): at least one exact band match
    val shared = bandsOf(a, DHashBands, DHashBandBits, DHashBandMask).toSet
      .intersect(bandsOf(b, DHashBands, DHashBandBits, DHashBandMask).toSet)
    assert(shared.nonEmpty, "7x9 banding must catch every hamming<=6 pair")
    // and exhaustively: EVERY 6-subset of positions leaves >=1 band clean
    // (63 choose 6 is large; check the pigeonhole directly instead —
    // 6 diff bits can touch at most 6 of the 7 bands)
    assert(DHashBands > DHashMaxHamming)
    assert(DHashBands * DHashBandBits == 63)
  }

  test("PpmCodec: real container bytes parse; every malformation class fails fast") {
    import graft.functions.PpmCodec
    def ppm(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    // hand-built 2x1 container with a comment in the header
    val ok = PpmCodec.parseHeader(
      ppm("P6\n# a comment\n2 1\n255\n") ++ Array.fill[Byte](6)(7))
    assert(ok.toLongArray().toSeq == Seq(2L, 1L, 255L, 23L, 6L))
    // 16-bit samples: maxval > 255 doubles the pixel run
    val wide = PpmCodec.parseHeader(
      ppm("P6\n1 1\n65535\n") ++ Array.fill[Byte](6)(1))
    assert(wide.toLongArray().toSeq == Seq(1L, 1L, 65535L, 13L, 6L))
    intercept[IllegalArgumentException] { // wrong magic
      PpmCodec.parseHeader(ppm("P5\n1 1\n255\n") ++ Array.fill[Byte](3)(0))
    }
    intercept[IllegalArgumentException] { // fused magic+width token:
      // spec requires whitespace after 'P6' — must not parse width=123
      PpmCodec.parseHeader(ppm("P6123 1\n255\n") ++ Array.fill[Byte](369)(0))
    }
    intercept[IllegalArgumentException] { // truncated pixel run
      PpmCodec.parseHeader(ppm("P6\n2 1\n255\n") ++ Array.fill[Byte](5)(0))
    }
    intercept[IllegalArgumentException] { // padded pixel run
      PpmCodec.parseHeader(ppm("P6\n1 1\n255\n") ++ Array.fill[Byte](4)(0))
    }
    intercept[IllegalArgumentException] { // degenerate dims
      PpmCodec.parseHeader(ppm("P6\n0 1\n255\n"))
    }
    intercept[IllegalArgumentException] { // non-digit dimension
      PpmCodec.parseHeader(ppm("P6\nx 1\n255\n"))
    }
    intercept[IllegalArgumentException] { // maxval out of range
      PpmCodec.parseHeader(ppm("P6\n1 1\n70000\n") ++ Array.fill[Byte](6)(0))
    }
    intercept[IllegalArgumentException] { // header cut mid-field
      PpmCodec.parseHeader(ppm("P6\n2 "))
    }
    intercept[IllegalArgumentException] { // int32 overflow in width
      PpmCodec.parseHeader(ppm("P6\n99999999999 1\n255\n"))
    }
  }

  test("WavCodec: real RIFF bytes parse + stat; every malformation class fails fast") {
    import graft.functions.WavCodec
    // wrap round-trip: 8 payload bytes → 2 stereo PCM-16 frames with
    // hand-computable samples: L = (1, −1), R = (2, −32768)
    val payload = Array[Byte](1, 0, 2, 0, -1, -1, 0, -128)
    val wav = WavCodec.wrapPcm16Stereo(payload, 8000)
    assert(wav.length == 52)
    assert(WavCodec.parseHeader(wav).toLongArray().toSeq ==
      Seq(2L, 8000L, 16L, 2L, 44L, 8L))
    assert(WavCodec.channelStats(wav).toLongArray().toSeq ==
      Seq(2L, 2L, 0L, -1L, 1L, -32766L, -32768L, 2L))
    // partial trailing frame is truncated away by the wrap
    assert(WavCodec.parseHeader(
      WavCodec.wrapPcm16Stereo(Array[Byte](1, 0, 2, 0, 9), 8000))
      .toLongArray()(3) == 1L)

    // unknown chunks (LIST here) are skipped, as a real decoder must
    def tagB(s: String) = s.getBytes("US-ASCII")
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val fmtChunk = tagB("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(8000) ++ le32(32000) ++ le16(4) ++ le16(16)
    val dataChunk = tagB("data") ++ le32(4) ++ Array[Byte](1, 0, 2, 0)
    def riff(chunks: Array[Byte]): Array[Byte] =
      tagB("RIFF") ++ le32(4 + chunks.length) ++ tagB("WAVE") ++ chunks
    val withList = riff(fmtChunk ++ tagB("LIST") ++ le32(2) ++
      Array[Byte]('a', 'b') ++ dataChunk)
    assert(WavCodec.parseHeader(withList).toLongArray().toSeq ==
      Seq(2L, 8000L, 16L, 1L, 54L, 4L))
    // odd-sized unknown chunk carries a pad byte (RIFF word alignment)
    val withOdd = riff(fmtChunk ++ tagB("note") ++ le32(1) ++
      Array[Byte]('x', 0) ++ dataChunk)
    assert(WavCodec.parseHeader(withOdd).toLongArray()(3) == 1L)

    def patched(p: Int, b: Byte) = { val c = wav.clone(); c(p) = b; c }
    intercept[IllegalArgumentException] { // wrong magic
      WavCodec.parseHeader(patched(0, 'X'.toByte))
    }
    intercept[IllegalArgumentException] { // RIFF but not WAVE
      WavCodec.parseHeader(patched(8, 'A'.toByte))
    }
    intercept[IllegalArgumentException] { // riff size disagrees (truncated)
      WavCodec.parseHeader(wav.dropRight(1))
    }
    intercept[IllegalArgumentException] { // non-PCM audio format
      WavCodec.parseHeader(patched(20, 2))
    }
    intercept[IllegalArgumentException] { // block_align ≠ ch·bits/8
      WavCodec.parseHeader(patched(32, 6))
    }
    intercept[IllegalArgumentException] { // byte_rate ≠ rate·block_align
      WavCodec.parseHeader(patched(28, 1))
    }
    intercept[IllegalArgumentException] { // data size not whole frames
      WavCodec.parseHeader(patched(40, 7))
    }
    intercept[IllegalArgumentException] { // data chunk precedes fmt
      WavCodec.parseHeader(riff(dataChunk ++ fmtChunk))
    }
    intercept[IllegalArgumentException] { // no data chunk at all
      WavCodec.parseHeader(riff(fmtChunk))
    }
    intercept[IllegalArgumentException] { // chunk promises bytes past end
      val bad = fmtChunk ++ tagB("data") ++ le32(400)
      WavCodec.parseHeader(riff(bad))
    }
    // analysis-time type contract, like the Ppm kernels
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      graft.Tables.documents(spark, dir)
        .select(graft.functions.WavCodecFunctions.wavHeader(col("text")))
        .collect()
    }
    assert(err.getMessage.contains("BINARY"))
  }

  test("WavCodec.cropFrames: window slices re-wrap canonically; bounds fail fast") {
    import graft.functions.WavCodec
    // 3 stereo frames with distinct hand-computable samples per frame:
    // f0 = (1, 2), f1 = (-1, -32768), f2 = (300, -300)
    val payload = Array[Byte](1, 0, 2, 0, -1, -1, 0, -128, 44, 1, -44, -2)
    val wav = WavCodec.wrapPcm16Stereo(payload, 8000)
    // full-range crop round-trips to an identical container
    assert(WavCodec.cropFrames(wav, 0L, 3L).toSeq == wav.toSeq)
    // single-frame windows carry exactly that frame's samples
    assert(WavCodec.channelStats(WavCodec.cropFrames(wav, 0L, 1L))
      .toLongArray().toSeq == Seq(1L, 2L, 1L, 1L, 1L, 2L, 2L, 2L))
    assert(WavCodec.channelStats(WavCodec.cropFrames(wav, 1L, 2L))
      .toLongArray().toSeq ==
        Seq(1L, 2L, -1L, -1L, -1L, -32768L, -32768L, -32768L))
    assert(WavCodec.channelStats(WavCodec.cropFrames(wav, 2L, 3L))
      .toLongArray().toSeq == Seq(1L, 2L, 300L, 300L, 300L, -300L, -300L, -300L))
    // a crop parses as a first-class container (header fields re-derived)
    assert(WavCodec.parseHeader(WavCodec.cropFrames(wav, 1L, 3L))
      .toLongArray().toSeq == Seq(2L, 8000L, 16L, 2L, 44L, 8L))
    // empty window is valid (a == b); zero frames, empty stats
    assert(WavCodec.channelStats(WavCodec.cropFrames(wav, 2L, 2L))
      .toLongArray().toSeq == Seq(0L, 2L, 0L, 0L, 0L, 0L, 0L, 0L))
    // out-of-bounds windows fail fast, never clamp
    intercept[IllegalArgumentException](WavCodec.cropFrames(wav, -1L, 2L))
    intercept[IllegalArgumentException](WavCodec.cropFrames(wav, 2L, 1L))
    intercept[IllegalArgumentException](WavCodec.cropFrames(wav, 0L, 4L))
  }

  test("ppmWrap emits valid containers; the compiled parse round-trips construction") {
    val wrapped = ppmWrap(graft.Tables.documents(spark, dir))
    val rows = wrapped
      .select(col("media_id"),
        graft.functions.MediaCodecFunctions.ppmHeader(col("content")).as("h"),
        octet_length(col("content")).cast("long").as("total"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getSeq[Long](1)
      assert(h(1) == 1L && h(2) == 255L) // h=1, 8-bit
      assert(h(3) + h(4) == r.getLong(2)) // offset + pixels == container
      assert(h(4) == 3L * h(0)) // exactly 3 bytes per pixel
    }
  }

  test("repartitionBySize bounds per-partition payload volume") {
    val media = attachBinary(graft.Tables.documents(spark, dir))
    // tiny budget → many partitions; each partition's payload stays
    // within ~budget + one max item
    val parts = repartitionBySize(media, targetBytesPerPartition = 20000L)
    assert(parts.rdd.getNumPartitions > 1)
    val sizes = parts.select("content").rdd
      .mapPartitions(it => Iterator.single(it.map(_.getAs[Array[Byte]](0).length).sum))
      .collect()
    assert(sizes.sum == media.select("content").rdd
      .map(_.getAs[Array[Byte]](0).length).sum())
  }
}
