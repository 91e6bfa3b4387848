package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus the decode / feature-extract / resize /
  * frame-sample plumbing a training-data pipeline needs.
  *
  * The container codec AND the pixel kernels are REAL byte-level
  * implementations over netpbm P6 containers: header parse
  * ([[graft.functions.PpmCodec]], q99), nearest-neighbor resize
  * ([[resizePpm]], q73) and per-frame pixel extraction
  * ([[sampleFramesPpm]], q72) all operate on actual pixel bytes in
  * compiled codegen Expressions. The ONLY remaining stand-in is the
  * learned featurizer (a CLIP-style embedding model has no
  * in-container implementation): [[decodeStubFeatures]] derives
  * features deterministically from payload bytes, keeping the
  * signature, batching shape (the Scala analog of mapInPandas:
  * mapPartitions over grouped batches so a real model amortizes init
  * per batch), and size-aware repartitioning a model swap would keep.
  *
  * Scale notes (100 TB): payloads never leave their partition — all
  * kernels are map-side; only extracted features/metadata (KBs per item,
  * not the media bytes) flow into downstream joins/aggs. Repartitioning
  * by cumulative payload size bounds per-task bytes, which matters when
  * item sizes are skewed (a 4 GB video next to 10 KB thumbnails).
  */
object Multimodal extends QueryModule {

  final case class MediaMeta(
      media_type: String, width: Int, height: Int, duration_ms: Long)
  final case class MediaRecord(
      media_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      media_id: Long, media_type: String, n_bytes: Long, features: Array[Float])

  /** Deterministic fixture adapter: documents.text becomes the opaque
    * payload (UTF-8 bytes) with metadata synthesized from stable columns
    * — a stand-in for reading real media files alongside a metadata
    * manifest. */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        (col("doc_id") % 640 + 16).cast("int").as("width"),
        (col("doc_id") % 480 + 16).cast("int").as("height"),
        (col("n_chars") * 10L).as("duration_ms")).as("meta"))

  /** Wrap each document's bytes into a REAL P6 PPM container — a valid
    * netpbm payload (magic, `#` comment, ASCII dims, maxval, exactly
    * 3·w·h pixel bytes) built from stable columns, so the genuine
    * byte-level parser ([[graft.functions.PpmCodec]], q99) has actual
    * container bytes to decode and both engines can compute the
    * expected header fields from the construction inputs. w =
    * byte_len/3 pixels in one row; docs shorter than one pixel are
    * filtered (a 0-width PPM is malformed by spec). */
  def ppmWrap(docs: DataFrame): DataFrame = {
    val bin = col("text").cast("binary")
    val w = expr("CAST(octet_length(text) AS BIGINT) div 3")
    docs
      .filter(octet_length(col("text")) >= 3)
      .select(col("doc_id").as("media_id"),
        concat(
          concat(lit("P6\n# doc "), col("doc_id").cast("string"), lit("\n"),
            w.cast("string"), lit(" 1\n255\n")).cast("binary"),
          bin.substr(lit(1), (w * 3L).cast("int"))).as("content"))
  }

  // -------------------------------------------------------------------
  // Codec seam. The CONTAINER half is real: graft.functions.PpmCodec
  // parses actual P6 bytes (q99 hash-checks it end to end) and a real
  // deployment adds JPEG/ffmpeg the same way — one codegen Expression
  // per format. The FEATURE half below stays a deterministic stand-in:
  // a learned featurizer (CLIP-style embedding) has no in-container
  // implementation, so features derive from the payload bytes with an
  // FNV-1a rolling hash — signature and call sites are what a real
  // model swap would keep, and tests are exact.
  private[ext] def decodeStubFeatures(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 2166136261L
    var i = 0
    while (i < content.length) {
      h = (h ^ (content(i) & 0xff)) * 16777619L
      out(math.abs((h % dim).toInt)) += 1.0f
      i += 1
    }
    var j = 0
    while (j < dim) { out(j) = out(j) / math.max(1, content.length); j += 1 }
    out
  }

  /** Batched feature extraction — the mapInPandas shape in Scala:
    * partitions are processed in batches of `batchSize` so a real
    * decoder initializes per batch (codec context, model weights) and
    * the peak memory per task is bounded by batch × item size. */
  def extractFeatures(
      media: Dataset[MediaRecord], dim: Int = 32, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch init would happen here (decoder/model handle)
        batch.iterator.map { m =>
          MediaFeatures(m.media_id, m.meta.media_type,
            m.content.length.toLong, decodeStubFeatures(m.content, dim))
        }
      }
    }
  }

  /** REAL pixel-level resize: nearest-neighbor resample of each P6
    * container to `w`×`h` via the compiled [[graft.functions.PpmResize]]
    * kernel — every output pixel's 3 sample bytes are copied from its
    * floor-mapped source pixel and re-wrapped in a canonical P6 header.
    * One codegen pass per row, zero shuffle; payloads never leave their
    * partition. */
  def resizePpm(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("content",
      graft.functions.MediaCodecFunctions.ppmResize(
        col("content"), lit(w), lit(h)))

  /** REAL pixel-level frame sampling: 1→N generator over P6 payloads —
    * frame i of n is the vertical pixel strip of columns
    * [⌊w·i/n⌋, ⌊w·(i+1)/n⌋), extracted with the compiled
    * [[graft.functions.PpmCropCols]] kernel as its own valid P6
    * container. Frames that would be zero-width (source narrower than
    * n columns) are dropped — a 0-width PPM is malformed by spec.
    * Emits (media_id, frame_idx, frame_w, content). */
  def sampleFramesPpm(media: DataFrame, n: Int): DataFrame = {
    val w = element_at(
      graft.functions.MediaCodecFunctions.ppmHeader(col("content")), 1)
    media
      .select(col("media_id"), col("content"), w.as("src_w"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_idx"))
      .withColumn("fa", expr(s"CAST((src_w * frame_idx) div $n AS INT)"))
      .withColumn("fb", expr(s"CAST((src_w * (frame_idx + 1)) div $n AS INT)"))
      .filter(col("fb") > col("fa"))
      .select(col("media_id"), col("frame_idx"),
        (col("fb") - col("fa")).cast("long").as("frame_w"),
        graft.functions.MediaCodecFunctions.ppmCropCols(
          col("content"), col("fa"), col("fb")).as("content"))
  }

  /** REAL pixel-space embedding — the deterministic half of a media
    * featurizer computed from ACTUAL pixel bytes, end to end: each P6
    * payload splits into `nFrames` vertical patches ([[sampleFramesPpm]]'s
    * bounds, inlined so no explode/shuffle happens), each patch reduces
    * to its 3 per-channel integer means (×100, floored — the q106
    * kernel), the 3·nFrames-dim feature vector CENTERS on its own
    * integer mean (removing the shared brightness direction, so the
    * embedding cloud spreads on CONTRAST — without this every vector
    * sits within ~0.01 of the corpus mean and any centroid partition
    * degenerates to one cell), and the centered integers JL-project to
    * `outDims` dims through the md5-derived ±1 sign matrix
    * ([[graft.functions.SignedProject]], q76). The projection rescales
    * to unit-ish doubles (÷1e4) so it feeds the EXISTING semantic-dedup
    * / ANN stack unchanged (q111 runs semanticDedup over these
    * embeddings under one oracle).
    *
    * Exactness envelope: features are bounded 0..25500 by construction
    * (means of byte samples ×100), so |proj| ≤ 3·nFrames·25500 — at the
    * 4×16 default ≤ 3.1e5 — and the downstream ×1e7-scaled squared norm
    * Σ(1000·p)² ≤ 16·9.4e10·1e6 ≈ 1.5e18 < 2^63: every stage stays in
    * exact int64 on BOTH engines for any input, not just the fixture.
    *
    * Every stage is a compiled map-side kernel over the payload's own
    * partition — featurization shuffles NOTHING; only the outDims-double
    * embedding flows downstream. What remains a stand-in after this is
    * exactly the LEARNED model call ([[decodeStubFeatures]]): a CLIP
    * replacement would swap the patch-mean pooling for model inference
    * and keep this signature, batching, and downstream plumbing.
    *
    * Input rows need (media_id, content) with ≥ nFrames pixels per
    * payload (every patch must be non-empty — a 0-width PPM is
    * malformed by spec); callers filter first, as q111 does. */
  def pixelEmbedding(
      media: DataFrame, nFrames: Int = 4, outDims: Int = 16): DataFrame = {
    import graft.functions.MediaCodecFunctions._
    val w = element_at(ppmHeader(col("content")), 1)
    val withStats = (0 until nFrames).foldLeft(media.withColumn("_w", w)) {
      (df, f) =>
        df.withColumn(s"_st$f",
          ppmChannelStats(ppmCropCols(col("content"),
            expr(s"CAST((_w * $f) div $nFrames AS INT)"),
            expr(s"CAST((_w * ${f + 1}) div $nFrames AS INT)"))))
    }
    // feature k = 3·f + c: patch f's channel-c mean ×100 (exact integer
    // division — st[0] is the patch pixel count, st[1+c] the channel sum)
    val featExpr = (0 until nFrames).flatMap { f =>
      (0 until 3).map(c => s"(_st$f[${c + 1}] * 100L) div _st$f[0]")
    }.mkString("array(", ", ", ")")
    val dims = 3 * nFrames
    val signs = graft.functions.VectorFunctions.rpSigns(dims, outDims)
    withStats
      .withColumn("_feat0", expr(featExpr))
      // per-item integer mean over NON-NEGATIVE features: truncating and
      // flooring division agree, so Spark `div` ≡ DuckDB `//` here
      .withColumn("_mu", expr(s"aggregate(_feat0, 0L, (a, x) -> a + x) div ${dims}L"))
      .withColumn("_feat", expr("transform(_feat0, x -> x - _mu)"))
      .withColumn("emb", transform(
        graft.functions.VectorFunctions.signedProject(col("_feat"), signs),
        p => p.cast("double") / lit(1e4)))
      .select(col("media_id"), col("emb"))
  }

  /** md5-derived ZERO-SUM integer conv weights: raw w[k][dy·9+dx·3+c] =
    * h60("conv k dy dx c") % 5 − 2 ∈ {−2..2}, then W = 27·w − Σw per
    * kernel — integer-exact zero-sum (Σ W = 27·Σw − 27·Σw = 0), the
    * edge-detector discipline. Zero-sum is LOAD-BEARING: a kernel with
    * nonzero mass responds ∝ its weight sum × local brightness, which
    * is a FIXED cross-feature pattern shared by every item — measured
    * on the fixture, it collapsed every embedding into one centroid
    * cell. Zero-sum kernels respond only to local contrast, so the
    * embedding directions are item-specific. Same 60-bit md5 both
    * engines compute ⇒ the oracle derives the identical grid
    * relationally (the q76 sign-grid discipline, one level richer). */
  def convWeights(k: Int): Array[Array[Long]] =
    Array.tabulate(k) { ki =>
      val raw = Array.tabulate(27) { i =>
        val dy = i / 9
        val dx = (i % 9) / 3
        val c = i % 3
        graft.functions.HashKernels.md5h60(
          org.apache.spark.unsafe.types.UTF8String.fromString(
            s"conv $ki $dy $dx $c")) % 5 - 2
      }
      val s = raw.sum
      raw.map(w => 27L * w - s)
    }

  /** CONV featurizer — the last featurizer stand-in retired one level
    * deeper than [[pixelEmbedding]]'s patch means: resize every P6
    * payload to a fixed 16×8 grid (the REAL resample kernel), run K
    * genuine 3×3×3 integer convolutions + 2×2 stride-2 max pooling
    * over the decoded samples ([[graft.functions.PpmCodec.convPool3x3]]
    * — a true 2D kernel, vertical-structure-sensitive), shift the
    * K·21 pooled features by +743580 (= the |conv| bound Σ|W|·255 ≤
    * 27·108·255, so the centering division sees only non-negative
    * operands where Spark div ≡ DuckDB //; centering then erases the
    * constant), center, and JL-project to `outDims` through the md5 ±1
    * grid. Rescale ÷2e6 — the smallest power-of-ten-ish divisor whose
    * WORST CASE stays exact: |proj| ≤ 84·2·743580 ≈ 1.25e8 (inside
    * SignedProject's 7.6e8 per-coordinate guard), coords ≤ 62.5, and
    * the ×1e7-scaled squared norm ≤ 16·(6.25e8)² ≈ 6.3e18 < 2^63 for
    * ANY input (the q116 envelope discipline). Typical fixture norms
    * land ~0.1, far below the worst case (text bytes span ~[97,122],
    * not [0,255]) — q134 therefore pairs this embedding with a
    * ÷100-scaled centroid table so cell assignment is driven by
    * DIRECTION, not by which centroid happens to have the smallest
    * norm. Every stage is a
    * compiled map-side kernel; only the outDims-double embedding flows
    * downstream. What remains a stand-in after this is exactly the
    * LEARNED model call ([[decodeStubFeatures]]). */
  def convEmbedding(media: DataFrame, k: Int = 4, outDims: Int = 16): DataFrame = {
    import graft.functions.MediaCodecFunctions._
    val dims = k * 3 * 7 // pooled planes at the 16×8 grid: pH = 3, pW = 7
    val signs = graft.functions.VectorFunctions.rpSigns(dims, outDims)
    resizePpm(media, w = 16, h = 8)
      .withColumn("_cf", ppmConvPool3x3(col("content"), convWeights(k)))
      .withColumn("_feat0", expr("transform(_cf, x -> x + 743580L)"))
      .withColumn("_mu",
        expr(s"aggregate(_feat0, 0L, (a, x) -> a + x) div ${dims}L"))
      .withColumn("_feat", expr("transform(_feat0, x -> x - _mu)"))
      .withColumn("emb", transform(
        graft.functions.VectorFunctions.signedProject(col("_feat"), signs),
        p => p.cast("double") / lit(2e6)))
      .select(col("media_id"), col("emb"))
  }

  /** The AUDIO twin of [[pixelEmbedding]] — a pixel-space→sample-space
    * transliteration proving the embedding seam is format-generic: each
    * canonical stereo PCM-16 container splits into `nWindows` frame
    * windows ([[graft.functions.WavCodec.cropFrames]], inlined — no
    * explode/shuffle), each window reduces to its per-channel integer
    * mean SHIFTED to non-negative (mean + 32768 ∈ [0, 65535] — sample
    * sums can be negative and the engines disagree on negative integer
    * division, so the shift keeps every `div` on non-negative operands
    * where truncation ≡ floor; centering later erases the constant),
    * the 2·nWindows feature vector centers on its own integer mean, and
    * JL-projects through the same md5 ±1 grid. The projection rescales
    * ÷1e6 (not q111's ÷1e4): features reach 65535, so |proj| ≤
    * 2·nWindows·65535 ≈ 1.05e6 at the 8-window default, and the
    * downstream ×1e7-scaled squared norm must stay in int64 —
    * Σ(10·p)² ≤ 16·1.1e14 ≈ 1.8e15 ≪ 2^63, with the same margin
    * q111's envelope note derives.
    *
    * Input rows need (media_id, content) with content a canonical
    * stereo PCM-16 container of ≥ nWindows frames (every window
    * non-empty); callers filter first, as q116 does. */
  def audioEmbedding(
      media: DataFrame, nWindows: Int = 8, outDims: Int = 16): DataFrame = {
    import graft.functions.WavCodecFunctions._
    val n = element_at(wavHeader(col("content")), 4) // n_frames
    val withStats = (0 until nWindows).foldLeft(media.withColumn("_n", n)) {
      (df, w) =>
        df.withColumn(s"_st$w",
          wavChannelStats(wavCropFrames(col("content"),
            expr(s"(_n * $w) div $nWindows"),
            expr(s"(_n * ${w + 1}) div $nWindows"))))
    }
    // feature k = 2·w + c: window w's channel-c mean, shifted into
    // [0, 65535] — st[0] is the window frame count, st[2]/st[5] the
    // channel sample sums
    val featExpr = (0 until nWindows).flatMap { w =>
      (0 until 2).map(c => s"(_st$w[${2 + 3 * c}] + 32768L * _st$w[0]) div _st$w[0]")
    }.mkString("array(", ", ", ")")
    val dims = 2 * nWindows
    val signs = graft.functions.VectorFunctions.rpSigns(dims, outDims)
    withStats
      .withColumn("_feat0", expr(featExpr))
      .withColumn("_mu", expr(s"aggregate(_feat0, 0L, (a, x) -> a + x) div ${dims}L"))
      .withColumn("_feat", expr("transform(_feat0, x -> x - _mu)"))
      .withColumn("emb", transform(
        graft.functions.VectorFunctions.signedProject(col("_feat"), signs),
        p => p.cast("double") / lit(1e6)))
      .select(col("media_id"), col("emb"))
  }

  /** Size-aware repartition: spread items so each task sees a bounded
    * payload volume. `range`-partitioning on a size-rank would be exact;
    * hashing on id is the cheap approximation used here, with the
    * target partition count derived from total bytes. */
  def repartitionBySize(
      media: DataFrame, targetBytesPerPartition: Long = 128L << 20): DataFrame = {
    val sizeRow = media.agg(sum(octet_length(col("content")))).head()
    val totalBytes = if (sizeRow.isNullAt(0)) 0L else sizeRow.getLong(0)
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    media.repartition(parts, col("media_id"))
  }

  def mediaFromDocs(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    attachBinary(T.documents(s, dir)).as[MediaRecord]
  }

  // -------------------------------------------------------------------
  // Driver-visible, oracle-checked queries: the binary-column plumbing
  // that IS expressible in both engines (payload sizes, fingerprints,
  // metadata aggregation). The stub kernels are covered by MultimodalSpec.

  // -------------------------------------------------------------------
  // dHash family constants + shared pieces (q154/q155).

  /** Position buckets for the perceptual hash — 63 gradient bits. */
  val DHashBuckets = 64
  /** Minimum payload bytes for the 64-bucket contract (64 px × 3). */
  val DHashMinBytes = 192
  /** Near-dup verify radius (bits). */
  val DHashMaxHamming = 6L
  /** LSH banding: 7 bands × 9 bits covering all 63 gradient bits
    * (63 = 7·9 exactly; bit 63 is never set). 7 bands ≥ radius+1, so
    * by pigeonhole any pair within hamming 6 leaves ≥ 1 band
    * untouched — the band join is EXACT for the radius. (4×16 bands,
    * used before round 14, only guarantee hamming ≤ 3: a 6-bit diff
    * spread 2+2+1+1 across 4 bands collides in no band.) */
  val DHashBands = 7
  val DHashBandBits = 9
  val DHashBandMask = 511L
  /** Planted-variant id offset for the q155 fixture. */
  val DHashVariantOffset = 1000000L

  // -------------------------------------------------------------------
  // Audio fingerprint family constants + shared pieces (q159/q160) —
  // the WAV-side completion of the dHash family: same 63-bit hash
  // width, same 7×9 Hamming banding tail, same planted-variant
  // protocol.

  /** Time buckets for the two-band envelope hash: 32 packs exactly
    * 31 env + 31 roughness + 1 tilt = 63 bits. */
  val AudioFpBuckets = 32
  /** Minimum payload bytes: 2·buckets stereo frames × 4 bytes. */
  val AudioFpMinBytes = 256

  /** Eligible docs ∪ planted 3-byte-edit variants, WAV-wrapped and
    * fingerprinted — the q160 corpus: (media_id, ahash). Same variant
    * construction as [[dhashCorpus]]: characters 31-33 rewritten to
    * 'zzz' (bytes 30-32 → samples 15-16 → two frames of ≥ 64), a
    * small perceptual edit the envelope hash must survive. */
  private[ext] def audioFpCorpus(docs: DataFrame): DataFrame = {
    val base = docs.filter(octet_length(col("text")) >= AudioFpMinBytes)
      .select(col("doc_id"), col("text"))
    val variants = base.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + DHashVariantOffset).as("doc_id"),
        concat(substring(col("text"), 1, 30), lit("zzz"),
          expr("substring(text, 34)")).as("text"))
    val ah = graft.functions.WavCodecFunctions.wavEnvHash(
      col("content"), AudioFpBuckets)
    base.unionByName(variants)
      .select(col("doc_id").as("media_id"),
        graft.functions.WavCodecFunctions.wavWrap(
          col("text").cast("binary"), lit(8000)).as("content"))
      .select(col("media_id"), ah.as("ahash"))
  }

  /** Oracle CTE chain computing ah(media_id, ahash) from a
    * corpus(media_id, text) CTE — the full bit-level reconstruction:
    * q114's int16-LE hex sample decode, per-frame mono fold m = l+r,
    * env |m| and roughness |m − lag(m)| sums over the i·B div n
    * bucket map, adjacent-mean gradient bits for both bands + the
    * tilt bit. */
  private def audioFpSqlCtes: String = s"""
        asrc AS (SELECT media_id, octet_length(encode(text)) // 4 AS n,
                        hex(encode(text)) AS hx
                 FROM corpus),
        apx AS (SELECT media_id, n, hx,
                       CAST(unnest(range(0, 2 * n)) AS BIGINT) AS i
                FROM asrc),
        asm AS (SELECT media_id, n, i // 2 AS f,
                       (strpos('0123456789ABCDEF',
                          substring(hx, CAST(4 * i + 1 AS INT), 1)) - 1) * 16
                       + strpos('0123456789ABCDEF',
                          substring(hx, CAST(4 * i + 2 AS INT), 1)) - 1
                       + 256 * ((strpos('0123456789ABCDEF',
                                   substring(hx, CAST(4 * i + 3 AS INT), 1)) - 1) * 16
                                + strpos('0123456789ABCDEF',
                                   substring(hx, CAST(4 * i + 4 AS INT), 1)) - 1) AS uv
                FROM apx),
        afr AS (SELECT media_id, n, f,
                       CAST(SUM(CASE WHEN uv >= 32768 THEN uv - 65536
                                     ELSE uv END) AS BIGINT) AS m
                FROM asm GROUP BY media_id, n, f),
        adm AS (SELECT media_id, n, f, m,
                       lag(m) OVER (PARTITION BY media_id ORDER BY f) AS pm
                FROM afr),
        abk AS (SELECT media_id, f * $AudioFpBuckets // n AS j,
                       abs(m) AS e,
                       CASE WHEN f > 0 THEN abs(m - pm) END AS r
                FROM adm),
        abs_ AS (SELECT media_id, j,
                        CAST(SUM(e) AS BIGINT) AS es, COUNT(*) AS ec,
                        CAST(SUM(r) AS BIGINT) AS rs, COUNT(r) AS rc
                 FROM abk GROUP BY media_id, j),
        agb AS (SELECT a.media_id,
                       CAST(SUM(CASE WHEN a.es // a.ec > b.es // b.ec
                                THEN CAST(1 AS BIGINT) << CAST(a.j AS INT)
                                ELSE 0 END)
                          + SUM(CASE WHEN a.rs // a.rc > b.rs // b.rc
                                THEN CAST(1 AS BIGINT)
                                     << CAST(${AudioFpBuckets - 1} + a.j AS INT)
                                ELSE 0 END) AS BIGINT) AS gbits
                FROM abs_ a
                JOIN abs_ b ON b.media_id = a.media_id AND b.j = a.j + 1
                GROUP BY a.media_id),
        att AS (SELECT media_id,
                       CASE WHEN SUM(rs) > SUM(es)
                            THEN CAST(1 AS BIGINT)
                                 << ${2 * AudioFpBuckets - 2}
                            ELSE CAST(0 AS BIGINT) END AS tilt
                FROM abs_ GROUP BY media_id),
        ah AS (SELECT g.media_id, g.gbits + t.tilt AS ahash
               FROM agb g JOIN att t USING (media_id))"""

  /** Eligible docs ∪ planted 3-byte-edit variants, hashed — the q155
    * corpus: (media_id, dhash). The variant rewrites characters 31-33
    * to 'zzz' (same construction in the oracle), a small perceptual
    * edit the gradient hash must survive. */
  private[ext] def dhashCorpus(docs: DataFrame): DataFrame = {
    val base = docs.filter(octet_length(col("text")) >= DHashMinBytes)
      .select(col("doc_id"), col("text"))
    val variants = base.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + DHashVariantOffset).as("doc_id"),
        concat(substring(col("text"), 1, 30), lit("zzz"),
          expr("substring(text, 34)")).as("text"))
    val dh = graft.functions.MediaCodecFunctions
      .ppmDHash(col("content"), DHashBuckets)
    ppmWrap(base.unionByName(variants))
      .select(col("media_id"), dh.as("dhash"))
  }

  /** Oracle CTE chain computing dh(media_id, dhash) from a
    * corpus(media_id, text) CTE — the full bit-level reconstruction:
    * hex-nibble pixel decode (q109's `v` pattern), r+g+b luminance,
    * i·B div n bucket map, sum div count means, adjacent-mean gradient
    * bits packed over bits [0, 63). */
  private def dhashSqlCtes: String = s"""
        src AS (SELECT media_id, octet_length(encode(text)) // 3 AS n,
                       hex(encode(text)) AS hx
                FROM corpus),
        px AS (SELECT media_id, n, CAST(unnest(range(0, n)) AS BIGINT) AS i
               FROM src),
        lum AS (SELECT p.media_id, p.i * $DHashBuckets // p.n AS j,
                 (strpos('0123456789ABCDEF', substring(hx, CAST(6*i+1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substring(hx, CAST(6*i+2 AS INT), 1)) - 1
               + (strpos('0123456789ABCDEF', substring(hx, CAST(6*i+3 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substring(hx, CAST(6*i+4 AS INT), 1)) - 1
               + (strpos('0123456789ABCDEF', substring(hx, CAST(6*i+5 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF', substring(hx, CAST(6*i+6 AS INT), 1)) - 1 AS v
                FROM px p JOIN src USING (media_id)),
        bm AS (SELECT media_id, j, SUM(v) // COUNT(*) AS m
               FROM lum GROUP BY media_id, j),
        gb AS (SELECT a.media_id, a.j,
                      CASE WHEN a.m > b.m THEN 1 ELSE 0 END AS bit
               FROM bm a JOIN bm b
                 ON a.media_id = b.media_id AND b.j = a.j + 1
               WHERE a.j < ${DHashBuckets - 1}),
        dh AS (SELECT media_id,
                      CAST(SUM(bit * (1::BIGINT << CAST(j AS INT))) AS BIGINT)
                        AS dhash
               FROM gb GROUP BY media_id)"""

  override val defs: Seq[QueryDef] = Seq(

    // q70: media inventory — binary payloads + typed metadata, grouped
    // by modality: counts, byte volumes, dimension bounds.
    QueryDef(
      "q70_media_inventory",
      (s, dir) => {
        attachBinary(T.documents(s, dir))
          .groupBy(col("meta.media_type").as("media_type"))
          .agg(count(lit(1)).as("n"),
            sum(octet_length(col("content"))).as("total_bytes"),
            max(col("meta.width")).as("max_width"),
            min(col("meta.duration_ms")).as("min_duration_ms"))
          .orderBy(col("media_type"))
      },
      Some("""
        SELECT media_type, COUNT(*) AS n, CAST(SUM(octet_length(content)) AS BIGINT) AS total_bytes,
               MAX(width) AS max_width, MIN(duration_ms) AS min_duration_ms
        FROM (SELECT doc_id AS media_id, encode(text) AS content,
                     ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
                     CAST(doc_id % 640 + 16 AS INT) AS width,
                     n_chars * 10 AS duration_ms
              FROM documents)
        GROUP BY media_type ORDER BY media_type""")),

    // q71: payload fingerprinting over the binary column (md5 of the
    // raw bytes — identical digest on both engines), deduped per type.
    QueryDef(
      "q71_media_fingerprints",
      (s, dir) => {
        attachBinary(T.documents(s, dir))
          .select(col("meta.media_type").as("media_type"),
            md5(col("content")).as("fp"))
          .groupBy(col("media_type"))
          .agg(countDistinct(col("fp")).as("n_distinct_payloads"),
            count(lit(1)).as("n"),
            min(col("fp")).as("min_fp"))
          .orderBy(col("media_type"))
      },
      Some("""
        SELECT media_type, COUNT(DISTINCT fp) AS n_distinct_payloads,
               COUNT(*) AS n, MIN(fp) AS min_fp
        FROM (SELECT ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
                     md5(text) AS fp -- blob md5 unsupported; same bytes as encode(text)
              FROM documents)
        GROUP BY media_type ORDER BY media_type""")),

    // q72: REAL pixel-level frame sampling, driver-visible — each video
    // document's P6 container splits into 4 vertical pixel strips, each
    // extracted by the compiled PpmCropCols kernel as its own valid P6
    // container. The oracle rebuilds every frame's exact container
    // bytes in hex space (header hex || the byte-slice of the pixel
    // run) and both engines md5 the hex, so one wrong pixel byte in
    // any frame hash-fails. Frame timestamps come from the metadata
    // manifest (duration/n per step), as in a real frame-at-ts decode.
    QueryDef(
      "q72_frame_samples",
      (s, dir) => {
        val docs = T.documents(s, dir).filter(col("doc_id") % 3 === 2)
        sampleFramesPpm(ppmWrap(docs), n = 4)
          .join(docs.select(col("doc_id").as("media_id"),
            (col("n_chars") * 10L).as("duration_ms")), "media_id")
          .select(col("media_id"),
            col("frame_idx").cast("long").as("frame_idx"),
            (col("frame_idx") * greatest(lit(1L),
              expr("duration_ms div 4"))).as("frame_ts_ms"),
            col("frame_w"),
            octet_length(col("content")).cast("long").as("frame_bytes"),
            md5(hex(col("content")).cast("binary")).as("frame_md5"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some("""
        WITH src AS (SELECT doc_id AS media_id,
                            octet_length(encode(text)) // 3 AS w,
                            hex(encode(text)) AS hx,
                            CAST(n_chars * 10 AS BIGINT) AS duration_ms
                     FROM documents
                     WHERE doc_id % 3 = 2 AND octet_length(encode(text)) >= 3),
        fr AS (SELECT media_id, CAST(i AS BIGINT) AS frame_idx, duration_ms,
                      w * i // 4 AS fa, w * (i + 1) // 4 AS fb, hx
               FROM src CROSS JOIN (SELECT unnest(range(0, 4)) AS i))
        SELECT media_id, frame_idx,
               frame_idx * greatest(1, duration_ms // 4) AS frame_ts_ms,
               fb - fa AS frame_w,
               -- canonical frame header 'P6\n{fw} 1\n255\n' + 3·fw pixels
               CAST(octet_length(encode('P6' || chr(10) || CAST(fb - fa AS VARCHAR)
                    || ' 1' || chr(10) || '255' || chr(10)))
                    + 3 * (fb - fa) AS BIGINT) AS frame_bytes,
               md5(hex('P6' || chr(10) || CAST(fb - fa AS VARCHAR) || ' 1'
                       || chr(10) || '255' || chr(10))
                   || substring(hx, CAST(6 * fa + 1 AS INT),
                                CAST(6 * (fb - fa) AS INT))) AS frame_md5
        FROM fr WHERE fb > fa
        ORDER BY media_id, frame_idx""")),

    // q73: REAL pixel-level nearest-neighbor resize, driver-visible —
    // every P6 container resamples to 16×2 through the compiled
    // PpmResize kernel (output pixel (x,y) copies source pixel
    // (⌊x·w/16⌋, 0)); width/height are parsed BACK from the emitted
    // container by ppm_header (kernel output must itself be a valid
    // P6), and the oracle rebuilds the full resampled container in hex
    // space — 16 floor-mapped pixel slices per row, two identical rows
    // (srcH = 1) — so both engines md5 identical pixel-exact bytes.
    QueryDef(
      "q73_media_resize",
      (s, dir) => {
        val hdr = graft.functions.MediaCodecFunctions.ppmHeader(col("content"))
        resizePpm(ppmWrap(T.documents(s, dir)), w = 16, h = 2)
          .select(col("media_id"), hdr.as("h"), col("content"))
          .select(col("media_id"),
            element_at(col("h"), 1).as("width"),
            element_at(col("h"), 2).as("height"),
            octet_length(col("content")).cast("long").as("container_bytes"),
            hex(expr("substring(content, 13, 3)")).as("first_px_hex"),
            md5(hex(col("content")).cast("binary")).as("content_md5"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH src AS (SELECT doc_id AS media_id,
                            octet_length(encode(text)) // 3 AS w,
                            hex(encode(text)) AS hx
                     FROM documents WHERE octet_length(encode(text)) >= 3),
        strips AS (SELECT media_id,
                          list_aggregate(list_transform(range(0, 16),
                            x -> substring(hx, CAST(6 * (x * w // 16) + 1 AS INT), 6)),
                            'string_agg', '') AS strip
                   FROM src)
        SELECT media_id,
               CAST(16 AS BIGINT) AS width, CAST(2 AS BIGINT) AS height,
               -- 'P6\n16 2\n255\n' (12) + 16·2 pixels · 3 bytes
               CAST(108 AS BIGINT) AS container_bytes,
               substring(strip, 1, 6) AS first_px_hex,
               md5(hex('P6' || chr(10) || '16 2' || chr(10) || '255' || chr(10))
                   || strip || strip) AS content_md5
        FROM strips ORDER BY media_id""")),

    // q106: REAL pixel-level channel statistics — the deterministic
    // half of a media featurizer computed from ACTUAL pixels: one
    // compiled pass per container decodes every sample value and
    // reduces to per-channel (sum, min, max); means materialize as
    // single integer divisions (×1e6, floored) so both engines agree
    // bit-for-bit. These are the classic curation signals — channel
    // means catch dark/blank images, dynamic range catches flat or
    // clipped ones — and they flow downstream as a dozen int64s per
    // item while the payload never leaves its partition. The oracle
    // re-derives every sample value from the container's hex (two
    // strpos digits per byte) and aggregates per channel, so one wrong
    // decoded sample anywhere hash-fails. The LEARNED featurizer
    // (CLIP-style embedding) remains the one documented stand-in; this
    // query narrows the seam to exactly that model call.
    QueryDef(
      "q106_media_channel_stats",
      (s, dir) => {
        val st = graft.functions.MediaCodecFunctions.ppmChannelStats(col("content"))
        ppmWrap(T.documents(s, dir))
          .select(col("media_id"), st.as("st"))
          .selectExpr("media_id",
            "st[0] AS n_px",
            "(st[1] * 1000000L) div st[0] AS r_mean_e6",
            "(st[2] * 1000000L) div st[0] AS g_mean_e6",
            "(st[3] * 1000000L) div st[0] AS b_mean_e6",
            "st[4] AS r_min", "st[5] AS g_min", "st[6] AS b_min",
            "st[7] AS r_max", "st[8] AS g_max", "st[9] AS b_max",
            "greatest(st[7] - st[4], st[8] - st[5], st[9] - st[6]) AS dyn_range",
            "((st[1] + st[2] + st[3]) * 1000000L) div (3 * st[0]) < 64000000L AS is_dark")
          .orderBy(col("media_id"))
      },
      Some("""
        WITH src AS (SELECT doc_id AS media_id,
                            octet_length(encode(text)) // 3 AS w,
                            hex(encode(text)) AS hx
                     FROM documents WHERE octet_length(encode(text)) >= 3),
        -- byte i of the pixel run (3·w bytes), decoded from two hex
        -- digits; channel = i mod 3 (row-major RGB, 1 byte per sample)
        px AS (SELECT media_id, w,
                      CAST(unnest(range(0, 3 * w)) AS BIGINT) AS i
               FROM src),
        v AS (SELECT media_id, w, CAST(i % 3 AS INT) AS ch,
                     (strpos('0123456789ABCDEF',
                        substring(hx, CAST(2 * i + 1 AS INT), 1)) - 1) * 16
                     + strpos('0123456789ABCDEF',
                        substring(hx, CAST(2 * i + 2 AS INT), 1)) - 1 AS val
              FROM px JOIN src USING (media_id, w)),
        st AS (SELECT media_id, MAX(w) AS n_px,
                      SUM(CASE WHEN ch = 0 THEN val END) AS sr,
                      SUM(CASE WHEN ch = 1 THEN val END) AS sg,
                      SUM(CASE WHEN ch = 2 THEN val END) AS sb,
                      MIN(CASE WHEN ch = 0 THEN val END) AS nr,
                      MIN(CASE WHEN ch = 1 THEN val END) AS ng,
                      MIN(CASE WHEN ch = 2 THEN val END) AS nb,
                      MAX(CASE WHEN ch = 0 THEN val END) AS xr,
                      MAX(CASE WHEN ch = 1 THEN val END) AS xg,
                      MAX(CASE WHEN ch = 2 THEN val END) AS xb
               FROM v GROUP BY media_id)
        SELECT media_id, CAST(n_px AS BIGINT) AS n_px,
               CAST(sr * 1000000 // n_px AS BIGINT) AS r_mean_e6,
               CAST(sg * 1000000 // n_px AS BIGINT) AS g_mean_e6,
               CAST(sb * 1000000 // n_px AS BIGINT) AS b_mean_e6,
               CAST(nr AS BIGINT) AS r_min, CAST(ng AS BIGINT) AS g_min,
               CAST(nb AS BIGINT) AS b_min,
               CAST(xr AS BIGINT) AS r_max, CAST(xg AS BIGINT) AS g_max,
               CAST(xb AS BIGINT) AS b_max,
               CAST(greatest(xr - nr, xg - ng, xb - nb) AS BIGINT) AS dyn_range,
               (sr + sg + sb) * 1000000 // (3 * n_px) < 64000000 AS is_dark
        FROM st ORDER BY media_id""")),

    // q109: the video-pipeline COMPOSITION — 1→N frame sampling (q72's
    // PpmCropCols generator) followed by per-frame pixel featurization
    // (q106's channelStats kernel), under ONE oracle: every frame's
    // per-channel means and dynamic range computed from the actual
    // frame pixel bytes. This is the shape a real curation job runs
    // (sample frames, score each, filter dark/flat segments), and it
    // composes the primitives verbatim — the oracle re-derives each
    // frame's byte window [3·fa, 3·fb) from the construction and
    // decodes every sample from hex, so a one-pixel drift in EITHER
    // stage hash-fails. Channel alignment note: 3·fa is divisible by
    // 3, so frame channel = source byte index mod 3 — the oracle leans
    // on that invariant.
    QueryDef(
      "q109_frame_channel_stats",
      (s, dir) => {
        val docs = T.documents(s, dir).filter(col("doc_id") % 3 === 2)
        val st = graft.functions.MediaCodecFunctions.ppmChannelStats(col("content"))
        sampleFramesPpm(ppmWrap(docs), n = 4)
          .select(col("media_id"), col("frame_idx"), st.as("st"))
          .selectExpr("media_id", "CAST(frame_idx AS BIGINT) AS frame_idx",
            "st[0] AS n_px",
            "(st[1] * 1000000L) div st[0] AS r_mean_e6",
            "(st[2] * 1000000L) div st[0] AS g_mean_e6",
            "(st[3] * 1000000L) div st[0] AS b_mean_e6",
            "greatest(st[7] - st[4], st[8] - st[5], st[9] - st[6]) AS dyn_range",
            "((st[1] + st[2] + st[3]) * 1000000L) div (3 * st[0]) < 64000000L AS is_dark")
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some("""
        WITH src AS (SELECT doc_id AS media_id,
                            octet_length(encode(text)) // 3 AS w,
                            hex(encode(text)) AS hx
                     FROM documents
                     WHERE doc_id % 3 = 2 AND octet_length(encode(text)) >= 3),
        fr AS (SELECT media_id, CAST(i AS BIGINT) AS frame_idx,
                      w * i // 4 AS fa, w * (i + 1) // 4 AS fb
               FROM src CROSS JOIN (SELECT unnest(range(0, 4)) AS i)
               WHERE w * (i + 1) // 4 > w * i // 4),
        -- byte i of the SOURCE pixel run for i in [3·fa, 3·fb);
        -- channel = i mod 3 because 3·fa ≡ 0 (mod 3)
        b AS (SELECT media_id, frame_idx, fb - fa AS n_px,
                     CAST(unnest(range(3 * fa, 3 * fb)) AS BIGINT) AS i
              FROM fr),
        v AS (SELECT media_id, frame_idx, n_px, CAST(i % 3 AS INT) AS ch,
                     (strpos('0123456789ABCDEF',
                        substring(hx, CAST(2 * i + 1 AS INT), 1)) - 1) * 16
                     + strpos('0123456789ABCDEF',
                        substring(hx, CAST(2 * i + 2 AS INT), 1)) - 1 AS val
              FROM b JOIN src USING (media_id)),
        st AS (SELECT media_id, frame_idx, MAX(n_px) AS n_px,
                      SUM(CASE WHEN ch = 0 THEN val END) AS sr,
                      SUM(CASE WHEN ch = 1 THEN val END) AS sg,
                      SUM(CASE WHEN ch = 2 THEN val END) AS sb,
                      MIN(CASE WHEN ch = 0 THEN val END) AS nr,
                      MIN(CASE WHEN ch = 1 THEN val END) AS ng,
                      MIN(CASE WHEN ch = 2 THEN val END) AS nb,
                      MAX(CASE WHEN ch = 0 THEN val END) AS xr,
                      MAX(CASE WHEN ch = 1 THEN val END) AS xg,
                      MAX(CASE WHEN ch = 2 THEN val END) AS xb
               FROM v GROUP BY media_id, frame_idx)
        SELECT media_id, frame_idx, CAST(n_px AS BIGINT) AS n_px,
               CAST(sr * 1000000 // n_px AS BIGINT) AS r_mean_e6,
               CAST(sg * 1000000 // n_px AS BIGINT) AS g_mean_e6,
               CAST(sb * 1000000 // n_px AS BIGINT) AS b_mean_e6,
               CAST(greatest(xr - nr, xg - ng, xb - nb) AS BIGINT) AS dyn_range,
               (sr + sg + sb) * 1000000 // (3 * n_px) < 64000000 AS is_dark
        FROM st ORDER BY media_id, frame_idx""")),

    // q114: the SECOND real container format behind the codec seam —
    // RIFF/WAVE PCM-16. Each document's bytes wrap into a genuine
    // 44-byte-header stereo WAV container (binary little-endian fields
    // built byte by byte — WavCodec.wrapPcm16Stereo), and the compiled
    // chunk-walking parser + per-channel PCM sample kernel decode it
    // back: header fields (q99's parse(wrap(x)) == expect(x) pattern)
    // AND per-channel (sum, min, max) over every decoded int16 LE
    // sample (q106's pattern — the audio-curation signals: mean level,
    // DC offset, clipping). The oracle re-derives every sample from the
    // container hex — two bytes per sample, low byte first, two's
    // complement sign fold — so one wrong decoded sample or a
    // one-byte-off data offset anywhere hash-fails. Malformation
    // classes (bad magic, truncated chunks, non-PCM, byte-rate
    // mismatch, partial frames) are pinned in MultimodalSpec. Raw sums
    // (not means) ship because sample sums can be negative and the two
    // engines disagree on negative integer division (trunc vs floor) —
    // the same reason the bin sketch clamps before dividing.
    QueryDef(
      "q114_wav_channel_stats",
      (s, dir) => {
        val hdr = graft.functions.WavCodecFunctions.wavHeader(col("content"))
        val st = graft.functions.WavCodecFunctions.wavChannelStats(col("content"))
        T.documents(s, dir)
          .filter(octet_length(col("text")) >= 4) // ≥ 1 whole stereo frame
          .select(col("doc_id").as("media_id"),
            graft.functions.WavCodecFunctions.wavWrap(
              col("text").cast("binary"), lit(8000)).as("content"))
          .select(col("media_id"), hdr.as("h"), st.as("st"))
          .selectExpr("media_id",
            "h[0] AS n_channels", "h[1] AS sample_rate", "h[2] AS bits",
            "h[3] AS n_frames", "h[4] AS data_offset", "h[5] AS data_bytes",
            "st[2] AS l_sum", "st[3] AS l_min", "st[4] AS l_max",
            "st[5] AS r_sum", "st[6] AS r_min", "st[7] AS r_max",
            "st[4] >= 32767L OR st[3] <= -32768L OR st[7] >= 32767L " +
              "OR st[6] <= -32768L AS clipped")
          .orderBy(col("media_id"))
      },
      Some("""
        WITH src AS (SELECT doc_id AS media_id,
                            octet_length(encode(text)) // 4 AS n,
                            hex(encode(text)) AS hx
                     FROM documents WHERE octet_length(encode(text)) >= 4),
        -- sample i (frame i//2, channel i%2) sits at data byte 2i =
        -- text byte 2i (the wrap copies text verbatim after the header);
        -- int16 LE: low byte first, two's-complement sign fold
        sm AS (SELECT media_id, CAST(i % 2 AS INT) AS ch,
                      (strpos('0123456789ABCDEF',
                         substring(hx, CAST(4 * i + 1 AS INT), 1)) - 1) * 16
                      + strpos('0123456789ABCDEF',
                         substring(hx, CAST(4 * i + 2 AS INT), 1)) - 1
                      + 256 * ((strpos('0123456789ABCDEF',
                                  substring(hx, CAST(4 * i + 3 AS INT), 1)) - 1) * 16
                               + strpos('0123456789ABCDEF',
                                  substring(hx, CAST(4 * i + 4 AS INT), 1)) - 1) AS uv
               FROM (SELECT media_id, hx,
                            CAST(unnest(range(0, 2 * n)) AS BIGINT) AS i
                     FROM src)),
        sv AS (SELECT media_id, ch,
                      CASE WHEN uv >= 32768 THEN uv - 65536 ELSE uv END AS v
               FROM sm),
        st AS (SELECT media_id,
                      CAST(SUM(CASE WHEN ch = 0 THEN v END) AS BIGINT) AS l_sum,
                      CAST(MIN(CASE WHEN ch = 0 THEN v END) AS BIGINT) AS l_min,
                      CAST(MAX(CASE WHEN ch = 0 THEN v END) AS BIGINT) AS l_max,
                      CAST(SUM(CASE WHEN ch = 1 THEN v END) AS BIGINT) AS r_sum,
                      CAST(MIN(CASE WHEN ch = 1 THEN v END) AS BIGINT) AS r_min,
                      CAST(MAX(CASE WHEN ch = 1 THEN v END) AS BIGINT) AS r_max
               FROM sv GROUP BY media_id)
        SELECT media_id,
               CAST(2 AS BIGINT) AS n_channels,
               CAST(8000 AS BIGINT) AS sample_rate,
               CAST(16 AS BIGINT) AS bits,
               CAST(n AS BIGINT) AS n_frames,
               CAST(44 AS BIGINT) AS data_offset,
               CAST(4 * n AS BIGINT) AS data_bytes,
               l_sum, l_min, l_max, r_sum, r_min, r_max,
               l_max >= 32767 OR l_min <= -32768 OR r_max >= 32767
                 OR r_min <= -32768 AS clipped
        FROM st JOIN src USING (media_id)
        ORDER BY media_id""")),

    // q99: REAL byte-level container decode — wrap every document's
    // bytes into a genuine P6 PPM payload (magic + comment + ASCII dims
    // + exact pixel run) and parse it back with the compiled
    // PpmCodec kernel: magic check, comment skip, integer fields,
    // data-offset and pixel-byte accounting all happen on the actual
    // container BYTES. The oracle computes the expected header words
    // from the construction inputs (parse(wrap(x)) == expect(x)), so a
    // parser that miscounts even one separator byte hash-fails on the
    // data_offset column. Malformed-container fail-fast paths are
    // pinned in MultimodalSpec.
    QueryDef(
      "q99_media_ppm_decode",
      (s, dir) => {
        val hdr = graft.functions.MediaCodecFunctions.ppmHeader(col("content"))
        ppmWrap(T.documents(s, dir))
          .select(col("media_id"), hdr.as("h"))
          .select(col("media_id"),
            element_at(col("h"), 1).as("width"),
            element_at(col("h"), 2).as("height"),
            element_at(col("h"), 3).as("maxval"),
            element_at(col("h"), 4).as("data_offset"),
            element_at(col("h"), 5).as("pixel_bytes"))
          .orderBy(col("media_id"))
      },
      Some("""
        SELECT media_id, w AS width, CAST(1 AS BIGINT) AS height,
               CAST(255 AS BIGINT) AS maxval,
               -- 'P6\n# doc ' (9) + id + '\n' (1) + w + ' 1\n255\n' (7)
               CAST(17 + length(CAST(media_id AS VARCHAR))
                       + length(CAST(w AS VARCHAR)) AS BIGINT) AS data_offset,
               3 * w AS pixel_bytes
        FROM (SELECT doc_id AS media_id,
                     octet_length(encode(text)) // 3 AS w
              FROM documents WHERE octet_length(encode(text)) >= 3)
        ORDER BY media_id""")),

    // ------------------------------------------------------------------
    // q154: PERCEPTUAL IMAGE HASH (dHash) — the multimodal analogue of
    // SimHash (q42): a compiled codegen kernel (PpmCodec.dhash) decodes
    // each P6 payload and packs 63 luminance-gradient bits over 64
    // position buckets into one non-negative int64. The oracle
    // re-derives every bit from the construction bytes (hex-nibble
    // decode, the q109 pattern): per-pixel r+g+b sums, bucket means by
    // the i·64 div n floor map with sum div count, adjacent-mean
    // comparisons — a one-bit drift anywhere in either engine's
    // decode, bucketing, or bit packing hash-fails. Docs below 64
    // pixels (192 payload bytes) are out of contract (the kernel
    // throws; the query filters). 100 TB: map-side only — payloads
    // never leave their partition; 8 bytes per image flow downstream.
    QueryDef(
      "q154_image_dhash",
      (s, dir) => {
        val docs = T.documents(s, dir)
          .filter(octet_length(col("text")) >= DHashMinBytes)
        val hdr = graft.functions.MediaCodecFunctions.ppmHeader(col("content"))
        val dh = graft.functions.MediaCodecFunctions
          .ppmDHash(col("content"), DHashBuckets)
        ppmWrap(docs)
          .select(col("media_id"), hdr.as("h"), dh.as("dhash"))
          .select(col("media_id"),
            (element_at(col("h"), 1) * element_at(col("h"), 2)).as("n_px"),
            col("dhash"))
          .orderBy(col("media_id"))
      },
      Some(s"""
        WITH corpus AS (SELECT doc_id AS media_id, text FROM documents
                        WHERE octet_length(encode(text)) >= $DHashMinBytes),
        $dhashSqlCtes
        SELECT d.media_id, s.n AS n_px, d.dhash
        FROM dh d JOIN src s USING (media_id)
        ORDER BY d.media_id""")),

    // ------------------------------------------------------------------
    // q155: HAMMING-LSH IMAGE NEAR-DUP — dHash near-duplicate pairs via
    // bit-sampling LSH (Indyk & Motwani, STOC 1998 §4.2 applied to
    // hamming space): 7 contiguous 9-bit bands of the 63-bit hash;
    // candidate pairs share at least one exact band (two hashes within
    // hamming 6 differ in ≤ 6 of 63 bits, and 7 bands > 6 diff bits,
    // so by pigeonhole at least one band is untouched — the band join
    // is EXACT for this radius, not probabilistic; pigeonhole needs
    // bands ≥ radius+1, which 4 bands did NOT give — see
    // MultimodalSpec's all-bands-touched case); verify =
    // bit_count(xor) ≤ 6. The
    // fixture plants a 3-byte pixel edit per doc_id%5==0 image
    // (media_id + 1,000,000) — robustness (planted pairs land at
    // hamming ≤ 2, MultimodalSpec pins one) and the oracle recomputes
    // every planted byte relationally. 100 TB: work ∝ Σ bucket² over
    // 7×2^9 band cells of 8-byte keys — the q41 banded-LSH shape (a
    // production radius uses more/narrower bands + the cappedBuckets
    // discipline; the capped variant is measured there).
    QueryDef(
      "q155_dhash_near_dup",
      (s, dir) => {
        val dh = dhashCorpus(T.documents(s, dir))
        val bands = dh
          .withColumn("b", explode(sequence(lit(0), lit(DHashBands - 1))))
          .withColumn("bv", expr(
            s"shiftright(dhash, $DHashBandBits * b) & ${DHashBandMask}L"))
        val cand = bands.select(col("b"), col("bv"), col("media_id").as("id_a"))
          .join(bands.select(col("b"), col("bv"), col("media_id").as("id_b")),
            Seq("b", "bv"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct()
        cand
          .join(dh.select(col("media_id").as("id_a"), col("dhash").as("ha")), "id_a")
          .join(dh.select(col("media_id").as("id_b"), col("dhash").as("hb")), "id_b")
          .select(col("id_a"), col("id_b"),
            expr("CAST(bit_count(ha ^ hb) AS BIGINT)").as("hamming"),
            (col("id_b") === col("id_a") + DHashVariantOffset).as("planted"))
          .filter(col("hamming") <= DHashMaxHamming)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""
        WITH base AS (SELECT doc_id AS media_id, text FROM documents
                      WHERE octet_length(encode(text)) >= $DHashMinBytes),
        corpus AS (
          SELECT media_id, text FROM base
          UNION ALL
          SELECT media_id + $DHashVariantOffset,
                 substr(text, 1, 30) || 'zzz' || substr(text, 34)
          FROM base WHERE media_id % 5 = 0),
        $dhashSqlCtes,
        bands AS (SELECT media_id, dhash, b,
                         (dhash >> CAST($DHashBandBits * b AS INT)) &
                           $DHashBandMask AS bv
                  FROM dh CROSS JOIN
                    (SELECT unnest(range(0, $DHashBands)) AS b)),
        cand AS (SELECT DISTINCT a.media_id AS id_a, c.media_id AS id_b
                 FROM bands a JOIN bands c ON a.b = c.b AND a.bv = c.bv
                 WHERE a.media_id < c.media_id)
        SELECT id_a, id_b,
               CAST(bit_count(xor(x.dhash, y.dhash)) AS BIGINT) AS hamming,
               id_b = id_a + $DHashVariantOffset AS planted
        FROM cand
        JOIN dh x ON x.media_id = id_a
        JOIN dh y ON y.media_id = id_b
        WHERE bit_count(xor(x.dhash, y.dhash)) <= $DHashMaxHamming
        ORDER BY id_a, id_b""")),

    // ------------------------------------------------------------------
    // q164: INCREMENTAL IMAGE NEAR-DUP — the q80/q89 incremental
    // discipline on the dHash family: an arriving batch (every third
    // image + planted 3-byte-edit variants of corpus images) checks
    // against the EXISTING corpus without ever joining the corpus to
    // itself. Only NEW-side band rows probe the corpus's band cells,
    // so work ∝ Σ |new ∩ cell| · |cell| — at 100 TB the corpus side is
    // the persisted band index (8-byte hashes; catalog-servable like
    // q81) and a daily batch costs batch-proportional work, not
    // corpus². Same corrected 7×9 exact-radius banding; verify =
    // hamming ≤ 6; planted variants must surface (recall is exact at
    // the radius, so they provably do).
    QueryDef(
      "q164_dhash_incremental",
      (s, dir) => {
        val base = T.documents(s, dir)
          .filter(octet_length(col("text")) >= DHashMinBytes)
          .select(col("doc_id"), col("text"))
        val corpus = base.filter(col("doc_id") % 3 =!= 0)
        val variants = corpus.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + DHashVariantOffset).as("doc_id"),
            concat(substring(col("text"), 1, 30), lit("zzz"),
              expr("substring(text, 34)")).as("text"))
        val newb = base.filter(col("doc_id") % 3 === 0)
          .unionByName(variants)
        val dhc = graft.functions.MediaCodecFunctions
          .ppmDHash(col("content"), DHashBuckets)
        def hashed(df: DataFrame): DataFrame =
          ppmWrap(df).select(col("media_id"), dhc.as("dhash"))
        def banded(df: DataFrame): DataFrame = df
          .withColumn("b", explode(sequence(lit(0), lit(DHashBands - 1))))
          .withColumn("bv", expr(
            s"shiftright(dhash, $DHashBandBits * b) & ${DHashBandMask}L"))
        val hc = hashed(corpus)
        val hn = hashed(newb)
        val cand = banded(hn)
          .select(col("b"), col("bv"), col("media_id").as("id_new"))
          .join(banded(hc)
            .select(col("b"), col("bv"), col("media_id").as("id_corpus")),
            Seq("b", "bv"))
          .select(col("id_new"), col("id_corpus")).distinct()
        cand
          .join(hn.select(col("media_id").as("id_new"), col("dhash").as("hn")),
            "id_new")
          .join(hc.select(col("media_id").as("id_corpus"), col("dhash").as("hc")),
            "id_corpus")
          .select(col("id_new"), col("id_corpus"),
            expr("CAST(bit_count(hn ^ hc) AS BIGINT)").as("hamming"),
            (col("id_new") === col("id_corpus") + DHashVariantOffset)
              .as("planted"))
          .filter(col("hamming") <= DHashMaxHamming)
          .orderBy(col("id_new"), col("id_corpus"))
      },
      Some(s"""
        WITH base AS (SELECT doc_id AS media_id, text FROM documents
                      WHERE octet_length(encode(text)) >= $DHashMinBytes),
        corpus AS (
          SELECT media_id, text FROM base
          UNION ALL
          SELECT media_id + $DHashVariantOffset,
                 substr(text, 1, 30) || 'zzz' || substr(text, 34)
          FROM base WHERE media_id % 3 != 0 AND media_id % 5 = 0),
        $dhashSqlCtes,
        sides AS (SELECT media_id, dhash,
                         media_id >= $DHashVariantOffset
                           OR media_id % 3 = 0 AS is_new
                  FROM dh),
        bands AS (SELECT media_id, dhash, is_new, b,
                         (dhash >> CAST($DHashBandBits * b AS INT)) &
                           $DHashBandMask AS bv
                  FROM sides CROSS JOIN
                    (SELECT unnest(range(0, $DHashBands)) AS b)),
        cand AS (SELECT DISTINCT n.media_id AS id_new, c.media_id AS id_corpus
                 FROM bands n JOIN bands c ON n.b = c.b AND n.bv = c.bv
                 WHERE n.is_new AND NOT c.is_new)
        SELECT id_new, id_corpus,
               CAST(bit_count(xor(x.dhash, y.dhash)) AS BIGINT) AS hamming,
               id_new = id_corpus + $DHashVariantOffset AS planted
        FROM cand
        JOIN dh x ON x.media_id = id_new
        JOIN dh y ON y.media_id = id_corpus
        WHERE bit_count(xor(x.dhash, y.dhash)) <= $DHashMaxHamming
        ORDER BY id_new, id_corpus""")),

    // ------------------------------------------------------------------
    // q159: PERCEPTUAL AUDIO FINGERPRINT — the WAV-side completion of
    // the q154 dHash family: a compiled codegen kernel
    // (WavCodec.envHash) decodes each PCM-16 container and packs 63
    // bits of two-band energy structure (31 envelope gradients + 31
    // first-difference "roughness" gradients + 1 spectral-tilt bit
    // over 32 time buckets — the Haitsma-Kalker band-energy sign hash
    // with exact integer bands). The oracle re-derives every bit from
    // the container hex: q114's int16-LE sample decode, mono fold,
    // bucket sums div counts, adjacent-mean comparisons, bit packing —
    // one drifted sample or misplaced bucket boundary in either engine
    // hash-fails. Docs below 64 stereo frames (256 payload bytes) are
    // out of contract (the kernel throws; the query filters). 100 TB:
    // map-side only — payloads never leave their partition; 8 bytes
    // per clip flow downstream.
    QueryDef(
      "q159_audio_fingerprint",
      (s, dir) => {
        val docs = T.documents(s, dir)
          .filter(octet_length(col("text")) >= AudioFpMinBytes)
        val hdr = graft.functions.WavCodecFunctions.wavHeader(col("content"))
        val ah = graft.functions.WavCodecFunctions.wavEnvHash(
          col("content"), AudioFpBuckets)
        docs.select(col("doc_id").as("media_id"),
            graft.functions.WavCodecFunctions.wavWrap(
              col("text").cast("binary"), lit(8000)).as("content"))
          .select(col("media_id"), hdr.as("h"), ah.as("ahash"))
          .select(col("media_id"),
            element_at(col("h"), 4).as("n_frames"), col("ahash"))
          .orderBy(col("media_id"))
      },
      Some(s"""
        WITH corpus AS (SELECT doc_id AS media_id, text FROM documents
                        WHERE octet_length(encode(text)) >= $AudioFpMinBytes),
        $audioFpSqlCtes
        SELECT a.media_id, CAST(s.n AS BIGINT) AS n_frames, a.ahash
        FROM ah a JOIN asrc s USING (media_id)
        ORDER BY a.media_id""")),

    // ------------------------------------------------------------------
    // q160: HAMMING-LSH AUDIO NEAR-DUP — q155's corrected 7×9 banding
    // over the audio fingerprint: candidate pairs share ≥ 1 exact
    // 9-bit band (pigeonhole-EXACT at hamming ≤ 6 — 7 bands > 6 diff
    // bits), verify = bit_count(xor) ≤ 6, planted 3-byte perceptual
    // edits per doc_id%5==0 clip must survive. 100 TB: work ∝
    // Σ bucket² over 7×2^9 band cells of 8-byte keys — the shared
    // image/audio near-dup tail.
    QueryDef(
      "q160_audio_fp_near_dup",
      (s, dir) => {
        val ah = audioFpCorpus(T.documents(s, dir))
        val bands = ah
          .withColumn("b", explode(sequence(lit(0), lit(DHashBands - 1))))
          .withColumn("bv", expr(
            s"shiftright(ahash, $DHashBandBits * b) & ${DHashBandMask}L"))
        val cand = bands.select(col("b"), col("bv"), col("media_id").as("id_a"))
          .join(bands.select(col("b"), col("bv"), col("media_id").as("id_b")),
            Seq("b", "bv"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct()
        cand
          .join(ah.select(col("media_id").as("id_a"), col("ahash").as("ha")), "id_a")
          .join(ah.select(col("media_id").as("id_b"), col("ahash").as("hb")), "id_b")
          .select(col("id_a"), col("id_b"),
            expr("CAST(bit_count(ha ^ hb) AS BIGINT)").as("hamming"),
            (col("id_b") === col("id_a") + DHashVariantOffset).as("planted"))
          .filter(col("hamming") <= DHashMaxHamming)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""
        WITH base AS (SELECT doc_id AS media_id, text FROM documents
                      WHERE octet_length(encode(text)) >= $AudioFpMinBytes),
        corpus AS (
          SELECT media_id, text FROM base
          UNION ALL
          SELECT media_id + $DHashVariantOffset,
                 substr(text, 1, 30) || 'zzz' || substr(text, 34)
          FROM base WHERE media_id % 5 = 0),
        $audioFpSqlCtes,
        bands AS (SELECT media_id, ahash, b,
                         (ahash >> CAST($DHashBandBits * b AS INT)) &
                           $DHashBandMask AS bv
                  FROM ah CROSS JOIN
                    (SELECT unnest(range(0, $DHashBands)) AS b)),
        cand AS (SELECT DISTINCT a.media_id AS id_a, c.media_id AS id_b
                 FROM bands a JOIN bands c ON a.b = c.b AND a.bv = c.bv
                 WHERE a.media_id < c.media_id)
        SELECT id_a, id_b,
               CAST(bit_count(xor(x.ahash, y.ahash)) AS BIGINT) AS hamming,
               id_b = id_a + $DHashVariantOffset AS planted
        FROM cand
        JOIN ah x ON x.media_id = id_a
        JOIN ah y ON y.media_id = id_b
        WHERE bit_count(xor(x.ahash, y.ahash)) <= $DHashMaxHamming
        ORDER BY id_a, id_b""")),

    // ------------------------------------------------------------------
    // q168: INCREMENTAL AUDIO NEAR-DUP — q164's new-batch-vs-corpus
    // discipline on the audio fingerprint, completing the multimodal
    // incremental family (image: q155 batch / q164 incremental; audio:
    // q160 batch / THIS). An arriving batch (every third clip + planted
    // 3-byte perceptual edits of corpus clips) probes the existing
    // corpus's band cells new-side-only — work ∝ Σ |new∩cell| · |cell|,
    // never corpus²; at 100 TB the corpus side is the persisted 8-byte
    // band index. Same corrected 7×9 exact-radius banding; verify =
    // hamming ≤ 6; planted variants provably surface.
    QueryDef(
      "q168_audio_fp_incremental",
      (s, dir) => {
        val base = T.documents(s, dir)
          .filter(octet_length(col("text")) >= AudioFpMinBytes)
          .select(col("doc_id"), col("text"))
        val corpus = base.filter(col("doc_id") % 3 =!= 0)
        val variants = corpus.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + DHashVariantOffset).as("doc_id"),
            concat(substring(col("text"), 1, 30), lit("zzz"),
              expr("substring(text, 34)")).as("text"))
        val newb = base.filter(col("doc_id") % 3 === 0)
          .unionByName(variants)
        val ahc = graft.functions.WavCodecFunctions.wavEnvHash(
          col("content"), AudioFpBuckets)
        def hashed(df: DataFrame): DataFrame = df
          .select(col("doc_id").as("media_id"),
            graft.functions.WavCodecFunctions.wavWrap(
              col("text").cast("binary"), lit(8000)).as("content"))
          .select(col("media_id"), ahc.as("ahash"))
        def banded(df: DataFrame): DataFrame = df
          .withColumn("b", explode(sequence(lit(0), lit(DHashBands - 1))))
          .withColumn("bv", expr(
            s"shiftright(ahash, $DHashBandBits * b) & ${DHashBandMask}L"))
        val hc = hashed(corpus)
        val hn = hashed(newb)
        val cand = banded(hn)
          .select(col("b"), col("bv"), col("media_id").as("id_new"))
          .join(banded(hc)
            .select(col("b"), col("bv"), col("media_id").as("id_corpus")),
            Seq("b", "bv"))
          .select(col("id_new"), col("id_corpus")).distinct()
        cand
          .join(hn.select(col("media_id").as("id_new"), col("ahash").as("hn")),
            "id_new")
          .join(hc.select(col("media_id").as("id_corpus"), col("ahash").as("hc")),
            "id_corpus")
          .select(col("id_new"), col("id_corpus"),
            expr("CAST(bit_count(hn ^ hc) AS BIGINT)").as("hamming"),
            (col("id_new") === col("id_corpus") + DHashVariantOffset)
              .as("planted"))
          .filter(col("hamming") <= DHashMaxHamming)
          .orderBy(col("id_new"), col("id_corpus"))
      },
      Some(s"""
        WITH base AS (SELECT doc_id AS media_id, text FROM documents
                      WHERE octet_length(encode(text)) >= $AudioFpMinBytes),
        corpus AS (
          SELECT media_id, text FROM base
          UNION ALL
          SELECT media_id + $DHashVariantOffset,
                 substr(text, 1, 30) || 'zzz' || substr(text, 34)
          FROM base WHERE media_id % 3 != 0 AND media_id % 5 = 0),
        $audioFpSqlCtes,
        sides AS (SELECT media_id, ahash,
                         media_id >= $DHashVariantOffset
                           OR media_id % 3 = 0 AS is_new
                  FROM ah),
        bands AS (SELECT media_id, ahash, is_new, b,
                         (ahash >> CAST($DHashBandBits * b AS INT)) &
                           $DHashBandMask AS bv
                  FROM sides CROSS JOIN
                    (SELECT unnest(range(0, $DHashBands)) AS b)),
        cand AS (SELECT DISTINCT n.media_id AS id_new, c.media_id AS id_corpus
                 FROM bands n JOIN bands c ON n.b = c.b AND n.bv = c.bv
                 WHERE n.is_new AND NOT c.is_new)
        SELECT id_new, id_corpus,
               CAST(bit_count(xor(x.ahash, y.ahash)) AS BIGINT) AS hamming,
               id_new = id_corpus + $DHashVariantOffset AS planted
        FROM cand
        JOIN sides x ON x.media_id = id_new
        JOIN sides y ON y.media_id = id_corpus
        WHERE bit_count(xor(x.ahash, y.ahash)) <= $DHashMaxHamming
        ORDER BY id_new, id_corpus"""))
  )

}
