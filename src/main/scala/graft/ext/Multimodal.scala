package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus the decode / feature-extract / resize /
  * frame-sample plumbing a training-data pipeline needs.
  *
  * The heavy codecs (JPEG/PNG/ffmpeg) are NOT in this container, so the
  * decode kernel is a clearly-marked DETERMINISTIC STUB (seeded from the
  * payload bytes). Everything around it is real and tested: the schema
  * (BinaryType + metadata struct), the batched per-partition execution
  * shape (the Scala analog of mapInPandas: mapPartitions over grouped
  * batches, so a real decoder would amortize model/codec init per batch,
  * not per row), the 1→N frame-sampling generator, and size-aware
  * repartitioning so decode work balances across executors.
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
  final case class Frame(
      media_id: Long, frame_idx: Int, frame_ts_ms: Long, content: Array[Byte])

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

  /** Resize: pure metadata transform + stubbed payload rewrite (a real
    * impl re-encodes pixels; the stub truncates proportionally so byte
    * counts behave like a downscale). */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val scale = math.min(1.0,
        (w.toLong * h).toDouble
          / math.max(1.0, (m.meta.width.toLong * m.meta.height).toDouble))
      m.copy(
        content = m.content.take(math.max(1, (m.content.length * scale).toInt)),
        meta = m.meta.copy(width = w, height = h))
    }
  }

  /** Frame sampling: 1→N generator for video payloads — emits `n`
    * evenly-spaced (frame_idx, ts) rows; the stub carves a byte slice
    * per frame where a real impl would decode the frame at that ts. */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.media_type == "video").flatMap { m =>
      val step = math.max(1L, m.meta.duration_ms / math.max(1, n))
      (0 until n).iterator.map { i =>
        val a = (m.content.length.toLong * i / n).toInt
        val b = (m.content.length.toLong * (i + 1) / n).toInt
        Frame(m.media_id, i, i * step, m.content.slice(a, b))
      }
    }
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

    // q72: the 1→N frame-sampling generator, driver-visible — per video,
    // 4 evenly-spaced frames; the stub slices payload bytes at exact
    // integer boundaries, so frame timestamps and byte counts are
    // oracle-expressible (integer division on both engines).
    QueryDef(
      "q72_frame_samples",
      (s, dir) => {
        import s.implicits._
        sampleFrames(mediaFromDocs(s, dir), n = 4)
          .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
            col("frame_ts_ms"),
            octet_length(col("content")).cast("long").as("frame_bytes"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some("""
        SELECT media_id, CAST(i AS BIGINT) AS frame_idx,
               i * greatest(1, duration_ms // 4) AS frame_ts_ms,
               (len * (i+1) // 4) - (len * i // 4) AS frame_bytes
        FROM (SELECT doc_id AS media_id,
                     CAST(octet_length(encode(text)) AS BIGINT) AS len,
                     CAST(n_chars * 10 AS BIGINT) AS duration_ms
              FROM documents WHERE doc_id % 3 = 2),
             (SELECT unnest(range(0, 4)) AS i)
        ORDER BY media_id, frame_idx""")),

    // q73: the resize kernel, driver-visible — metadata rewrite + the
    // stub's proportional byte truncation. The double `scale` applies
    // identical IEEE ops on both engines; the byte count is its floor.
    QueryDef(
      "q73_media_resize",
      (s, dir) => {
        import s.implicits._
        resize(mediaFromDocs(s, dir), w = 64, h = 64)
          .select(col("media_id"),
            octet_length(col("content")).cast("long").as("resized_bytes"),
            col("meta.width").cast("long").as("width"),
            col("meta.height").cast("long").as("height"))
          .orderBy(col("media_id"))
      },
      Some("""
        SELECT media_id,
               -- empty payloads stay empty: take(max(1,0)) of zero bytes is
               -- zero bytes, so the 1-byte floor only applies to len > 0
               CASE WHEN len = 0 THEN 0 ELSE
                 greatest(1, CAST(floor(len * least(1.0,
                   (64.0 * 64.0) / greatest(1.0, CAST(w AS DOUBLE) * CAST(h AS DOUBLE))
                 )) AS BIGINT)) END AS resized_bytes,
               CAST(64 AS BIGINT) AS width, CAST(64 AS BIGINT) AS height
        FROM (SELECT doc_id AS media_id,
                     CAST(octet_length(encode(text)) AS BIGINT) AS len,
                     CAST(doc_id % 640 + 16 AS INT) AS w,
                     CAST(doc_id % 480 + 16 AS INT) AS h
              FROM documents)
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
        ORDER BY media_id"""))
  )
}
