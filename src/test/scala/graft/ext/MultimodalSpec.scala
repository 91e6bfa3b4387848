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

  test("resize rewrites metadata and shrinks payload monotonically") {
    val media = mediaFromDocs(spark, dir)
    val small = resize(media, 16, 16).collect()
    val orig = media.collect().map(m => m.media_id -> m).toMap
    small.foreach { m =>
      assert(m.meta.width == 16 && m.meta.height == 16)
      assert(m.content.length <= orig(m.media_id).content.length)
    }
  }

  test("sampleFrames: videos explode into n indexed frames covering the payload") {
    val media = mediaFromDocs(spark, dir)
    val nVideos = media.filter(_.meta.media_type == "video").count()
    val frames = sampleFrames(media, 4)
    val rows = frames.collect()
    assert(rows.length == nVideos * 4)
    val byId = rows.groupBy(_.media_id)
    byId.foreach { case (_, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
      // frame slices partition the payload: total bytes preserved
      val total = fs.map(_.content.length).sum
      val origLen = media.filter(_.media_id == fs.head.media_id)
        .head().content.length
      assert(total == origLen)
    }
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
