package graft.ext

import graft.SparkSpec
import graft.ext.Multimodal._
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
