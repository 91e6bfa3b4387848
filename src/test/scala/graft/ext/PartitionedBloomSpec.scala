package graft.ext

import graft.SparkSpec
import graft.functions.BloomFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** The sharded Bloom decontamination path (q83): the distributed
  * BloomBuildAgg sketch builder and its contract equivalence with the
  * driver-built q58 variant. */
class PartitionedBloomSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bloom_build aggregate: no false negatives through serialize/merge") {
    val s = spark
    import s.implicits._
    // 4 shards × 2 partitions each forces partial-agg buffers to merge
    // through serialize/deserialize before the final sketch bytes
    val sketches = spark.range(10000)
      .select(col("id"), pmod(col("id"), lit(4L)).cast("int").as("shard"))
      .repartition(8, col("shard"), pmod(col("id"), lit(2L)))
      .groupBy(col("shard"))
      .agg(BloomFunctions.bloomBuild(col("id"), 5000L, 0.01).as("sketch"))
      .as[(Int, Array[Byte])].collect().toMap
    assert(sketches.keySet == Set(0, 1, 2, 3))
    val blooms = sketches.view.mapValues(b =>
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))).toMap
    // every inserted id tests true in ITS shard's sketch — Bloom's
    // zero-false-negative guarantee must survive the distributed build
    (0L until 10000L).foreach { id =>
      assert(blooms((id % 4).toInt).mightContainLong(id), s"false negative: $id")
    }
    // and the shards are genuinely disjoint sketches, not copies: an id
    // from another shard is mostly absent (bound is generous: fpp 1%)
    val crossHits = (0L until 10000L).count(id =>
      blooms(((id + 1) % 4).toInt).mightContainLong(id))
    assert(crossHits < 500, s"shard sketches look merged: $crossHits cross-hits")
  }

  test("bloom shard count follows the sizing rule: floor 8, hundreds at 1e9+") {
    assert(Curation.bloomShardCount(0L) == 8)
    assert(Curation.bloomShardCount(60000L) == 8) // fixture scale → floor
    assert(Curation.bloomShardCount(64L * 1000 * 1000) == 8)
    assert(Curation.bloomShardCount(100L * 1000 * 1000) == 13)
    assert(Curation.bloomShardCount(1000L * 1000 * 1000) == 125) // 1e9 → hundreds
    assert(Curation.bloomShardCount(10L * 1000 * 1000 * 1000) == 1250)
    // the rule is TOTAL: absurd inputs clamp instead of wrapping the
    // long→int cast negative
    assert(Curation.bloomShardCount(Long.MaxValue) == (1 << 20))
  }

  test("(shard, sketch) table round-trips through the catalog; membership " +
      "serves from the reloaded table") {
    // The q83 claim made demonstrable: the sharded sketch table is
    // index-as-data — persist it through the versioned catalog, reload,
    // and serve membership from the RELOADED rows with no rebuild.
    // Built from q83's OWN prep + shard derivation (contamPrep /
    // bloomShardCount), so this stays a demonstration of the
    // production table, not of a test-local copy.
    val s = spark
    import s.implicits._
    val (_, _, sh) = Curation.contamPrep(spark, dir)
    val trainH = sh.filter(col("split") === "train").select(col("h"))
      .distinct().persist()
    val nTrain = trainH.count()
    val nShards = Curation.bloomShardCount(nTrain)
    val perShard = math.max(nTrain / nShards + 1, 1000L)
    val sketches = trainH
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
      .repartition(nShards, col("shard"))
      .groupBy(col("shard"))
      .agg(BloomFunctions.bloomBuild(col("h"), perShard, 1e-4).as("sketch"))
    val built = sketches.as[(Int, Array[Byte])].collect().toMap
    val tmp = java.nio.file.Files.createTempDirectory("graft-bloom-").toString
    val cat = new graft.catalog.VersionedCatalog(spark, tmp, format = "parquet")
    cat.writeNext("bloom_shards", sketches)
    val reloaded = cat.latest("bloom_shards")
      .select(col("shard").cast("int"), col("sketch"))
      .as[(Int, Array[Byte])].collect().toMap
    // parquet binary round-trip is bit-exact: the reloaded sketch bytes
    // ARE the built ones, so every membership verdict is identical
    assert(reloaded.keySet == built.keySet)
    reloaded.foreach { case (shard, bytes) =>
      assert(java.util.Arrays.equals(bytes, built(shard)), s"shard $shard bytes drifted")
    }
    // and serving from the reloaded table keeps the Bloom guarantee:
    // zero false negatives over every inserted train hash
    val blooms = reloaded.view.mapValues(b =>
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))).toMap
    val misses = trainH.collect().map(_.getLong(0))
      .count(h => !blooms((h % nShards).toInt).mightContainLong(h))
    assert(misses == 0, s"$misses false negatives after catalog round-trip")
    trainH.unpersist()
    spark.catalog.clearCache()
  }

  test("q83 sharded contract rows equal q58 driver-bloom contract rows") {
    // Same oracle, same contract: exact counts are sketch-independent
    // and both fp booleans must pin true. Row-for-row equality at
    // fixture scale is the strongest cheap cross-check of the refactor.
    val q58 = graft.SparkEntry.queries("q58_bloom_decontamination")(spark, dir)
      .collect().map(_.toSeq)
    spark.catalog.clearCache()
    val q83 = graft.SparkEntry.queries("q83_bloom_decontam_sharded")(spark, dir)
      .collect().map(_.toSeq)
    spark.catalog.clearCache()
    assert(q58.length == q83.length && q58.nonEmpty)
    assert(q58.toSeq == q83.toSeq)
    // and the booleans actually pin: no false negatives anywhere, fp
    // inside tolerance for every source
    q83.foreach { r =>
      assert(r(3) == 0L, s"false negatives in $r")
      assert(r(4) == true, s"fp tolerance failed in $r")
    }
  }
}
