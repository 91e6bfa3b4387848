package graft.ops

import graft.SparkSpec
import graft.catalog.VersionedCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Edge-case contract for the q205 CDC view-maintenance fold: a tiny
  * literal table exercising every change kind in one version step —
  * pure insert, pure delete, measure update, group-key move, and a
  * group fully emptied by deletes — and the law the query rests on:
  * folding the diff's delete(old)+insert(new) rows into the previous
  * aggregate equals recomputing the aggregate from the new snapshot.
  */
class CdcViewSpec extends SparkSpec {

  private val snapSchema = StructType.fromDDL(
    "k BIGINT, grp STRING, m BIGINT")
  private val viewSchema = StructType.fromDDL(
    "grp STRING, n BIGINT, m_sum BIGINT")

  private def aggOf(df: DataFrame): DataFrame =
    df.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("m_sum"))

  private def fold(prev: DataFrame, d: DataFrame): DataFrame = {
    val minus = d.filter(col("old").isNotNull).select(
      col("old.grp").as("grp"), lit(-1L).as("dn"), (-col("old.m")).as("dm"))
    val plus = d.filter(col("new").isNotNull).select(
      col("new.grp").as("grp"), lit(1L).as("dn"), col("new.m").as("dm"))
    val delta = minus.unionByName(plus).groupBy(col("grp"))
      .agg(sum(col("dn")).as("dn"), sum(col("dm")).as("dm"))
    prev.join(delta, Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("m_sum"), lit(0L)) + coalesce(col("dm"), lit(0L)))
          .as("m_sum"))
      .filter(col("n") > 0L)
  }

  test("diff fold covers insert, delete, update, group move, emptied group") {
    import spark.implicits._
    val work = graft.Scratch.dir("cdc-spec")
    val cat = new VersionedCatalog(spark, work, format = "parquet")
    // v1: groups a (k=1,2), b (k=3), c (k=4) — c will be emptied
    val v1 = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L),
      (4L, "c", 40L)).toDF("k", "grp", "m")
    // v2: k=1 measure update (10→15), k=2 MOVES a→b, k=3 unchanged,
    // k=4 deleted (c empties), k=5 pure insert into a
    val v2 = Seq((1L, "a", 15L), (2L, "b", 20L), (3L, "b", 30L),
      (5L, "a", 50L)).toDF("k", "grp", "m")
    cat.writeNext("t", v1)
    cat.writeNext("t", v2)
    val d = cat.diff("t", 1, 2, Seq("k"), Some(snapSchema))
    val kinds = d.groupBy(col("change")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds == Map("insert" -> 1L, "delete" -> 1L, "update" -> 2L),
      s"diff kinds: $kinds")
    val maintained = fold(aggOf(cat.read("t", 1, Some(snapSchema))), d)
      .orderBy(col("grp")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val recomputed = aggOf(cat.read("t", 2, Some(snapSchema)))
      .orderBy(col("grp")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(maintained.sameElements(recomputed),
      s"maintained ${maintained.toSeq} != recomputed ${recomputed.toSeq}")
    // the emptied group is gone, the moved row landed
    assert(!maintained.exists(_._1 == "c"))
    assert(maintained.find(_._1 == "b").map(_._2).contains(2L))
  }

  test("a second fold composes: v1→v2→v3 equals direct recompute of v3") {
    import spark.implicits._
    val work = graft.Scratch.dir("cdc-spec2")
    val cat = new VersionedCatalog(spark, work, format = "parquet")
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "grp", "m")
    val v2 = Seq((1L, "a", 11L), (2L, "b", 20L), (3L, "b", 30L))
      .toDF("k", "grp", "m")
    val v3 = Seq((1L, "b", 11L), (3L, "b", 31L)).toDF("k", "grp", "m")
    cat.writeNext("t", v1); cat.writeNext("t", v2); cat.writeNext("t", v3)
    val step1 = fold(aggOf(cat.read("t", 1, Some(snapSchema))),
      cat.diff("t", 1, 2, Seq("k"), Some(snapSchema)))
    val step2 = fold(step1, cat.diff("t", 2, 3, Seq("k"), Some(snapSchema)))
    val got = step2.orderBy(col("grp")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = aggOf(cat.read("t", 3, Some(snapSchema)))
      .orderBy(col("grp")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sameElements(want), s"${got.toSeq} != ${want.toSeq}")
  }
}
