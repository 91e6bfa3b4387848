package graft.ops

import graft.catalog.VersionedCatalog
import graft.pipeline.ExamplePipeline
import graft.{QueryDef, QueryModule, Tables => T}
import org.apache.spark.sql.functions._


/** Driver-visible queries exercising the reference-parity layer — the
  * versioned catalog and the 3-step example pipeline — through the
  * DuckDB-oracle correctness gate. Each run works in a fresh temp dir,
  * so results are deterministic and runs are independent.
  */
object PipelineOps extends QueryModule {

  override val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q60: the reference's example pipeline end-to-end (etl.go:146-159):
    // extract 6 literal users → versioned catalog → transform → staging
    // → promote to versioned output → read back the committed result.
    // Timestamp pinned for determinism (SURVEY.md §7.4/F2 deviation).
    QueryDef(
      "q60_pipeline_example",
      (s, _) => {
        val work = graft.Scratch.dir("q60")
        ExamplePipeline.run(s, s"$work/output", s"$work/temp",
          ts = "2024-01-01T00:00:00Z")
        new VersionedCatalog(s, s"$work/output")
          .latest("LoadOutput",
            Some(org.apache.spark.sql.types.StructType.fromDDL(
              "userId STRING, processedName STRING, timestamp STRING")))
          .select(col("userId"), col("processedName"), col("timestamp"))
          .orderBy(col("userId").cast("int"))
      },
      Some("""
        SELECT * FROM (VALUES
          ('1', 'Processed_Alice_Individually', '2024-01-01T00:00:00Z'),
          ('2', 'Processed_Bob_Individually', '2024-01-01T00:00:00Z'),
          ('3', 'Processed_Charlie_Individually', '2024-01-01T00:00:00Z'),
          ('4', 'Processed_Diana_Individually', '2024-01-01T00:00:00Z'),
          ('10', 'Processed_Bad User Transform_Individually', '2024-01-01T00:00:00Z'),
          ('11', 'Processed_Bad User Load_Individually', '2024-01-01T00:00:00Z'))
          AS t(userId, processedName, "timestamp")
        ORDER BY CAST(userId AS INT)""")),

    // ------------------------------------------------------------------
    // q61: catalog versioning + time travel: three growing snapshots of
    // orders are committed as v1..v3; reading v=2 must see exactly the
    // second snapshot — versions are immutable, later writes don't leak.
    QueryDef(
      "q61_catalog_timetravel",
      (s, dir) => {
        val work = graft.Scratch.dir("q61")
        val cat = new VersionedCatalog(s, work)
        val orders = T.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"))
        cat.writeNext("orders_snap", orders.filter(col("o_orderkey") % 10 === 1))
        cat.writeNext("orders_snap", orders.filter(col("o_orderkey") % 10 <= 3))
        cat.writeNext("orders_snap", orders)
        cat.read("orders_snap", 2,
            Some(org.apache.spark.sql.types.StructType.fromDDL(
              "o_orderkey BIGINT, o_orderstatus STRING")))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders
        WHERE o_orderkey % 10 <= 3
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ------------------------------------------------------------------
    // q117: CDC diff between committed versions — the read-side
    // complement of q66's merge and q61's time travel: v1 holds keys
    // ≡ 0..3 (mod 10), v2 holds keys ≡ 2..5 with doubled prices on
    // ≡ 3 — so the diff classifies ≡ 0,1 as deletes, ≡ 4,5 as
    // inserts, ≡ 3 as updates, and ≡ 2 (identical both sides) must
    // NOT flow. Aggregated per change class with old/new price sums so
    // a row-compare bug (a 'same' leaking, an update missed) shifts a
    // hashed number. One co-partitioned full-outer join on the key —
    // the merge shuffle shape; unchanged keys drop before anything
    // else happens.
    QueryDef(
      "q117_catalog_version_diff",
      (s, dir) => {
        val work = graft.Scratch.dir("q117")
        val cat = new VersionedCatalog(s, work)
        val orders = T.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").as("price"))
        cat.writeNext("snap", orders.filter(col("o_orderkey") % 10 <= 3))
        cat.writeNext("snap",
          orders.filter(col("o_orderkey") % 10 >= 2 && col("o_orderkey") % 10 <= 5)
            .withColumn("price",
              when(col("o_orderkey") % 10 === 3, col("price") * 2)
                .otherwise(col("price"))))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderkey BIGINT, o_orderstatus STRING, price DOUBLE")
        cat.diff("snap", 1, 2, Seq("o_orderkey"), Some(schema))
          .groupBy(col("change"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_orderkey")).as("key_sum"),
            graft.Dsl.dsum(col("old.price"), 2).as("old_price_sum"),
            graft.Dsl.dsum(col("new.price"), 2).as("new_price_sum"))
          .orderBy(col("change"))
      },
      Some(s"""
        SELECT change, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               ${graft.Dsl.dsumSql("old_price", 2)} AS old_price_sum,
               ${graft.Dsl.dsumSql("new_price", 2)} AS new_price_sum
        FROM (SELECT o_orderkey,
                     CASE WHEN o_orderkey % 10 IN (0, 1) THEN 'delete'
                          WHEN o_orderkey % 10 IN (4, 5) THEN 'insert'
                          WHEN o_orderkey % 10 = 3 THEN 'update' END AS change,
                     CASE WHEN o_orderkey % 10 <= 3 THEN o_totalprice END AS old_price,
                     CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2
                          WHEN o_orderkey % 10 IN (4, 5) THEN o_totalprice
                     END AS new_price
              FROM orders WHERE o_orderkey % 10 <= 5)
        WHERE change IS NOT NULL
        GROUP BY change ORDER BY change""")),

    // ------------------------------------------------------------------
    // q66: CDC-style catalog merge — base snapshot (keys ≡ 0 mod 3)
    // upserted with doubled-price updates (keys ≡ 0 mod 6) and inserts
    // (keys ≡ 1 mod 3); the merged next version must equal the oracle's
    // CASE reconstruction. Exercises row-wise replace semantics and the
    // co-partitioned full-outer merge shuffle end-to-end through JSONL.
    QueryDef(
      "q66_catalog_merge",
      (s, dir) => {
        val work = graft.Scratch.dir("q66")
        val cat = new VersionedCatalog(s, work)
        val orders = T.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").as("price"))
        cat.writeNext("snap", orders.filter(col("o_orderkey") % 3 === 0))
        val updates = orders.filter(col("o_orderkey") % 6 === 0)
          .withColumn("price", col("price") * 2)
          .unionAll(orders.filter(col("o_orderkey") % 3 === 1))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderkey BIGINT, o_orderstatus STRING, price DOUBLE")
        cat.merge("snap", updates, Seq("o_orderkey"), Some(schema))
        cat.latest("snap", Some(schema))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), graft.Dsl.dsum(col("price"), 2).as("total_price"))
          .orderBy(col("o_orderstatus"))
      },
      Some(s"""
        SELECT o_orderstatus, COUNT(*) AS n,
               ${graft.Dsl.dsumSql("price", 2)} AS total_price
        FROM (SELECT o_orderstatus,
                     CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice * 2
                          ELSE o_totalprice END AS price
              FROM orders
              WHERE o_orderkey % 3 = 0 OR o_orderkey % 3 = 1)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ------------------------------------------------------------------
    // q205: CDC INCREMENTAL VIEW MAINTENANCE — the materialized-view
    // complement of merge (q66) and diff (q117), the round-15
    // verdict's item #8: a per-status aggregate view is maintained
    // ACROSS catalog versions by folding diff deltas, never
    // recomputing. Three snapshot versions slide a key window
    // (inserts + deletes), double one residue class's price (update),
    // and MOVE one residue class to a new status (v3: %10 = 4 →
    // status 'Z' — the group-key-move edge: the fold treats every
    // update as delete(old row) + insert(new row), so measures leave
    // the old group and enter the new one; a naive "update in place"
    // fold would corrupt both groups). Measures: count, key sum, and
    // an exact DECIMAL(30,2) price sum — kept decimal END TO END in
    // the maintained table (adding doubles would break exactness; the
    // decimal fold is exact cents arithmetic, cast to double only in
    // the final output, the dsum convention). Output = the maintained
    // view at ALL THREE versions; the oracle recomputes each version's
    // aggregate from the snapshot definition — hash equality IS the
    // maintained ≡ recompute proof. 100 TB: each fold is one diff
    // (co-partitioned full-outer on the key) + a #groups-row
    // join — work ∝ the delta, never the table; the view is
    // catalog-versioned state like every other serving family.
    QueryDef(
      "q205_cdc_view_maintenance",
      (s, dir) => {
        val work = graft.Scratch.dir("q205")
        val cat = new VersionedCatalog(s, work)
        val orders = T.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").as("price"))
        def snap(lo: Int, hi: Int, bump: Int, move: Int) = orders
          .filter(col("o_orderkey") % 10 >= lo && col("o_orderkey") % 10 <= hi)
          .withColumn("price",
            when(col("o_orderkey") % 10 === bump, col("price") * 2)
              .otherwise(col("price")))
          .withColumn("o_orderstatus",
            when(col("o_orderkey") % 10 === move, lit("Z"))
              .otherwise(col("o_orderstatus")))
          .select(col("o_orderkey"), col("o_orderstatus"), col("price"))
        cat.writeNext("snap", snap(0, 3, -1, -1))
        cat.writeNext("snap", snap(2, 5, 3, -1))
        cat.writeNext("snap", snap(4, 7, 5, 4))
        val snapSchema = org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderkey BIGINT, o_orderstatus STRING, price DOUBLE")
        val viewSchema = org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderstatus STRING, n_orders BIGINT, key_sum BIGINT, " +
            "price_sum DECIMAL(30,2)")
        val dec = "decimal(30,2)"
        cat.writeNext("view", cat.read("snap", 1, Some(snapSchema))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_orderkey")).as("key_sum"),
            sum(col("price").cast(dec)).cast(dec).as("price_sum")))
        for (v <- 2 to 3) {
          val d = cat.diff("snap", v - 1, v, Seq("o_orderkey"),
            Some(snapSchema))
          val minus = d.filter(col("old").isNotNull).select(
            col("old.o_orderstatus").as("o_orderstatus"),
            lit(-1L).as("dn"), (-col("old.o_orderkey")).as("dk"),
            (-col("old.price").cast(dec)).as("dp"))
          val plus = d.filter(col("new").isNotNull).select(
            col("new.o_orderstatus").as("o_orderstatus"),
            lit(1L).as("dn"), col("new.o_orderkey").as("dk"),
            col("new.price").cast(dec).as("dp"))
          val delta = minus.unionByName(plus).groupBy(col("o_orderstatus"))
            .agg(sum(col("dn")).as("dn"), sum(col("dk")).as("dk"),
              sum(col("dp")).as("dp"))
          cat.writeNext("view", cat.read("view", v - 1, Some(viewSchema))
            .join(delta, Seq("o_orderstatus"), "full_outer")
            .select(col("o_orderstatus"),
              (coalesce(col("n_orders"), lit(0L))
                + coalesce(col("dn"), lit(0L))).as("n_orders"),
              (coalesce(col("key_sum"), lit(0L))
                + coalesce(col("dk"), lit(0L))).as("key_sum"),
              (coalesce(col("price_sum"), lit(0).cast(dec))
                + coalesce(col("dp"), lit(0).cast(dec))).cast(dec)
                .as("price_sum"))
            // a fully-deleted group leaves the view (recompute never
            // emits it)
            .filter(col("n_orders") > 0L))
        }
        (1 to 3).map(v => cat.read("view", v, Some(viewSchema))
            .withColumn("version", lit(v.toLong)))
          .reduce(_ unionByName _)
          .select(col("version"), col("o_orderstatus"), col("n_orders"),
            col("key_sum"), col("price_sum").cast("double").as("price_sum"))
          .orderBy(col("version"), col("o_orderstatus"))
      },
      Some("""
        WITH snaps AS (
          SELECT 1 AS v, o_orderkey, o_orderstatus,
                 o_totalprice AS price
          FROM orders WHERE o_orderkey % 10 <= 3
          UNION ALL
          SELECT 2, o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2
                      ELSE o_totalprice END
          FROM orders WHERE o_orderkey % 10 BETWEEN 2 AND 5
          UNION ALL
          SELECT 3, o_orderkey,
                 CASE WHEN o_orderkey % 10 = 4 THEN 'Z'
                      ELSE o_orderstatus END,
                 CASE WHEN o_orderkey % 10 = 5 THEN o_totalprice * 2
                      ELSE o_totalprice END
          FROM orders WHERE o_orderkey % 10 BETWEEN 4 AND 7)
        SELECT CAST(v AS BIGINT) AS version, o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(CAST(price AS DECIMAL(30,2))) AS DOUBLE)
                 AS price_sum
        FROM snaps GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
