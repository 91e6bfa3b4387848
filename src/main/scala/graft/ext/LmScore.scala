package graft.ext

import graft.{QueryDef, QueryModule, Tables => T}
import graft.ext.{TextDsl => X}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Language-model quality scoring with EXACT integer arithmetic — the
  * perplexity filter of large-corpus curation (CCNet's KenLM pass,
  * Gopher's quality rules: Wenzek et al., "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data", LREC 2020; Rae
  * et al., "Scaling Language Models: ... Gopher", 2021 §A.1.1)
  * re-expressed so two engines can hash-compare the scores bit for bit.
  *
  * The model is an add-one-smoothed word-bigram LM fit on the corpus
  * itself: P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V), with c(w1 ·) the
  * bigram-prefix mass of w1 and V the corpus vocabulary size. A
  * document's score is its total Shannon information under the model
  * in WHOLE BITS, floor-quantized per bigram:
  *
  *   bits(bg) = floor(log2((c(w1 ·) + V) / (c(bg) + 1)))
  *
  * — and floor-log2 of a rational n/d (n ≥ d ≥ 1) is pure integer
  * arithmetic: k = bitlen(n) − bitlen(d), minus one iff (d << k) > n.
  * No IEEE log anywhere, so the scores are bit-identical on any engine
  * — the same trick as the HLL estimator's integer harmonic sum
  * ([[Hll]]). Rare/unseen continuations cost many bits, boilerplate
  * costs few; `centibits_per_bigram` is the length-normalized quality
  * signal a curation threshold would cut on (high = surprising =
  * likely noise; low = repetitive boilerplate — both tails are the
  * filter's business, exactly as with KenLM perplexity).
  *
  * 100 TB shape: the LM is a bigram count table — corpus-reduced,
  * partial-aggregable, catalog-persistable index-as-data like the
  * sketch families. Scoring is ONE doc-side shuffle join (documents'
  * bigrams against the LM keyed by bigram; the prefix mass rides the
  * LM row, attached LM-side) + one per-doc aggregation. V is a 1-row
  * broadcast. Nothing driver-sided, nothing quadratic; fitting on a
  * REFERENCE slice and scoring a different corpus is the same plan
  * with a different left side.
  */
object LmScore extends QueryModule {

  /** bitlen(x) for positive int64, as a codegen'd column: length of the
    * binary text form — both engines agree exactly. */
  private def bitlen(c: Column): Column = length(bin(c))

  /** floor(log2(n / d)) for 1 <= d <= n, exact: no floats involved.
    * (functions.shiftleft only takes a literal shift, so the
    * column-by-column shift goes through call_function.) private[ext]:
    * the integer-entropy term in [[Curation]]'s q126 report reuses it. */
  private[ext] def floorLog2Ratio(n: Column, d: Column): Column = {
    val k = (bitlen(n) - bitlen(d)).cast("int")
    when(call_function("shiftleft", d, k) > n, k - 1).otherwise(k).cast("long")
  }

  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), X.tokens(col("text")).as("tk"))

  private def bigramsTk(toks: DataFrame): DataFrame = toks.select(
    col("doc_id"), explode(X.shingles(col("tk"), 2)).as("bg"))

  /** The persistable LM state: (bg, cb) exact bigram counts — a count
    * table, so it is a LINEAR sketch in the CMS sense: epoch tables
    * fold by [[mergeBigramCounts]] and the fold is the union corpus's
    * LM exactly. */
  def bigramCounts(docs: DataFrame): DataFrame =
    bigramCountsTk(tokenized(docs))

  /** [[bigramCounts]] over a PRE-TOKENIZED (doc_id, tk) frame — the
    * seam that lets a caller tokenize once, cache, and feed every LM
    * stage (q126's one-pass report). */
  def bigramCountsTk(toks: DataFrame): DataFrame =
    bigramsTk(toks).groupBy(col("bg")).agg(count(lit(1)).as("cb"))

  /** The LM's other persistable half: the distinct token vocabulary
    * (one row per token). Folds by union-distinct — NOT by adding
    * sizes, which is why the vocabulary persists as a table, not a
    * count. */
  def vocabTokens(docs: DataFrame): DataFrame =
    vocabTokensTk(tokenized(docs))

  /** [[vocabTokens]] over a pre-tokenized (doc_id, tk) frame. */
  def vocabTokensTk(toks: DataFrame): DataFrame =
    toks.select(explode(col("tk")).as("t")).distinct()

  /** Additive merge: lm(A) ⊕ lm(B) = lm(A ∪ B) exactly — bigram counts
    * are linear like CMS cells ([[CountMin.mergeSketches]]), so epoch
    * LMs fold through the catalog with the same
    * atomic-epoch-tag discipline as the sketch sinks. */
  def mergeBigramCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("bg"), col("cb").as("ca"))
      .join(b.select(col("bg"), col("cb").as("cbb")), Seq("bg"), "full_outer")
      .select(col("bg"),
        (coalesce(col("ca"), lit(0L)) + coalesce(col("cbb"), lit(0L)))
          .as("cb"))

  /** Score `score` documents against a persisted LM state — the bigram
    * count joins by bigram and the prefix mass joins by FIRST WORD
    * independently (a bigram unseen in the LM can still carry a seen
    * prefix, and its c(w1 ·) must be that prefix's full mass, not 0);
    * both are LM-derived tables, V is a 1-row broadcast. A fully
    * unseen bigram gets c(bg) = 0 and an unseen prefix c(w1 ·) = 0 —
    * add-one keeps both defined. */
  def scoreAgainstLm(lmB: DataFrame, vocab: DataFrame,
      score: DataFrame): DataFrame =
    scoreAgainstLmTk(lmB, vocab, tokenized(score))

  /** [[scoreAgainstLm]] with a pre-tokenized (doc_id, tk) score frame. */
  def scoreAgainstLmTk(lmB: DataFrame, vocab: DataFrame,
      scoreTk: DataFrame): DataFrame = {
    val prefixMass = lmB
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .groupBy(col("w1")).agg(sum(col("cb")).as("cp"))
    val v1 = vocab.agg(count(lit(1)).as("v"))
    bigramsTk(scoreTk)
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .join(lmB, Seq("bg"), "left")
      .join(prefixMass, Seq("w1"), "left")
      .crossJoin(broadcast(v1))
      // clamp at 0: with a sane LM state num ≥ den always holds (the
      // prefix mass dominates any continuation count and v ≥ 1), but a
      // DEGENERATE fit corpus (v = 0) would make floorLog2Ratio return
      // −1 per unseen bigram, total_bits could go negative, and the
      // centibits division would hit the Spark-div-truncates vs
      // DuckDB-//-floors divergence — greatest(0, ·) closes that edge
      // identically on both engines (oracles mirror it)
      .select(col("doc_id"),
        greatest(lit(0L),
          floorLog2Ratio(coalesce(col("cp"), lit(0L)) + col("v"),
            coalesce(col("cb"), lit(0L)) + lit(1L))).as("bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("total_bits"))
      .select(col("doc_id"), col("n_bigrams"), col("total_bits"),
        expr("(total_bits * 100) div n_bigrams").as("centibits_per_bigram"))
  }

  /** Per-document integer surprise under an add-one bigram LM fit on
    * `fit`, scored over `score` (self-scoring when they coincide —
    * the q121 instantiation). Columns: doc_id, n_bigrams, total_bits,
    * centibits_per_bigram. Documents with fewer than 2 tokens have no
    * bigrams and do not flow. */
  def surpriseScores(fit: DataFrame, score: DataFrame): DataFrame =
    scoreAgainstLm(bigramCounts(fit), vocabTokens(fit), score)

  /** [[surpriseScores]] over pre-tokenized (doc_id, tk) frames. */
  def surpriseScoresTk(fitTk: DataFrame, scoreTk: DataFrame): DataFrame =
    scoreAgainstLmTk(bigramCountsTk(fitTk), vocabTokensTk(fitTk), scoreTk)

  /** DSIR selection (q127 — see the QueryDef note): every `docs` row
    * scored under the source LM (fit on `docs`) and the target LM (fit
    * on `target`), per-bigram deficit centibits clamped at 0, whole-bit
    * deficit capped at 13, and deterministic md5-residue acceptance
    * with probability 2^−deficit_log2. */
  def dsirSampling(docs: DataFrame, target: DataFrame): DataFrame = {
    val src = surpriseScores(docs, docs)
      .select(col("doc_id"), col("n_bigrams"),
        col("total_bits").as("bits_src"))
    val tgt = surpriseScores(target, docs)
      .select(col("doc_id"), col("total_bits").as("bits_tgt"))
    src.join(tgt, "doc_id")
      // clamp the bit difference at 0 BEFORE dividing: Spark's div
      // truncates toward zero, DuckDB's // floors — they disagree
      // on negative numerators, so the compared value must never
      // see one (≤ 0 means "at least as target-like as source",
      // deficit 0 either way)
      .withColumn("deficit_centibits",
        expr("(greatest(0L, bits_tgt - bits_src) * 100) div n_bigrams"))
      .withColumn("deficit_log2",
        least(lit(13L), expr("deficit_centibits div 100")))
      .withColumn("thr_e4",
        expr("10000 div shiftleft(1L, CAST(deficit_log2 AS INT))"))
      .withColumn("accepted",
        X.h60(concat(lit("dsir "), col("doc_id").cast("string")))
          % 10000L < col("thr_e4"))
      .select(col("doc_id"), col("n_bigrams"), col("bits_src"),
        col("bits_tgt"), col("deficit_centibits"), col("deficit_log2"),
        col("thr_e4"), col("accepted"))
  }

  // -------------------------------------------------------------------
  // TRIGRAM model (q157/q158) — the same add-one/floor-log2 discipline
  // one order up: P(w3|w1 w2) = (c(w1 w2 w3) + 1) / (c(w1 w2 ·) + V),
  // bits(tg) = floor(log2((c(w1 w2 ·) + V) / (c(tg) + 1))). The
  // unseen-prefix two-join contract generalizes exactly as the class
  // doc promised: the count joins by TRIGRAM, the prefix mass joins by
  // the (w1, w2) BIGRAM prefix independently (an unseen trigram can
  // still carry a seen two-word prefix whose full continuation mass
  // must price it), V stays the unigram vocabulary. This is the
  // CCNet-fidelity step past q121's bigram (real perplexity filters
  // are 5-gram KenLM; bigram underfits topical text — higher orders
  // are this same shape again with a longer prefix key).

  private def trigramsTk(toks: DataFrame): DataFrame = toks.select(
    col("doc_id"), explode(X.shingles(col("tk"), 3)).as("tg"))

  /** The persistable trigram LM state: (tg, ct) exact counts — linear
    * like [[bigramCounts]], folds by [[mergeTrigramCounts]]. */
  def trigramCountsTk(toks: DataFrame): DataFrame =
    trigramsTk(toks).groupBy(col("tg")).agg(count(lit(1)).as("ct"))

  /** Additive fold: lm3(A) ⊕ lm3(B) = lm3(A ∪ B) exactly. */
  def mergeTrigramCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("tg"), col("ct").as("ca"))
      .join(b.select(col("tg"), col("ct").as("cbb")), Seq("tg"), "full_outer")
      .select(col("tg"),
        (coalesce(col("ca"), lit(0L)) + coalesce(col("cbb"), lit(0L)))
          .as("ct"))

  /** The (w1 w2) prefix as a single key column — tokens are
    * whitespace-split, so the space join is collision-free. */
  private def tgPrefix(tg: Column): Column =
    concat_ws(" ", slice(split(tg, " "), 1, 2))

  /** Score a pre-tokenized frame against a persisted trigram LM —
    * [[scoreAgainstLmTk]]'s contract one order up: trigram-keyed count
    * join + (w1,w2)-prefix mass join + 1-row V broadcast; fully unseen
    * trigram ⇒ c = 0, unseen prefix ⇒ mass 0; add-one keeps both
    * defined and `greatest(0, ·)` closes the degenerate-fit edge
    * identically on both engines. Documents with < 3 tokens have no
    * trigrams and do not flow. */
  def scoreAgainstLm3Tk(lm3: DataFrame, vocab: DataFrame,
      scoreTk: DataFrame): DataFrame = {
    val prefixMass = lm3
      .withColumn("p2", tgPrefix(col("tg")))
      .groupBy(col("p2")).agg(sum(col("ct")).as("cp"))
    val v1 = vocab.agg(count(lit(1)).as("v"))
    trigramsTk(scoreTk)
      .withColumn("p2", tgPrefix(col("tg")))
      .join(lm3, Seq("tg"), "left")
      .join(prefixMass, Seq("p2"), "left")
      .crossJoin(broadcast(v1))
      .select(col("doc_id"),
        greatest(lit(0L),
          floorLog2Ratio(coalesce(col("cp"), lit(0L)) + col("v"),
            coalesce(col("ct"), lit(0L)) + lit(1L))).as("bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("bits")).as("total_bits"))
      .select(col("doc_id"), col("n_trigrams"), col("total_bits"),
        expr("(total_bits * 100) div n_trigrams").as("centibits_per_trigram"))
  }

  /** Self-scoring under the trigram model (q157; fit = score frame). */
  def surpriseScores3Tk(fitTk: DataFrame, scoreTk: DataFrame): DataFrame =
    scoreAgainstLm3Tk(trigramCountsTk(fitTk), vocabTokensTk(fitTk), scoreTk)

  /** Whole-bit backoff penalty — the integer stand-in for stupid
    * backoff's α ≈ 0.4 discount (Brants et al., "Large Language
    * Models in Machine Translation", EMNLP 2007): one extra bit ≈
    * α = 0.5, the nearest power of two. */
  val BackoffPenaltyBits = 1L

  /** BACKOFF scoring (q161): price each trigram under the trigram
    * model when the LM has SEEN it, else back off to the bigram model
    * plus [[BackoffPenaltyBits]] — Brants' stupid backoff in the
    * floor-log2 integer discipline (no normalization, like the
    * original: it's a score, not a distribution). Backoff is what
    * higher-order models need to be USABLE cross-corpus: a pure
    * add-one trigram prices every unseen continuation near log2(V)
    * regardless of how plausible its bigram tail is; backoff
    * discriminates. Self-scoring never fires the backoff branch (every
    * trigram is seen in its own fit), so the q161 instantiation is
    * cross-corpus by construction. Both orders' count tables are the
    * same linear-sketch state as q122/q158 — the whole model persists
    * and folds through the catalog unchanged. */
  def backoffScoresTk(fitTk: DataFrame, scoreTk: DataFrame): DataFrame = {
    val lm3 = trigramCountsTk(fitTk)
    val lm2 = bigramCountsTk(fitTk)
    val pm3 = lm3.withColumn("p2", tgPrefix(col("tg")))
      .groupBy(col("p2")).agg(sum(col("ct")).as("cp3"))
    val pm2 = lm2.withColumn("w1", split(col("bg"), " ").getItem(0))
      .groupBy(col("w1")).agg(sum(col("cb")).as("cp2"))
    val v1 = vocabTokensTk(fitTk).agg(count(lit(1)).as("v"))
    trigramsTk(scoreTk)
      .withColumn("p2", tgPrefix(col("tg")))
      // the backoff bigram is the trigram's TAIL (w2 w3): the longest
      // context the lower-order model can still condition on
      .withColumn("bg", concat_ws(" ", slice(split(col("tg"), " "), 2, 2)))
      .withColumn("w1", split(col("tg"), " ").getItem(1))
      .join(lm3, Seq("tg"), "left")
      .join(pm3, Seq("p2"), "left")
      .join(lm2, Seq("bg"), "left")
      .join(pm2, Seq("w1"), "left")
      .crossJoin(broadcast(v1))
      .select(col("doc_id"),
        col("ct").isNotNull.as("seen"),
        when(col("ct").isNotNull,
          greatest(lit(0L), floorLog2Ratio(
            coalesce(col("cp3"), lit(0L)) + col("v"), col("ct") + lit(1L))))
          .otherwise(lit(BackoffPenaltyBits) +
            greatest(lit(0L), floorLog2Ratio(
              coalesce(col("cp2"), lit(0L)) + col("v"),
              coalesce(col("cb"), lit(0L)) + lit(1L))))
          .as("bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("seen"), 0L).otherwise(1L)).as("n_backoff"),
        sum(col("bits")).as("total_bits"))
      .select(col("doc_id"), col("n_trigrams"), col("n_backoff"),
        col("total_bits"),
        expr("(total_bits * 100) div n_trigrams").as("centibits_per_trigram"))
  }

  // -------------------------------------------------------------------
  // FOURGRAM model (q190/q191) — the trigram section's closing promise
  // kept ("higher orders are this same shape again with a longer
  // prefix key"): P(w4|w1 w2 w3) = (c(w1 w2 w3 w4) + 1) /
  // (c(w1 w2 w3 ·) + V), bits = floor(log2((c(p3 ·) + V) / (c(fg) +
  // 1))). One order below KenLM's 5-gram default — and the LAST order
  // the fixture corpus can exercise meaningfully (at 4-gram the
  // self-fit is already near-singleton; order 5 would price every
  // continuation identically). The count table stays a linear sketch:
  // epoch tables fold additively like q122/q158's.

  private def fourgramsTk(toks: DataFrame): DataFrame = toks.select(
    col("doc_id"), explode(X.shingles(col("tk"), 4)).as("fg"))

  /** The persistable 4-gram LM state: (fg, cf) exact counts — linear
    * like [[trigramCountsTk]], folds additively. */
  def fourgramCountsTk(toks: DataFrame): DataFrame =
    fourgramsTk(toks).groupBy(col("fg")).agg(count(lit(1)).as("cf"))

  /** The (w1 w2 w3) prefix as a single key column. */
  private def fgPrefix(fg: Column): Column =
    concat_ws(" ", slice(split(fg, " "), 1, 3))

  /** Score a pre-tokenized frame against a persisted 4-gram LM —
    * [[scoreAgainstLm3Tk]]'s contract one order up: 4-gram count join
    * + (w1,w2,w3)-prefix mass join + 1-row V broadcast; unseen 4-gram
    * ⇒ c = 0, unseen prefix ⇒ mass 0. Documents with < 4 tokens have
    * no 4-grams and do not flow. */
  def scoreAgainstLm4Tk(lm4: DataFrame, vocab: DataFrame,
      scoreTk: DataFrame): DataFrame = {
    val prefixMass = lm4
      .withColumn("p3", fgPrefix(col("fg")))
      .groupBy(col("p3")).agg(sum(col("cf")).as("cp"))
    val v1 = vocab.agg(count(lit(1)).as("v"))
    fourgramsTk(scoreTk)
      .withColumn("p3", fgPrefix(col("fg")))
      .join(lm4, Seq("fg"), "left")
      .join(prefixMass, Seq("p3"), "left")
      .crossJoin(broadcast(v1))
      .select(col("doc_id"),
        greatest(lit(0L),
          floorLog2Ratio(coalesce(col("cp"), lit(0L)) + col("v"),
            coalesce(col("cf"), lit(0L)) + lit(1L))).as("bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fourgrams"), sum(col("bits")).as("total_bits"))
      .select(col("doc_id"), col("n_fourgrams"), col("total_bits"),
        expr("(total_bits * 100) div n_fourgrams").as("centibits_per_fourgram"))
  }

  /** Self-scoring under the 4-gram model (q190; fit = score frame). */
  def surpriseScores4Tk(fitTk: DataFrame, scoreTk: DataFrame): DataFrame =
    scoreAgainstLm4Tk(fourgramCountsTk(fitTk), vocabTokensTk(fitTk), scoreTk)

  /** CHAINED stupid backoff (q191) — [[backoffScoresTk]] one order up
    * AND one level deeper: price each 4-gram under the 4-gram model
    * when the LM has seen it; else back off to the trigram TAIL
    * (w2 w3 w4) plus [[BackoffPenaltyBits]]; if the trigram is unseen
    * too, back off again to the bigram tail (w3 w4) plus 2 bits — the
    * full recursive chain of Brants' stupid backoff (EMNLP 2007, α per
    * dropped order) in the floor-log2 integer discipline. The branch
    * decisions (n_bo3 = priced at trigram, n_bo2 = priced at bigram)
    * are part of the hash-checked contract. All three orders' count
    * tables are the same linear-sketch state — the whole model
    * persists and folds through the catalog unchanged. Scale: six
    * doc-side equi-joins + per-doc agg — no new shuffle class over
    * q161, just more keyed lookups against corpus-reduced tables. */
  def backoffChainScoresTk(fitTk: DataFrame, scoreTk: DataFrame): DataFrame = {
    val lm4 = fourgramCountsTk(fitTk)
    val lm3 = trigramCountsTk(fitTk)
    val lm2 = bigramCountsTk(fitTk)
    val pm4 = lm4.withColumn("p3", fgPrefix(col("fg")))
      .groupBy(col("p3")).agg(sum(col("cf")).as("cp4"))
    val pm3 = lm3.withColumn("p2", tgPrefix(col("tg")))
      .groupBy(col("p2")).agg(sum(col("ct")).as("cp3"))
    val pm2 = lm2.withColumn("w1", split(col("bg"), " ").getItem(0))
      .groupBy(col("w1")).agg(sum(col("cb")).as("cp2"))
    val v1 = vocabTokensTk(fitTk).agg(count(lit(1)).as("v"))
    fourgramsTk(scoreTk)
      .withColumn("p3", fgPrefix(col("fg")))
      // each backoff level conditions on the longest context the
      // lower-order model still has: trigram tail, then bigram tail
      .withColumn("tg", concat_ws(" ", slice(split(col("fg"), " "), 2, 3)))
      .withColumn("p2", concat_ws(" ", slice(split(col("fg"), " "), 2, 2)))
      .withColumn("bg", concat_ws(" ", slice(split(col("fg"), " "), 3, 2)))
      .withColumn("w1", split(col("fg"), " ").getItem(2))
      .join(lm4, Seq("fg"), "left")
      .join(pm4, Seq("p3"), "left")
      .join(lm3, Seq("tg"), "left")
      .join(pm3, Seq("p2"), "left")
      .join(lm2, Seq("bg"), "left")
      .join(pm2, Seq("w1"), "left")
      .crossJoin(broadcast(v1))
      .select(col("doc_id"),
        when(col("cf").isNotNull, 0L).when(col("ct").isNotNull, 1L)
          .otherwise(2L).as("od"),
        when(col("cf").isNotNull,
          greatest(lit(0L), floorLog2Ratio(
            coalesce(col("cp4"), lit(0L)) + col("v"), col("cf") + lit(1L))))
          .when(col("ct").isNotNull,
            lit(BackoffPenaltyBits) + greatest(lit(0L), floorLog2Ratio(
              coalesce(col("cp3"), lit(0L)) + col("v"), col("ct") + lit(1L))))
          .otherwise(
            lit(2L * BackoffPenaltyBits) + greatest(lit(0L), floorLog2Ratio(
              coalesce(col("cp2"), lit(0L)) + col("v"),
              coalesce(col("cb"), lit(0L)) + lit(1L))))
          .as("bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fourgrams"),
        sum(when(col("od") === 1L, 1L).otherwise(0L)).as("n_bo3"),
        sum(when(col("od") === 2L, 1L).otherwise(0L)).as("n_bo2"),
        sum(col("bits")).as("total_bits"))
      .select(col("doc_id"), col("n_fourgrams"), col("n_bo3"), col("n_bo2"),
        col("total_bits"),
        expr("(total_bits * 100) div n_fourgrams").as("centibits_per_fourgram"))
  }

  // -------------------------------------------------------------------
  // FIVEGRAM model (q202/q203; q195's pruning report re-pointed here)
  // — KenLM's default order, the round-15 verdict's item #5. The same
  // shape again with a 4-token prefix key; at order 5 the self-fit is
  // essentially all singletons, which is exactly why q203's
  // interpolation and q195's pruning report are interesting AT this
  // order (a raw add-one 5-gram model prices everything near log2 V,
  // and pruning at the mass-relative threshold removes almost the
  // whole table).

  private def fivegramsTk(toks: DataFrame): DataFrame = toks.select(
    col("doc_id"), explode(X.shingles(col("tk"), 5)).as("pg"))

  /** The persistable 5-gram LM state: (pg, cg) exact counts — linear,
    * folds additively like every lower order. */
  def fivegramCountsTk(toks: DataFrame): DataFrame =
    fivegramsTk(toks).groupBy(col("pg")).agg(count(lit(1)).as("cg"))

  /** The (w1 w2 w3 w4) prefix as a single key column. */
  private def pgPrefix(pg: Column): Column =
    concat_ws(" ", slice(split(pg, " "), 1, 4))

  /** Score a pre-tokenized frame against a persisted 5-gram LM —
    * [[scoreAgainstLm4Tk]]'s contract one order up. Documents with
    * < 5 tokens have no 5-grams and do not flow. */
  def scoreAgainstLm5Tk(lm5: DataFrame, vocab: DataFrame,
      scoreTk: DataFrame): DataFrame = {
    val prefixMass = lm5
      .withColumn("p4", pgPrefix(col("pg")))
      .groupBy(col("p4")).agg(sum(col("cg")).as("cpm"))
    val v1 = vocab.agg(count(lit(1)).as("v"))
    fivegramsTk(scoreTk)
      .withColumn("p4", pgPrefix(col("pg")))
      .join(lm5, Seq("pg"), "left")
      .join(prefixMass, Seq("p4"), "left")
      .crossJoin(broadcast(v1))
      .select(col("doc_id"),
        greatest(lit(0L),
          floorLog2Ratio(coalesce(col("cpm"), lit(0L)) + col("v"),
            coalesce(col("cg"), lit(0L)) + lit(1L))).as("bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fivegrams"), sum(col("bits")).as("total_bits"))
      .select(col("doc_id"), col("n_fivegrams"), col("total_bits"),
        expr("(total_bits * 100) div n_fivegrams")
          .as("centibits_per_fivegram"))
  }

  /** Self-scoring under the 5-gram model (q202; fit = score frame). */
  def surpriseScores5Tk(fitTk: DataFrame, scoreTk: DataFrame): DataFrame =
    scoreAgainstLm5Tk(fivegramCountsTk(fitTk), vocabTokensTk(fitTk), scoreTk)

  /** KNESER-NEY-FLAVORED INTERPOLATED scoring (q203) — the principled
    * replacement for stupid backoff's seen-switch, in exact integers.
    * Two corrections over [[backoffChainScoresTk]]:
    *
    * 1. CONTINUATION counts at the lower orders (Kneser & Ney, ICASSP
    *    1995): the level-4 price of w5 given (w2 w3 w4) uses
    *    N1+(· w2 w3 w4 w5) — how many distinct left contexts the tail
    *    continues (a TYPE count over the 5-gram table) — normalized by
    *    N1+(· w2 w3 w4 ·); level 3 likewise over the 4-gram type
    *    table. Raw lower-order counts overprice grams that are
    *    frequent only inside one fixed collocation; continuation
    *    counts are the KN fix, and they are exact integers.
    *
    * 2. INTERPOLATION instead of a backoff switch: EVERY level is
    *    priced for EVERY gram (each level k pays k−5 whole-bit
    *    level-drop penalties, the [[BackoffPenaltyBits]] discipline)
    *    and the CHEAPEST level wins — the log-domain dominant term of
    *    λ-interpolation (min over bits ≈ −log2 max_k λ_k·p_k, the
    *    max-approximation of Σ λ_k p_k; exact rational interpolation
    *    would multiply four denominators and overflow int64 at corpus
    *    scale). Unlike stupid backoff, a SEEN 5-gram can still price
    *    at a lower level when the continuation evidence is stronger
    *    than its sparse top-order count. Ties go to the higher order.
    *    The per-level routing counts are hash-checked contract.
    *
    * Scale: three model tables + three type-count tables, all
    * corpus-reduced; scoring is seven keyed doc-side joins + one
    * per-doc agg — q191's shuffle class, one order up. */
  def knInterpolatedScoresTk(fitTk: DataFrame, scoreTk: DataFrame): DataFrame = {
    val lm5 = fivegramCountsTk(fitTk)
    val pm5 = lm5.withColumn("p4", pgPrefix(col("pg")))
      .groupBy(col("p4")).agg(sum(col("cg")).as("cp5"))
    // 5-gram TYPE table → level-4 continuation counts: tail (w2..w5),
    // normalizer = types sharing the middle context (w2 w3 w4)
    val cc4 = lm5.select(concat_ws(" ", slice(split(col("pg"), " "), 2, 4))
        .as("tl4"))
      .groupBy(col("tl4")).agg(count(lit(1)).as("cc4"))
    val dn4 = lm5.select(concat_ws(" ", slice(split(col("pg"), " "), 2, 3))
        .as("md4"))
      .groupBy(col("md4")).agg(count(lit(1)).as("dn4"))
    // 4-gram TYPE table → level-3 continuation counts: tail (w3 w4 w5),
    // normalizer = 4-gram types sharing (w3 w4)
    val t4 = fourgramCountsTk(fitTk)
    val cc3 = t4.select(concat_ws(" ", slice(split(col("fg"), " "), 2, 3))
        .as("tl3"))
      .groupBy(col("tl3")).agg(count(lit(1)).as("cc3"))
    val dn3 = t4.select(concat_ws(" ", slice(split(col("fg"), " "), 2, 2))
        .as("md3"))
      .groupBy(col("md3")).agg(count(lit(1)).as("dn3"))
    val v1 = vocabTokensTk(fitTk).agg(count(lit(1)).as("v"))
    fivegramsTk(scoreTk)
      .withColumn("p4", pgPrefix(col("pg")))
      .withColumn("tl4", concat_ws(" ", slice(split(col("pg"), " "), 2, 4)))
      .withColumn("md4", concat_ws(" ", slice(split(col("pg"), " "), 2, 3)))
      .withColumn("tl3", concat_ws(" ", slice(split(col("pg"), " "), 3, 3)))
      .withColumn("md3", concat_ws(" ", slice(split(col("pg"), " "), 3, 2)))
      .join(lm5, Seq("pg"), "left")
      .join(pm5, Seq("p4"), "left")
      .join(cc4, Seq("tl4"), "left")
      .join(dn4, Seq("md4"), "left")
      .join(cc3, Seq("tl3"), "left")
      .join(dn3, Seq("md3"), "left")
      .crossJoin(broadcast(v1))
      .withColumn("b5", greatest(lit(0L), floorLog2Ratio(
        coalesce(col("cp5"), lit(0L)) + col("v"),
        coalesce(col("cg"), lit(0L)) + lit(1L))))
      .withColumn("b4", lit(BackoffPenaltyBits) + greatest(lit(0L),
        floorLog2Ratio(coalesce(col("dn4"), lit(0L)) + col("v"),
          coalesce(col("cc4"), lit(0L)) + lit(1L))))
      .withColumn("b3", lit(2L * BackoffPenaltyBits) + greatest(lit(0L),
        floorLog2Ratio(coalesce(col("dn3"), lit(0L)) + col("v"),
          coalesce(col("cc3"), lit(0L)) + lit(1L))))
      .withColumn("bits", least(col("b5"), col("b4"), col("b3")))
      .withColumn("od",
        when(col("bits") === col("b5"), 5L)
          .when(col("bits") === col("b4"), 4L).otherwise(3L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fivegrams"),
        sum(when(col("od") === 4L, 1L).otherwise(0L)).as("n_lvl4"),
        sum(when(col("od") === 3L, 1L).otherwise(0L)).as("n_lvl3"),
        sum(col("bits")).as("total_bits"))
      .select(col("doc_id"), col("n_fivegrams"), col("n_lvl4"),
        col("n_lvl3"), col("total_bits"),
        expr("(total_bits * 100) div n_fivegrams")
          .as("centibits_per_fivegram"))
  }

  /** Scaled integer division (num·scale) div den for 0 ≤ num ≤ den,
    * 1 ≤ den, scale ≤ 1e9, with a JOINT right-shift overflow guard:
    * both operands shift by t = max(0, bitlen(den) − 33), so the
    * multiplicand stays ≤ 2^33 and num·scale < 2^63 at ANY corpus
    * size. At fixture scale t = 0 — the division is exact; at 100 TB
    * the shift truncates identical low bits on both engines
    * (deterministic, cross-engine identical — DuckDB >> and Spark
    * shiftright agree), degrading resolution instead of overflowing
    * (DuckDB would error, Spark would silently wrap). */
  private def scaledDiv(num: Column, den: Column, scale: Long): Column = {
    val t = greatest(lit(0), (bitlen(den) - 33).cast("int"))
    call_function("div",
      call_function("shiftright", num, t) * scale,
      call_function("shiftright", den, t))
  }

  private def scaledDivSql(num: String, den: String, scale: Long): String = {
    val t = s"greatest(0, length(printf('%b', $den)) - 33)"
    s"(((($num) >> $t) * $scale) // (($den) >> $t))"
  }

  /** TRUE INTERPOLATED KNESER-NEY scoring (q215) — the round-16
    * verdict's item #6: where [[knInterpolatedScoresTk]] (q203) routes
    * each 5-gram to its cheapest level (the log-domain max-term
    * approximation), this computes the actual KN MIXTURE in scaled
    * integers — absolute discounting with D = 1 (an exact integer, so
    * no discount arithmetic ever leaves int64):
    *
    *   p5 = max(cg−1, 0)/cp5        + γ5·p4,  γ5 = t5c/cp5
    *   p4 = max(cc4−1, 0)/dn4       + γ4·p3,  γ4 = t4c/dn4
    *   p3 = (cc3+1)/(dn3+V)                    (add-one terminal)
    *
    * with the SAME level tables as q203 (cc4/dn4/cc3/dn3 continuation
    * type counts — the KN correction) plus the two discount-mass type
    * counts (t5c = 5-gram types per (w1..w4) prefix, t4c = distinct
    * (w2..w5) tails per (w2 w3 w4)). Every level is proper (Σ_w5 p3 =
    * 1 exactly, hence Σp4 = Σp5 = 1 in exact rationals), so the
    * scaled-integer value p5_s ≤ S always — floors only shrink terms
    * — and bits = floor(−log2(p5_s/S)) needs no negative-k guard.
    * Probabilities carry ×S = 10⁹, backoff masses ×10⁶ (the verdict's
    * "×1e6 weights"); every division goes through [[scaledDiv]]'s
    * joint-shift overflow guard. Unseen context ⇒ that level backs
    * off fully (γ = 10⁶, discounted term 0). The per-doc γ sums are
    * part of the hash-checked output — the mixture WEIGHTS are
    * contract, not just the bits. Scale: q203's exact shuffle class —
    * three corpus-reduced model tables + keyed doc-side joins. */
  def knMixtureScoresTk(fitTk: DataFrame, scoreTk: DataFrame): DataFrame =
    knMixtureScoresFromLm(fivegramCountsTk(fitTk),
      fourgramCountsTk(fitTk), vocabTokensTk(fitTk), scoreTk)

  /** [[knMixtureScoresTk]] with the 5-GRAM MODEL TABLE passed in — the
    * q216 pruning report scores the same docs under the full and the
    * pruned table through this one code path (L3's continuation tables
    * come from the 4-gram table and are untouched by top-order
    * pruning; L4/L5's derive from the given lm5, so pruning flows
    * through the discount masses exactly as shipping a pruned
    * artifact would). */
  def knMixtureScoresFromLm(lm5in: DataFrame, t4: DataFrame,
      vocab: DataFrame, scoreTk: DataFrame): DataFrame = {
    val S = 1000000000L
    val E6 = 1000000L
    val lm5 = lm5in
    val pm5 = lm5.withColumn("p4", pgPrefix(col("pg")))
      .groupBy(col("p4"))
      .agg(sum(col("cg")).as("cp5"), count(lit(1)).as("t5c"))
    val dn4t = lm5.select(
        concat_ws(" ", slice(split(col("pg"), " "), 2, 3)).as("md4"),
        concat_ws(" ", slice(split(col("pg"), " "), 2, 4)).as("tl4"))
      .groupBy(col("md4"))
      .agg(count(lit(1)).as("dn4"), countDistinct(col("tl4")).as("t4c"))
    val cc4 = lm5.select(concat_ws(" ", slice(split(col("pg"), " "), 2, 4))
        .as("tl4"))
      .groupBy(col("tl4")).agg(count(lit(1)).as("cc4"))
    val cc3 = t4.select(concat_ws(" ", slice(split(col("fg"), " "), 2, 3))
        .as("tl3"))
      .groupBy(col("tl3")).agg(count(lit(1)).as("cc3"))
    val dn3 = t4.select(concat_ws(" ", slice(split(col("fg"), " "), 2, 2))
        .as("md3"))
      .groupBy(col("md3")).agg(count(lit(1)).as("dn3"))
    val v1 = vocab.agg(count(lit(1)).as("v"))
    val czl = (c: String) => coalesce(col(c), lit(0L))
    fivegramsTk(scoreTk)
      .withColumn("p4", pgPrefix(col("pg")))
      .withColumn("tl4", concat_ws(" ", slice(split(col("pg"), " "), 2, 4)))
      .withColumn("md4", concat_ws(" ", slice(split(col("pg"), " "), 2, 3)))
      .withColumn("tl3", concat_ws(" ", slice(split(col("pg"), " "), 3, 3)))
      .withColumn("md3", concat_ws(" ", slice(split(col("pg"), " "), 3, 2)))
      .join(lm5, Seq("pg"), "left")
      .join(pm5, Seq("p4"), "left")
      .join(cc4, Seq("tl4"), "left")
      .join(dn4t, Seq("md4"), "left")
      .join(cc3, Seq("tl3"), "left")
      .join(dn3, Seq("md3"), "left")
      .crossJoin(broadcast(v1))
      .withColumn("p3s",
        scaledDiv(czl("cc3") + 1L, czl("dn3") + col("v"), S))
      .withColumn("pd4", when(czl("dn4") === 0L, 0L).otherwise(
        scaledDiv(greatest(czl("cc4") - 1L, lit(0L)), col("dn4"), S)))
      .withColumn("g4", when(czl("dn4") === 0L, E6).otherwise(
        scaledDiv(czl("t4c"), col("dn4"), E6)))
      .withColumn("pd5", when(czl("cp5") === 0L, 0L).otherwise(
        scaledDiv(greatest(czl("cg") - 1L, lit(0L)), col("cp5"), S)))
      .withColumn("g5", when(czl("cp5") === 0L, E6).otherwise(
        scaledDiv(czl("t5c"), col("cp5"), E6)))
      .withColumn("p5s", col("pd5") + call_function("div",
        col("g5") * (col("pd4") + call_function("div",
          col("g4") * col("p3s"), lit(E6))), lit(E6)))
      .withColumn("bits", greatest(lit(0L),
        floorLog2Ratio(lit(S), greatest(lit(1L), col("p5s")))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fivegrams"),
        sum(col("g5")).as("sum_g5_e6"),
        sum(col("g4")).as("sum_g4_e6"),
        sum(col("bits")).as("total_bits"))
      .select(col("doc_id"), col("n_fivegrams"), col("sum_g5_e6"),
        col("sum_g4_e6"), col("total_bits"),
        expr("(total_bits * 100) div n_fivegrams")
          .as("centibits_per_fivegram"))
  }

  /** The KN-mixture oracle chain (pm5 → cc4 → dn4 → knraw → knlvl →
    * knmix → knbits), every CTE suffixed by `tag` and the 5-gram model
    * table pluggable — ONE text behind q215 (tag "", the full model)
    * and q216's full/pruned twin chains, so the pruning report scores
    * under EXACTLY the mixture q215 defines. Composes after shared
    * tk/pgall/lmf4/cc3/dn3/vc CTEs (L3 is untouched by top-order
    * pruning, so its tables stay shared and bare-named). */
  private def knMixChainSql(tag: String, lmCte: String): String = s"""
        pm5$tag AS (SELECT ${partsSql("pg", 1, 4)} AS p4,
                       CAST(SUM(cg) AS BIGINT) AS cp5,
                       COUNT(*) AS t5c
                FROM $lmCte GROUP BY 1),
        cc4$tag AS (SELECT ${partsSql("pg", 2, 4)} AS tl4, COUNT(*) AS cc4
                FROM $lmCte GROUP BY 1),
        dn4$tag AS (SELECT md4, COUNT(*) AS dn4, COUNT(DISTINCT tl4) AS t4c
                FROM (SELECT ${partsSql("pg", 2, 3)} AS md4,
                             ${partsSql("pg", 2, 4)} AS tl4 FROM $lmCte)
                GROUP BY 1),
        knraw$tag AS (SELECT g.doc_id,
                         coalesce(l.cg, 0) AS cg,
                         coalesce(p5.cp5, 0) AS cp5,
                         coalesce(p5.t5c, 0) AS t5c,
                         coalesce(c4.cc4, 0) AS cc4,
                         coalesce(d4.dn4, 0) AS dn4v,
                         coalesce(d4.t4c, 0) AS t4c,
                         coalesce(c3.cc3, 0) AS cc3,
                         coalesce(d3.dn3, 0) AS dn3v,
                         vc.v AS v
                  FROM pgall g
                  LEFT JOIN $lmCte l USING (pg)
                  LEFT JOIN pm5$tag p5 ON p5.p4 = ${partsSql("g.pg", 1, 4)}
                  LEFT JOIN cc4$tag c4 ON c4.tl4 = ${partsSql("g.pg", 2, 4)}
                  LEFT JOIN dn4$tag d4 ON d4.md4 = ${partsSql("g.pg", 2, 3)}
                  LEFT JOIN cc3 c3 ON c3.tl3 = ${partsSql("g.pg", 3, 3)}
                  LEFT JOIN dn3 d3 ON d3.md3 = ${partsSql("g.pg", 3, 2)}
                  CROSS JOIN vc),
        knlvl$tag AS (SELECT doc_id,
                         ${scaledDivSql("cc3 + 1", "dn3v + v", 1000000000L)} AS p3s,
                         CASE WHEN dn4v = 0 THEN CAST(0 AS BIGINT)
                              ELSE ${scaledDivSql("greatest(cc4 - 1, 0)", "dn4v", 1000000000L)} END AS pd4,
                         CASE WHEN dn4v = 0 THEN CAST(1000000 AS BIGINT)
                              ELSE ${scaledDivSql("t4c", "dn4v", 1000000L)} END AS g4,
                         CASE WHEN cp5 = 0 THEN CAST(0 AS BIGINT)
                              ELSE ${scaledDivSql("greatest(cg - 1, 0)", "cp5", 1000000000L)} END AS pd5,
                         CASE WHEN cp5 = 0 THEN CAST(1000000 AS BIGINT)
                              ELSE ${scaledDivSql("t5c", "cp5", 1000000L)} END AS g5
                  FROM knraw$tag),
        knmix$tag AS (SELECT doc_id, g5, g4,
                         pd5 + g5 * (pd4 + g4 * p3s // 1000000) // 1000000
                           AS p5s
                  FROM knlvl$tag),
        knbits$tag AS (SELECT doc_id, g5, g4,
                          greatest(0, CASE WHEN (den << k) > 1000000000
                                           THEN k - 1 ELSE k END) AS bits
                   FROM (SELECT doc_id, g5, g4, greatest(1, p5s) AS den,
                                30 - length(printf('%b', greatest(1, p5s)))
                                  AS k
                         FROM knmix$tag))"""

  /** `split_part` concatenation of tokens `from..from+n-1` of a
    * space-joined gram column — the oracle-side slice(split(·)) (def,
    * not val: referenced from `defs`, the init-order rule). */
  private def partsSql(c: String, from: Int, n: Int): String =
    (from until from + n).map(i => s"split_part($c, ' ', $i)")
      .mkString(" || ' ' || ")

  /** The English-fit trigram + bigram model CTEs (lmt/pm3/lmb/pm2/vc)
    * shared VERBATIM by the q161 and q191 oracles — the chained
    * backoff prices its lower orders against the IDENTICAL model text
    * the single-level backoff uses, so the two contracts cannot drift.
    * Expects a `tk (doc_id, lang, tk)` CTE earlier in the WITH. */
  private val enFitModelCtesSql = s"""lmt AS (SELECT tg, COUNT(*) AS ct
                FROM (SELECT unnest(${X.shinglesSql("tk", 3)}) AS tg
                      FROM tk WHERE lang = 'en')
                GROUP BY tg),
        pm3 AS (SELECT split_part(tg, ' ', 1) || ' ' || split_part(tg, ' ', 2) AS p2,
                       CAST(SUM(ct) AS BIGINT) AS cp3
                FROM lmt GROUP BY 1),
        lmb AS (SELECT bg, COUNT(*) AS cb
                FROM (SELECT unnest(${X.shinglesSql("tk", 2)}) AS bg
                      FROM tk WHERE lang = 'en')
                GROUP BY bg),
        pm2 AS (SELECT split_part(bg, ' ', 1) AS w1,
                       CAST(SUM(cb) AS BIGINT) AS cp2
                FROM lmb GROUP BY 1),
        vc AS (SELECT COUNT(DISTINCT t) AS v
               FROM (SELECT unnest(tk) AS t FROM tk WHERE lang = 'en'))"""

  /** The q121 self-scoring CTE chain (through `bits`) over an upstream
    * CTE named `tk` (doc_id, tk: item array) — ONE text shared by q121
    * (word tokens), q138 (BPE subwords), and q139 (scores feeding the
    * pacing tiers): the LM arithmetic is item-agnostic, only the
    * tokenization unit upstream changes. */
  private[ext] def selfScoreBodyCtesSql: String = selfScoreBodyCtesSqlTagged("")

  /** [[selfScoreBodyCtesSql]] with every CTE name suffixed by `tag`
    * (over an upstream `tk$tag`) — lets one query carry SEVERAL
    * self-scored universes (q147's phase-A vs full-corpus chains; the
    * q127 two-LM discipline). Tag "" reproduces the shared text
    * exactly. */
  private[ext] def selfScoreBodyCtesSqlTagged(tag: String): String = s"""
        bg$tag AS (SELECT doc_id, unnest(${X.shinglesSql("tk", 2)}) AS bg FROM tk$tag),
        lmb$tag AS (SELECT bg, COUNT(*) AS cb FROM bg$tag GROUP BY bg),
        lmp$tag AS (SELECT split_part(bg, ' ', 1) AS w1,
                       CAST(SUM(cb) AS BIGINT) AS cp
                FROM lmb$tag GROUP BY 1),
        vc$tag AS (SELECT COUNT(DISTINCT t) AS v
               FROM (SELECT unnest(tk) AS t FROM tk$tag)),
        sc$tag AS (SELECT b.doc_id, l.cb + 1 AS den, p.cp + vc.v AS num
               FROM bg$tag b
               JOIN lmb$tag l USING (bg)
               JOIN lmp$tag p ON p.w1 = split_part(b.bg, ' ', 1)
               CROSS JOIN vc$tag vc),
        bits$tag AS (SELECT doc_id,
                        greatest(0, CASE WHEN (den << k) > num THEN k - 1 ELSE k END) AS bits
                 FROM (SELECT doc_id, den, num,
                              length(printf('%b', num))
                                - length(printf('%b', den)) AS k
                       FROM sc$tag))"""

  /** [[selfScoreBodyCtesSql]] + the per-doc score projection — the
    * complete q121/q138 oracle after their `tk` CTE. */
  private[ext] def selfScoreOracleTailSql: String = s"""
        $selfScoreBodyCtesSql
        SELECT doc_id, COUNT(*) AS n_bigrams,
               CAST(SUM(bits) AS BIGINT) AS total_bits,
               CAST(SUM(bits) * 100 // COUNT(*) AS BIGINT)
                 AS centibits_per_bigram
        FROM bits GROUP BY doc_id ORDER BY doc_id"""

  override val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q121: the self-scored corpus — fit the bigram LM on documents and
    // score every document against it, all exact int64. The full score
    // table is hash-checked (every doc, every column), not an estimate
    // contract: the floor-log2 identity makes "perplexity" a
    // deterministic integer.
    QueryDef(
      "q121_lm_surprise_score",
      (s, dir) => {
        val docs = T.documents(s, dir)
        surpriseScores(docs, docs).orderBy(col("doc_id"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        $selfScoreOracleTailSql""")),

    // ------------------------------------------------------------------
    // q139: QUALITY PACING — the mixture move the perplexity filter
    // feeds (CCNet's head/middle/tail buckets, Wenzek et al. LREC
    // 2020): tier every scored document by which QUARTILE of the
    // corpus centibits distribution it falls in, then sample each tier
    // at its own deterministic rate — tier 1 (lowest surprise =
    // boilerplate) keeps 25%, the mid tiers keep all, tier 4 (highest
    // surprise = noise) keeps 10%. Quartile thresholds are computed
    // SCALE-CORRECTLY: centibits are bounded small integers, so the
    // exact order statistics come from a per-VALUE histogram +
    // cumulative window over the few-hundred-row value domain (never a
    // global sort of the corpus; the HistSketch discipline) —
    // thr_t = min value with cum_count ≥ ⌈t·n/4⌉, ties share tiers by
    // construction. Sampling is md5-residue (the q49 discipline), so
    // the kept SET is reproducible anywhere. Docs with < 2 tokens have
    // no score and sit outside the pacing universe (q121's contract).
    QueryDef(
      "q139_quality_pacing",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = T.documents(s, dir)
        val scope = new graft.CacheScope
        graft.CacheScope.releaseAfterNextAction(s, scope)
        val scored = scope.cache(surpriseScores(docs, docs)
          .select(col("doc_id"), col("centibits_per_bigram").as("cb")))
        val n1 = scored.agg(count(lit(1)).as("n"))
        // value-domain cumulative histogram: the window is over distinct
        // centibit VALUES (domain-bounded, ≤ a few hundred rows), not
        // the corpus — the single-partition sort is intentional and tiny
        val cum = scored.groupBy(col("cb")).agg(count(lit(1)).as("c"))
          .withColumn("cc", sum(col("c")).over(
            Window.orderBy(col("cb"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val thr = cum.crossJoin(broadcast(n1)).agg(
          min(when(col("cc") >= expr("(1*n+3) div 4"), col("cb"))).as("t1"),
          min(when(col("cc") >= expr("(2*n+3) div 4"), col("cb"))).as("t2"),
          min(when(col("cc") >= expr("(3*n+3) div 4"), col("cb"))).as("t3"))
        scored.crossJoin(broadcast(thr))
          .withColumn("tier",
            when(col("cb") <= col("t1"), 1L)
              .when(col("cb") <= col("t2"), 2L)
              .when(col("cb") <= col("t3"), 3L).otherwise(4L))
          .withColumn("rate_e4", expr(
            "CASE tier WHEN 1 THEN 2500 WHEN 2 THEN 10000 " +
              "WHEN 3 THEN 10000 ELSE 1000 END"))
          .withColumn("kept",
            X.hp(concat(lit("pace "), col("doc_id").cast("string")))
              % 10000 < col("rate_e4"))
          .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            coalesce(sum(when(col("kept"), col("n_chars"))), lit(0L))
              .as("kept_chars"))
          .orderBy(col("tier"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        $selfScoreBodyCtesSql,
        scores AS (SELECT doc_id,
                          CAST(SUM(bits) * 100 // COUNT(*) AS BIGINT) AS cb
                   FROM bits GROUP BY doc_id),
        nn AS (SELECT COUNT(*) AS n FROM scores),
        hist AS (SELECT cb, COUNT(*) AS c FROM scores GROUP BY cb),
        cum AS (SELECT cb, SUM(c) OVER (ORDER BY cb) AS cc FROM hist),
        thr AS (SELECT MIN(CASE WHEN cc >= (1*n+3)//4 THEN cb END) AS t1,
                       MIN(CASE WHEN cc >= (2*n+3)//4 THEN cb END) AS t2,
                       MIN(CASE WHEN cc >= (3*n+3)//4 THEN cb END) AS t3
                FROM cum, nn),
        tiered AS (SELECT s.doc_id,
                          CASE WHEN s.cb <= t.t1 THEN 1
                               WHEN s.cb <= t.t2 THEN 2
                               WHEN s.cb <= t.t3 THEN 3 ELSE 4 END AS tier
                   FROM scores s, thr t),
        kept AS (SELECT doc_id, CAST(tier AS BIGINT) AS tier,
                        ${X.hpSql("'pace ' || CAST(doc_id AS VARCHAR)")}
                          % 10000 <
                          CASE tier WHEN 1 THEN 2500 WHEN 2 THEN 10000
                               WHEN 3 THEN 10000 ELSE 1000 END AS kept
                 FROM tiered)
        SELECT k.tier, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               CAST(coalesce(SUM(CASE WHEN kept THEN d.n_chars END), 0)
                 AS BIGINT) AS kept_chars
        FROM kept k JOIN documents d USING (doc_id)
        GROUP BY k.tier ORDER BY k.tier""")),

    // ------------------------------------------------------------------
    // q127: DATA SELECTION VIA IMPORTANCE RESAMPLING — DSIR (Xie,
    // Santurkar, Ma & Liang, "Data Selection for Language Models via
    // Importance Resampling", NeurIPS 2023) with the floating-point
    // importance weight replaced by the integer-bits machinery: the
    // log2 importance ratio log2(p_tgt(x)/p_src(x)) IS
    // bits_src(x) − bits_tgt(x) in this engine's floor-quantized
    // Shannon bits, so per-bigram "deficit centibits" (how much more
    // surprising the doc is to the TARGET LM than to the source LM,
    // length-normalized) needs no logs, no floats, no normalization
    // constant. Acceptance is deterministic md5-residue thresholding
    // (the q37 sampling discipline): accept iff
    // h(doc) % 10⁴ < 10⁴ / 2^clamp(deficit_log2, 0, 13) — docs the
    // target LM likes keep probability 1, docs it dislikes are
    // exponentially down-weighted, capped like DSIR's clipped weights.
    // Target here = the English slice, source = the full corpus; both
    // LMs fit and both scorings run in one declarative plan. On the
    // fixture the deficits land at 0-60 centibits — below the 1-bit
    // floor, so every doc accepts: the fixture's language labels share
    // one synthetic text distribution (q126's near-uniform lang
    // entropy corroborates), and the oracle still hash-checks the full
    // deficit/threshold arithmetic on all 500/5000 rows. Real
    // selection (deficit ≥ 1 bit → exponential down-sampling) is
    // exercised by LmScoreSpec's disjoint-vocabulary corpora.
    QueryDef(
      "q127_dsir_sampling",
      (s, dir) => {
        val docs = T.documents(s, dir)
        dsirSampling(docs, docs.filter(col("lang") === "en"))
          .orderBy(col("doc_id"))
      },
      Some {
        // one parameterized LM-scoring CTE block per corpus: fit on
        // `fitWhere`, score EVERY document — shared text, two
        // instantiations, exactly like the engine side's two
        // surpriseScores calls
        def lmCtes(tag: String, fitWhere: String): String = s"""
        bg_$tag AS (SELECT doc_id, unnest(${X.shinglesSql("tk", 2)}) AS bg
                    FROM tk $fitWhere),
        lmb_$tag AS (SELECT bg, COUNT(*) AS cb FROM bg_$tag GROUP BY bg),
        lmp_$tag AS (SELECT split_part(bg, ' ', 1) AS w1,
                            CAST(SUM(cb) AS BIGINT) AS cp
                     FROM lmb_$tag GROUP BY 1),
        vc_$tag AS (SELECT COUNT(DISTINCT t) AS v
                    FROM (SELECT unnest(tk) AS t FROM tk $fitWhere)),
        sc_$tag AS (SELECT b.doc_id,
                           coalesce(l.cb, 0) + 1 AS den,
                           coalesce(p.cp, 0) + vc.v AS num
                    FROM bgall b
                    LEFT JOIN lmb_$tag l USING (bg)
                    LEFT JOIN lmp_$tag p
                      ON p.w1 = split_part(b.bg, ' ', 1)
                    CROSS JOIN vc_$tag vc),
        bits_$tag AS (SELECT doc_id, COUNT(*) AS nb,
                             CAST(SUM(greatest(0, CASE WHEN (den << k) > num
                                           THEN k - 1 ELSE k END)) AS BIGINT) AS bits
                      FROM (SELECT doc_id, den, num,
                                   length(printf('%b', num))
                                     - length(printf('%b', den)) AS k
                            FROM sc_$tag)
                      GROUP BY doc_id)"""
        s"""
        WITH tk AS (SELECT doc_id, lang, ${X.tokensSql("text")} AS tk
                    FROM documents),
        bgall AS (SELECT doc_id, unnest(${X.shinglesSql("tk", 2)}) AS bg
                  FROM tk),
        ${lmCtes("s", "")},
        ${lmCtes("t", "WHERE lang = 'en'")}
        SELECT doc_id, n_bigrams, bits_src, bits_tgt, deficit_centibits,
               deficit_log2, thr_e4,
               ${X.h60Sql("'dsir ' || CAST(doc_id AS VARCHAR)")} % 10000
                 < thr_e4 AS accepted
        FROM (SELECT doc_id, n_bigrams, bits_src, bits_tgt,
                     deficit_centibits,
                     least(13, deficit_centibits // 100) AS deficit_log2,
                     CAST(10000 // (CAST(1 AS BIGINT) <<
                       least(13, deficit_centibits // 100)) AS BIGINT) AS thr_e4
              FROM (SELECT s.doc_id, s.nb AS n_bigrams,
                           s.bits AS bits_src, t.bits AS bits_tgt,
                           greatest(0, t.bits - s.bits) * 100 // s.nb
                             AS deficit_centibits
                    FROM bits_s s JOIN bits_t t USING (doc_id)))
        ORDER BY doc_id"""
      }),

    // ------------------------------------------------------------------
    // q122: the LM THROUGH THE CATALOG — fourth member of the
    // catalog-serving family (q118 histogram, q119 HLL, q120 CMS):
    // epoch A's bigram-count table and vocabulary commit as v1, epoch
    // B folds in (counts additively — the LM is a linear sketch;
    // vocabulary by union-distinct) as v2, and a probe batch (every
    // 5th document, spanning both epochs) scores against EACH version.
    // Version isolation is the point: v1 scores the probes under "the
    // LM as of epoch A" forever — unseen-in-A bigrams cost the full
    // add-one surprise — while v2 is bit-identical to a from-scratch
    // fit on the union corpus. Scoring never touches the fit corpus,
    // only the ≤|bigram-vocab|-row LM state.
    QueryDef(
      "q122_lm_catalog_serving",
      (s, dir) => {
        val work = graft.Scratch.dir("q122")
        val cat = new graft.catalog.VersionedCatalog(s, work, format = "parquet")
        val bgSchema = org.apache.spark.sql.types.StructType.fromDDL(
          "bg STRING, cb BIGINT")
        val vSchema = org.apache.spark.sql.types.StructType.fromDDL("t STRING")
        val docs = T.documents(s, dir)
        // ONE corpus tokenize (r19; was six: two counts + two vocabs at
        // construct, plus the probe tokenized once per served version):
        // tokenization is per-doc map-side, so doc_id slices commute —
        // cache it, feed every stage through the *Tk seams. Values
        // identical (bigramCounts ≡ bigramCountsTk ∘ tokenized).
        val scope = new graft.CacheScope
        val tk = scope.cache(docs.select(col("doc_id"),
          X.tokens(col("text")).as("tk")))
        val evenTk = tk.filter(col("doc_id") % 2 === 0)
        val oddTk = tk.filter(col("doc_id") % 2 === 1)
        // rebalance before write (guide §6): file count follows data
        // size instead of the shuffle-partition count (the q140 lesson
        // — near-empty files dominated write + every served read)
        cat.writeNext("lm_bg", bigramCountsTk(evenTk).hint("rebalance"))
        cat.writeNext("lm_vocab", vocabTokensTk(evenTk).hint("rebalance"))
        cat.writeNext("lm_bg", mergeBigramCounts(
          cat.read("lm_bg", 1, Some(bgSchema)), bigramCountsTk(oddTk))
          .hint("rebalance"))
        cat.writeNext("lm_vocab",
          cat.read("lm_vocab", 1, Some(vSchema))
            .unionByName(vocabTokensTk(oddTk)).distinct().hint("rebalance"))
        val probeTk = scope.cache(tk.filter(col("doc_id") % 5 === 0))
        // registered AFTER the construct-time writes (the q140 lesson)
        graft.CacheScope.releaseAfterNextAction(s, scope)
        (1 to 2).map { v =>
          scoreAgainstLmTk(cat.read("lm_bg", v, Some(bgSchema)),
              cat.read("lm_vocab", v, Some(vSchema)), probeTk)
            .select(lit(v.toLong).as("version"), col("doc_id"),
              col("n_bigrams"), col("total_bits"),
              col("centibits_per_bigram"))
        }.reduce(_ unionByName _).orderBy(col("version"), col("doc_id"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        bg AS (SELECT doc_id, doc_id % 2 = 0 AS even,
                      unnest(${X.shinglesSql("tk", 2)}) AS bg
               FROM tk),
        -- v1 = epoch A (even doc_ids) alone; v2 = additive fold of both,
        -- which IS the union-corpus LM (count linearity)
        lmb AS (SELECT bg,
                       CAST(coalesce(SUM(CASE WHEN even THEN 1 END), 0)
                         AS BIGINT) AS cb_a,
                       CAST(COUNT(*) AS BIGINT) AS cb_f
                FROM bg GROUP BY bg),
        lmp AS (SELECT split_part(bg, ' ', 1) AS w1,
                       CAST(SUM(cb_a) AS BIGINT) AS cp_a,
                       CAST(SUM(cb_f) AS BIGINT) AS cp_f
                FROM lmb GROUP BY 1),
        va AS (SELECT COUNT(DISTINCT t) AS v_a
               FROM (SELECT unnest(tk) AS t FROM tk WHERE doc_id % 2 = 0)),
        vf AS (SELECT COUNT(DISTINCT t) AS v_f
               FROM (SELECT unnest(tk) AS t FROM tk)),
        sc AS (SELECT b.doc_id, l.cb_a, l.cb_f, p.cp_a, p.cp_f, va.v_a, vf.v_f
               FROM bg b
               JOIN lmb l USING (bg)
               JOIN lmp p ON p.w1 = split_part(b.bg, ' ', 1)
               CROSS JOIN va CROSS JOIN vf
               WHERE b.doc_id % 5 = 0),
        sv AS (SELECT 1 AS version, doc_id, cp_a + v_a AS num, cb_a + 1 AS den
               FROM sc
               UNION ALL
               SELECT 2, doc_id, cp_f + v_f, cb_f + 1 FROM sc),
        bits AS (SELECT version, doc_id,
                        greatest(0, CASE WHEN (den << k) > num THEN k - 1 ELSE k END) AS bits
                 FROM (SELECT version, doc_id, den, num,
                              length(printf('%b', num))
                                - length(printf('%b', den)) AS k
                       FROM sv))
        SELECT CAST(version AS BIGINT) AS version, doc_id,
               COUNT(*) AS n_bigrams,
               CAST(SUM(bits) AS BIGINT) AS total_bits,
               CAST(SUM(bits) * 100 // COUNT(*) AS BIGINT)
                 AS centibits_per_bigram
        FROM bits GROUP BY version, doc_id ORDER BY version, doc_id""")),

    // ------------------------------------------------------------------
    // q157: TRIGRAM surprise scoring — q121 one model order up (see the
    // trigram section comment): fit the add-one trigram LM on documents
    // and score every document against it, all exact int64; the
    // (w1,w2)-prefix mass join replaces the w1 join, everything else is
    // the same floor-log2 integer machinery, hash-checked on the full
    // score table. 100 TB: identical shape to q121 — the LM is a
    // corpus-reduced count table (trigram vocabulary is larger than
    // bigram but still the DISTINCT-shingle reduction of the corpus,
    // catalog-persistable), scoring is one doc-side join pair + per-doc
    // agg, V a 1-row broadcast.
    QueryDef(
      "q157_lm_trigram_score",
      (s, dir) => {
        val toks = tokenized(T.documents(s, dir))
        surpriseScores3Tk(toks, toks).orderBy(col("doc_id"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        tg AS (SELECT doc_id, unnest(${X.shinglesSql("tk", 3)}) AS tg FROM tk),
        lmt AS (SELECT tg, COUNT(*) AS ct FROM tg GROUP BY tg),
        lmp AS (SELECT split_part(tg, ' ', 1) || ' ' || split_part(tg, ' ', 2) AS p2,
                       CAST(SUM(ct) AS BIGINT) AS cp
                FROM lmt GROUP BY 1),
        vc AS (SELECT COUNT(DISTINCT t) AS v
               FROM (SELECT unnest(tk) AS t FROM tk)),
        sc AS (SELECT g.doc_id, l.ct + 1 AS den, p.cp + vc.v AS num
               FROM tg g
               JOIN lmt l USING (tg)
               JOIN lmp p ON p.p2 = split_part(g.tg, ' ', 1) || ' ' ||
                             split_part(g.tg, ' ', 2)
               CROSS JOIN vc),
        bits AS (SELECT doc_id,
                        greatest(0, CASE WHEN (den << k) > num THEN k - 1 ELSE k END) AS bits
                 FROM (SELECT doc_id, den, num,
                              length(printf('%b', num))
                                - length(printf('%b', den)) AS k
                       FROM sc))
        SELECT doc_id, COUNT(*) AS n_trigrams,
               CAST(SUM(bits) AS BIGINT) AS total_bits,
               CAST(SUM(bits) * 100 // COUNT(*) AS BIGINT)
                 AS centibits_per_trigram
        FROM bits GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q158: the TRIGRAM LM through the catalog — q122's fold law one
    // order up: epoch A (even doc_ids) commits trigram counts +
    // vocabulary as v1, epoch B folds in additively as v2 (trigram
    // counts are linear; v2 ≡ a from-scratch union-corpus fit), and a
    // probe batch scores under EACH version. Version isolation does
    // real work here: a trigram unseen in epoch A prices at v1 with
    // zero count AND possibly zero (w1,w2)-prefix mass — the
    // unseen-prefix contract the two-join shape exists for.
    QueryDef(
      "q158_lm3_catalog_serving",
      (s, dir) => {
        val work = graft.Scratch.dir("q158")
        val cat = new graft.catalog.VersionedCatalog(s, work, format = "parquet")
        val tgSchema = org.apache.spark.sql.types.StructType.fromDDL(
          "tg STRING, ct BIGINT")
        val vSchema = org.apache.spark.sql.types.StructType.fromDDL("t STRING")
        val docs = T.documents(s, dir)
        // ONE corpus tokenize (r19; was six — q122's caching, one
        // order up): slices of the cached token table feed both epoch
        // writes and the per-version probe scoring.
        val scope = new graft.CacheScope
        val tk = scope.cache(tokenized(docs))
        val even = tk.filter(col("doc_id") % 2 === 0)
        val odd = tk.filter(col("doc_id") % 2 === 1)
        // rebalance before write (guide §6 — the q122 move)
        cat.writeNext("lm3_tg", trigramCountsTk(even).hint("rebalance"))
        cat.writeNext("lm3_vocab", vocabTokensTk(even).hint("rebalance"))
        cat.writeNext("lm3_tg", mergeTrigramCounts(
          cat.read("lm3_tg", 1, Some(tgSchema)), trigramCountsTk(odd))
          .hint("rebalance"))
        cat.writeNext("lm3_vocab",
          cat.read("lm3_vocab", 1, Some(vSchema))
            .unionByName(vocabTokensTk(odd)).distinct().hint("rebalance"))
        val probe = scope.cache(tk.filter(col("doc_id") % 5 === 0))
        // registered AFTER the construct-time writes (the q140 lesson)
        graft.CacheScope.releaseAfterNextAction(s, scope)
        (1 to 2).map { v =>
          scoreAgainstLm3Tk(cat.read("lm3_tg", v, Some(tgSchema)),
              cat.read("lm3_vocab", v, Some(vSchema)), probe)
            .select(lit(v.toLong).as("version"), col("doc_id"),
              col("n_trigrams"), col("total_bits"),
              col("centibits_per_trigram"))
        }.reduce(_ unionByName _).orderBy(col("version"), col("doc_id"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        tg AS (SELECT doc_id, doc_id % 2 = 0 AS even,
                      unnest(${X.shinglesSql("tk", 3)}) AS tg
               FROM tk),
        lmt AS (SELECT tg,
                       CAST(coalesce(SUM(CASE WHEN even THEN 1 END), 0)
                         AS BIGINT) AS ct_a,
                       CAST(COUNT(*) AS BIGINT) AS ct_f
                FROM tg GROUP BY tg),
        lmp AS (SELECT split_part(tg, ' ', 1) || ' ' || split_part(tg, ' ', 2) AS p2,
                       CAST(SUM(ct_a) AS BIGINT) AS cp_a,
                       CAST(SUM(ct_f) AS BIGINT) AS cp_f
                FROM lmt GROUP BY 1),
        va AS (SELECT COUNT(DISTINCT t) AS v_a
               FROM (SELECT unnest(tk) AS t FROM tk WHERE doc_id % 2 = 0)),
        vf AS (SELECT COUNT(DISTINCT t) AS v_f
               FROM (SELECT unnest(tk) AS t FROM tk)),
        sc AS (SELECT g.doc_id, l.ct_a, l.ct_f, p.cp_a, p.cp_f, va.v_a, vf.v_f
               FROM tg g
               JOIN lmt l USING (tg)
               JOIN lmp p ON p.p2 = split_part(g.tg, ' ', 1) || ' ' ||
                             split_part(g.tg, ' ', 2)
               CROSS JOIN va CROSS JOIN vf
               WHERE g.doc_id % 5 = 0),
        sv AS (SELECT 1 AS version, doc_id, cp_a + v_a AS num, ct_a + 1 AS den
               FROM sc
               UNION ALL
               SELECT 2, doc_id, cp_f + v_f, ct_f + 1 FROM sc),
        bits AS (SELECT version, doc_id,
                        greatest(0, CASE WHEN (den << k) > num THEN k - 1 ELSE k END) AS bits
                 FROM (SELECT version, doc_id, den, num,
                              length(printf('%b', num))
                                - length(printf('%b', den)) AS k
                       FROM sv))
        SELECT CAST(version AS BIGINT) AS version, doc_id,
               COUNT(*) AS n_trigrams,
               CAST(SUM(bits) AS BIGINT) AS total_bits,
               CAST(SUM(bits) * 100 // COUNT(*) AS BIGINT)
                 AS centibits_per_trigram
        FROM bits GROUP BY version, doc_id ORDER BY version, doc_id""")),

    // ------------------------------------------------------------------
    // q161: BACKOFF LM SCORING — stupid backoff (Brants et al., EMNLP
    // 2007) in exact integer bits: trigrams the reference LM has SEEN
    // price under the trigram model; unseen trigrams back off to the
    // bigram tail (w2 w3) plus a 1-bit penalty (≈ α = 0.5). Fit on the
    // English reference slice, score EVERY document (the q127/q153
    // cross-LM discipline) — self-scoring never fires backoff, cross-
    // corpus scoring is where higher orders need it: pure add-one
    // prices every unseen continuation near log2(V) regardless of its
    // bigram tail's plausibility; backoff discriminates. n_backoff per
    // doc is hash-checked along with the bits — the branch decision
    // itself is part of the contract. 100 TB: the model is two linear
    // count tables + V (catalog-persistable, foldable); scoring is
    // four doc-side equi-joins + per-doc agg, no new shuffle class
    // over q157.
    QueryDef(
      "q161_lm_backoff_score",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val fitTk = tokenized(docs.filter(col("lang") === "en"))
        backoffScoresTk(fitTk, tokenized(docs)).orderBy(col("doc_id"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, lang, ${X.tokensSql("text")} AS tk
                    FROM documents),
        tgall AS (SELECT doc_id, unnest(${X.shinglesSql("tk", 3)}) AS tg
                  FROM tk),
        $enFitModelCtesSql,
        sc AS (SELECT g.doc_id, l.ct IS NOT NULL AS seen,
                      CASE WHEN l.ct IS NOT NULL THEN 0
                           ELSE $BackoffPenaltyBits END AS pen,
                      CASE WHEN l.ct IS NOT NULL
                           THEN coalesce(p3.cp3, 0) + vc.v
                           ELSE coalesce(p2.cp2, 0) + vc.v END AS num,
                      CASE WHEN l.ct IS NOT NULL THEN l.ct + 1
                           ELSE coalesce(b.cb, 0) + 1 END AS den
               FROM tgall g
               LEFT JOIN lmt l USING (tg)
               LEFT JOIN pm3 p3
                 ON p3.p2 = split_part(g.tg, ' ', 1) || ' ' ||
                            split_part(g.tg, ' ', 2)
               LEFT JOIN lmb b
                 ON b.bg = split_part(g.tg, ' ', 2) || ' ' ||
                           split_part(g.tg, ' ', 3)
               LEFT JOIN pm2 p2 ON p2.w1 = split_part(g.tg, ' ', 2)
               CROSS JOIN vc),
        bits AS (SELECT doc_id, seen,
                        pen + greatest(0, CASE WHEN (den << k) > num
                                          THEN k - 1 ELSE k END) AS bits
                 FROM (SELECT doc_id, seen, pen, den, num,
                              length(printf('%b', num))
                                - length(printf('%b', den)) AS k
                       FROM sc))
        SELECT doc_id, COUNT(*) AS n_trigrams,
               CAST(SUM(CASE WHEN seen THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_backoff,
               CAST(SUM(bits) AS BIGINT) AS total_bits,
               CAST(SUM(bits) * 100 // COUNT(*) AS BIGINT)
                 AS centibits_per_trigram
        FROM bits GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q190: FOURGRAM surprise scoring — q157 one model order up (the
    // trigram section's closing promise kept; see the fourgram section
    // comment): fit the add-one 4-gram LM on documents and score every
    // document against it, all exact int64. One order below KenLM's
    // 5-gram default and the last order the fixture corpus exercises
    // meaningfully. 100 TB: identical shape to q157 — the LM is a
    // corpus-reduced count table, scoring is one doc-side join pair +
    // per-doc agg, V a 1-row broadcast.
    QueryDef(
      "q190_lm_fourgram_score",
      (s, dir) => {
        val toks = tokenized(T.documents(s, dir))
        surpriseScores4Tk(toks, toks).orderBy(col("doc_id"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        fg AS (SELECT doc_id, unnest(${X.shinglesSql("tk", 4)}) AS fg FROM tk),
        lmf AS (SELECT fg, COUNT(*) AS cf FROM fg GROUP BY fg),
        lmp AS (SELECT split_part(fg, ' ', 1) || ' ' || split_part(fg, ' ', 2)
                         || ' ' || split_part(fg, ' ', 3) AS p3,
                       CAST(SUM(cf) AS BIGINT) AS cp
                FROM lmf GROUP BY 1),
        vc AS (SELECT COUNT(DISTINCT t) AS v
               FROM (SELECT unnest(tk) AS t FROM tk)),
        fsc AS (SELECT g.doc_id, l.cf + 1 AS den, p.cp + vc.v AS num
                FROM fg g
                JOIN lmf l USING (fg)
                JOIN lmp p ON p.p3 = split_part(g.fg, ' ', 1) || ' ' ||
                              split_part(g.fg, ' ', 2) || ' ' ||
                              split_part(g.fg, ' ', 3)
                CROSS JOIN vc),
        bits AS (SELECT doc_id,
                        greatest(0, CASE WHEN (den << k) > num THEN k - 1 ELSE k END) AS bits
                 FROM (SELECT doc_id, den, num,
                              length(printf('%b', num))
                                - length(printf('%b', den)) AS k
                       FROM fsc))
        SELECT doc_id, COUNT(*) AS n_fourgrams,
               CAST(SUM(bits) AS BIGINT) AS total_bits,
               CAST(SUM(bits) * 100 // COUNT(*) AS BIGINT)
                 AS centibits_per_fourgram
        FROM bits GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q191: CHAINED BACKOFF SCORING — q161 one order up AND one level
    // deeper: 4-grams the English-fit LM has seen price under the
    // 4-gram model; unseen 4-grams back off to the trigram tail
    // (w2 w3 w4) + 1 bit; 4-grams whose trigram tail is ALSO unseen
    // back off again to the bigram tail (w3 w4) + 2 bits — Brants'
    // stupid backoff as the full recursive chain, in exact integer
    // bits. The lower-order model CTEs are q161's text VERBATIM
    // (enFitModelCtesSql), so the chain's trigram/bigram prices can
    // never drift from the single-level backoff's. Both branch counts
    // (n_bo3/n_bo2) are hash-checked — the chain's routing is part of
    // the contract, not just the totals. 100 TB: six doc-side
    // equi-joins against corpus-reduced count tables + per-doc agg —
    // no new shuffle class over q161.
    QueryDef(
      "q191_lm_backoff_chain",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val fitTk = tokenized(docs.filter(col("lang") === "en"))
        backoffChainScoresTk(fitTk, tokenized(docs)).orderBy(col("doc_id"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, lang, ${X.tokensSql("text")} AS tk
                    FROM documents),
        fgall AS (SELECT doc_id, unnest(${X.shinglesSql("tk", 4)}) AS fg
                  FROM tk),
        lmf AS (SELECT fg, COUNT(*) AS cf
                FROM (SELECT unnest(${X.shinglesSql("tk", 4)}) AS fg
                      FROM tk WHERE lang = 'en')
                GROUP BY fg),
        pm4 AS (SELECT split_part(fg, ' ', 1) || ' ' || split_part(fg, ' ', 2)
                         || ' ' || split_part(fg, ' ', 3) AS p3,
                       CAST(SUM(cf) AS BIGINT) AS cp4
                FROM lmf GROUP BY 1),
        $enFitModelCtesSql,
        csc AS (SELECT g.doc_id,
                       CASE WHEN f.cf IS NOT NULL THEN 0
                            WHEN l.ct IS NOT NULL THEN 1
                            ELSE 2 END AS od,
                       CASE WHEN f.cf IS NOT NULL THEN 0
                            WHEN l.ct IS NOT NULL THEN $BackoffPenaltyBits
                            ELSE ${2 * BackoffPenaltyBits} END AS pen,
                       CASE WHEN f.cf IS NOT NULL
                            THEN coalesce(p4.cp4, 0) + vc.v
                            WHEN l.ct IS NOT NULL
                            THEN coalesce(p3.cp3, 0) + vc.v
                            ELSE coalesce(p2.cp2, 0) + vc.v END AS num,
                       CASE WHEN f.cf IS NOT NULL THEN f.cf + 1
                            WHEN l.ct IS NOT NULL THEN l.ct + 1
                            ELSE coalesce(b.cb, 0) + 1 END AS den
                FROM fgall g
                LEFT JOIN lmf f USING (fg)
                LEFT JOIN pm4 p4
                  ON p4.p3 = split_part(g.fg, ' ', 1) || ' ' ||
                             split_part(g.fg, ' ', 2) || ' ' ||
                             split_part(g.fg, ' ', 3)
                LEFT JOIN lmt l
                  ON l.tg = split_part(g.fg, ' ', 2) || ' ' ||
                            split_part(g.fg, ' ', 3) || ' ' ||
                            split_part(g.fg, ' ', 4)
                LEFT JOIN pm3 p3
                  ON p3.p2 = split_part(g.fg, ' ', 2) || ' ' ||
                             split_part(g.fg, ' ', 3)
                LEFT JOIN lmb b
                  ON b.bg = split_part(g.fg, ' ', 3) || ' ' ||
                            split_part(g.fg, ' ', 4)
                LEFT JOIN pm2 p2 ON p2.w1 = split_part(g.fg, ' ', 3)
                CROSS JOIN vc),
        bits AS (SELECT doc_id, od,
                        pen + greatest(0, CASE WHEN (den << k) > num
                                          THEN k - 1 ELSE k END) AS bits
                 FROM (SELECT doc_id, od, pen, den, num,
                              length(printf('%b', num))
                                - length(printf('%b', den)) AS k
                       FROM csc))
        SELECT doc_id, COUNT(*) AS n_fourgrams,
               CAST(SUM(CASE WHEN od = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bo3,
               CAST(SUM(CASE WHEN od = 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bo2,
               CAST(SUM(bits) AS BIGINT) AS total_bits,
               CAST(SUM(bits) * 100 // COUNT(*) AS BIGINT)
                 AS centibits_per_fourgram
        FROM bits GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q195: LM PRUNING EFFECT — the measurement a KenLM `filter` run
    // reports before shipping a pruned model (pruning the low-count
    // tail is the standard CCNet-scale move: rare n-grams are most of
    // the model rows and least of the probability mass): prune the
    // bigram LM to cb ≥ max(2, Σcb/10000) — MASS-RELATIVE, because an
    // absolute count floor is scale-degenerate (the fixture's template
    // corpus has a near-constant ~930-bigram vocabulary whose counts
    // grow ∝ docs: cb ≥ 2 prunes 9 rows at sf0.001 and ZERO at sf0.1;
    // the relative floor prunes the same tail fraction at every scale,
    // which is also the right semantics for a 100 TB corpus) — then
    // score the corpus under the FULL and the PRUNED model
    // (same scoreAgainstLmTk machinery — the pruned model's prefix
    // masses recompute from the surviving rows, so a pruned bigram
    // prices as unseen AND its prefix is lighter), and report model
    // shrinkage vs score movement in one row. Deltas are reported as
    // exact integer SUMS and docs-cheaper/costlier COUNTS — per-bigram
    // deltas can be negative (a lighter prefix mass can price a
    // SURVIVING bigram cheaper), so no division ever sees a negative
    // operand. 100 TB: two scoring passes over the same tokenized
    // corpus + two model-row counts; the pruned model is the point —
    // it is the one that ships.
    QueryDef(
      "q195_lm_prune_effect",
      (s, dir) => {
        val toks = tokenized(T.documents(s, dir))
          .localCheckpoint(eager = false) // fit + both scoring passes
        val lm = bigramCountsTk(toks)
          .localCheckpoint(eager = false) // model count + prune + score
        val vocab = vocabTokensTk(toks)
        val nTot = lm.agg(sum(col("cb")).as("nb"))
        val lmP = lm.crossJoin(broadcast(nTot))
          .filter(col("cb") >= greatest(lit(2L), expr("nb div 10000")))
          .select(col("bg"), col("cb"))
        val full = scoreAgainstLmTk(lm, vocab, toks)
          .select(col("doc_id"), col("total_bits").as("bf"))
        val pruned = scoreAgainstLmTk(lmP, vocab, toks)
          .select(col("doc_id"), col("total_bits").as("bp"))
        val mFull = lm.agg(count(lit(1)).as("model_rows_full"))
        val mPruned = lmP.agg(count(lit(1)).as("model_rows_pruned"))
        full.join(pruned, "doc_id")
          .agg(count(lit(1)).as("docs_scored"),
            sum(col("bf")).as("sum_bits_full"),
            sum(col("bp")).as("sum_bits_pruned"),
            sum(when(col("bp") < col("bf"), 1L).otherwise(0L))
              .as("docs_cheaper"),
            sum(when(col("bp") > col("bf"), 1L).otherwise(0L))
              .as("docs_costlier"))
          .crossJoin(broadcast(mFull))
          .crossJoin(broadcast(mPruned))
          .select(col("model_rows_full"), col("model_rows_pruned"),
            col("docs_scored"), col("sum_bits_full"),
            col("sum_bits_pruned"), col("docs_cheaper"),
            col("docs_costlier"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        $selfScoreBodyCtesSql,
        bn AS (SELECT CAST(SUM(cb) AS BIGINT) AS nb FROM lmb),
        plmb AS (SELECT bg, cb FROM lmb, bn
                 WHERE cb >= greatest(2, nb // 10000)),
        plmp AS (SELECT split_part(bg, ' ', 1) AS w1,
                        CAST(SUM(cb) AS BIGINT) AS cp
                 FROM plmb GROUP BY 1),
        psc AS (SELECT b.doc_id, coalesce(l.cb, 0) + 1 AS den,
                       coalesce(p.cp, 0) + vc.v AS num
                FROM bg b
                LEFT JOIN plmb l USING (bg)
                LEFT JOIN plmp p ON p.w1 = split_part(b.bg, ' ', 1)
                CROSS JOIN vc),
        pbits AS (SELECT doc_id,
                         greatest(0, CASE WHEN (den << k) > num THEN k - 1 ELSE k END) AS bits
                  FROM (SELECT doc_id, den, num,
                               length(printf('%b', num))
                                 - length(printf('%b', den)) AS k
                        FROM psc)),
        fdoc AS (SELECT doc_id, CAST(SUM(bits) AS BIGINT) AS bf
                 FROM bits GROUP BY doc_id),
        pdoc AS (SELECT doc_id, CAST(SUM(bits) AS BIGINT) AS bp
                 FROM pbits GROUP BY doc_id)
        SELECT (SELECT COUNT(*) FROM lmb) AS model_rows_full,
               (SELECT COUNT(*) FROM plmb) AS model_rows_pruned,
               COUNT(*) AS docs_scored,
               CAST(SUM(f.bf) AS BIGINT) AS sum_bits_full,
               CAST(SUM(p.bp) AS BIGINT) AS sum_bits_pruned,
               CAST(SUM(CASE WHEN p.bp < f.bf THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_cheaper,
               CAST(SUM(CASE WHEN p.bp > f.bf THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_costlier
        FROM fdoc f JOIN pdoc p USING (doc_id)""")),

    // ------------------------------------------------------------------
    // q202: 5-GRAM SELF-SCORING — q190 one order up, at KenLM's
    // default order (the round-15 verdict's item #5). The self-fit is
    // near-singleton at this order, so per-doc centibits concentrate
    // near log2 of the prefix mass — which is exactly the regime
    // q203's interpolation and q204's pruning report exist to handle.
    QueryDef(
      "q202_lm_fivegram_score",
      (s, dir) => {
        val toks = tokenized(T.documents(s, dir))
        surpriseScores5Tk(toks, toks).orderBy(col("doc_id"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        pg AS (SELECT doc_id, unnest(${X.shinglesSql("tk", 5)}) AS pg FROM tk),
        lmg AS (SELECT pg, COUNT(*) AS cg FROM pg GROUP BY pg),
        lmp AS (SELECT ${partsSql("pg", 1, 4)} AS p4,
                       CAST(SUM(cg) AS BIGINT) AS cpm
                FROM lmg GROUP BY 1),
        vc AS (SELECT COUNT(DISTINCT t) AS v
               FROM (SELECT unnest(tk) AS t FROM tk)),
        gsc AS (SELECT g.doc_id, l.cg + 1 AS den, p.cpm + vc.v AS num
                FROM pg g
                JOIN lmg l USING (pg)
                JOIN lmp p ON p.p4 = ${partsSql("g.pg", 1, 4)}
                CROSS JOIN vc),
        bits AS (SELECT doc_id,
                        greatest(0, CASE WHEN (den << k) > num THEN k - 1 ELSE k END) AS bits
                 FROM (SELECT doc_id, den, num,
                              length(printf('%b', num))
                                - length(printf('%b', den)) AS k
                       FROM gsc))
        SELECT doc_id, COUNT(*) AS n_fivegrams,
               CAST(SUM(bits) AS BIGINT) AS total_bits,
               CAST(SUM(bits) * 100 // COUNT(*) AS BIGINT)
                 AS centibits_per_fivegram
        FROM bits GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q203: KNESER-NEY-FLAVORED INTERPOLATED SCORING — the principled
    // replacement for q191's stupid-backoff switch (see
    // [[knInterpolatedScoresTk]]): every 5-gram is priced at ALL three
    // levels (5-gram raw counts; 4- and 3-token tails under
    // CONTINUATION counts — type counts over the 5-/4-gram tables, the
    // KN correction, exact integers) with whole-bit level-drop
    // penalties, and the cheapest level wins (the log-domain dominant
    // term of λ-interpolation — exact rational interpolation would
    // overflow int64 at corpus scale). The per-level routing counts
    // (n_lvl4/n_lvl3) are hash-checked contract, like q191's.
    QueryDef(
      "q203_lm_interpolated_score",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val fitTk = tokenized(docs.filter(col("lang") === "en"))
        knInterpolatedScoresTk(fitTk, tokenized(docs))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, lang, ${X.tokensSql("text")} AS tk
                    FROM documents),
        pgall AS (SELECT doc_id, unnest(${X.shinglesSql("tk", 5)}) AS pg
                  FROM tk),
        lmg AS (SELECT pg, COUNT(*) AS cg
                FROM (SELECT unnest(${X.shinglesSql("tk", 5)}) AS pg
                      FROM tk WHERE lang = 'en')
                GROUP BY pg),
        pm5 AS (SELECT ${partsSql("pg", 1, 4)} AS p4,
                       CAST(SUM(cg) AS BIGINT) AS cp5
                FROM lmg GROUP BY 1),
        cc4 AS (SELECT ${partsSql("pg", 2, 4)} AS tl4, COUNT(*) AS cc4
                FROM lmg GROUP BY 1),
        dn4 AS (SELECT ${partsSql("pg", 2, 3)} AS md4, COUNT(*) AS dn4
                FROM lmg GROUP BY 1),
        lmf4 AS (SELECT fg, COUNT(*) AS cf
                 FROM (SELECT unnest(${X.shinglesSql("tk", 4)}) AS fg
                       FROM tk WHERE lang = 'en')
                 GROUP BY fg),
        cc3 AS (SELECT ${partsSql("fg", 2, 3)} AS tl3, COUNT(*) AS cc3
                FROM lmf4 GROUP BY 1),
        dn3 AS (SELECT ${partsSql("fg", 2, 2)} AS md3, COUNT(*) AS dn3
                FROM lmf4 GROUP BY 1),
        vc AS (SELECT COUNT(DISTINCT t) AS v
               FROM (SELECT unnest(tk) AS t FROM tk WHERE lang = 'en')),
        isc AS (SELECT g.doc_id,
                       coalesce(p5.cp5, 0) + vc.v AS n5,
                       coalesce(l.cg, 0) + 1 AS d5,
                       coalesce(d4.dn4, 0) + vc.v AS n4,
                       coalesce(c4.cc4, 0) + 1 AS d4x,
                       coalesce(d3.dn3, 0) + vc.v AS n3,
                       coalesce(c3.cc3, 0) + 1 AS d3x
                FROM pgall g
                LEFT JOIN lmg l USING (pg)
                LEFT JOIN pm5 p5 ON p5.p4 = ${partsSql("g.pg", 1, 4)}
                LEFT JOIN cc4 c4 ON c4.tl4 = ${partsSql("g.pg", 2, 4)}
                LEFT JOIN dn4 d4 ON d4.md4 = ${partsSql("g.pg", 2, 3)}
                LEFT JOIN cc3 c3 ON c3.tl3 = ${partsSql("g.pg", 3, 3)}
                LEFT JOIN dn3 d3 ON d3.md3 = ${partsSql("g.pg", 3, 2)}
                CROSS JOIN vc),
        kbits AS (SELECT doc_id,
                    greatest(0, CASE WHEN (d5 << k5) > n5 THEN k5 - 1 ELSE k5 END) AS b5r,
                    $BackoffPenaltyBits + greatest(0,
                      CASE WHEN (d4x << k4) > n4 THEN k4 - 1 ELSE k4 END) AS b4r,
                    ${2 * BackoffPenaltyBits} + greatest(0,
                      CASE WHEN (d3x << k3) > n3 THEN k3 - 1 ELSE k3 END) AS b3r
                  FROM (SELECT doc_id, n5, d5, n4, d4x, n3, d3x,
                               length(printf('%b', n5)) - length(printf('%b', d5)) AS k5,
                               length(printf('%b', n4)) - length(printf('%b', d4x)) AS k4,
                               length(printf('%b', n3)) - length(printf('%b', d3x)) AS k3
                        FROM isc)),
        obits AS (SELECT doc_id, least(b5r, b4r, b3r) AS bits,
                         CASE WHEN least(b5r, b4r, b3r) = b5r THEN 5
                              WHEN least(b5r, b4r, b3r) = b4r THEN 4
                              ELSE 3 END AS od
                  FROM kbits)
        SELECT doc_id, COUNT(*) AS n_fivegrams,
               CAST(SUM(CASE WHEN od = 4 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_lvl4,
               CAST(SUM(CASE WHEN od = 3 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_lvl3,
               CAST(SUM(bits) AS BIGINT) AS total_bits,
               CAST(SUM(bits) * 100 // COUNT(*) AS BIGINT)
                 AS centibits_per_fivegram
        FROM obits GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q204: 5-GRAM PRUNING EFFECT — q195's report re-run at order 5,
    // where pruning actually bites. The floor is one decade looser
    // than q195's (cg ≥ max(2, Σcg/100000)): a 5-gram table is
    // singleton-dominated (measured ~95% singletons at every fixture
    // SF — the type space is V^5 ≫ corpus, so counts do NOT grow ∝
    // docs the way bigram counts do), and q195's 1e-4 mass floor
    // empties the order-5 model entirely (measured: 0 surviving rows
    // at sf0.1). At 1e-5 the pruned model keeps the ~5% repeated tail
    // and the report quantifies the score movement that shipping only
    // that tail costs — the measurement that justifies WHY a shipped
    // 5-gram model is pruned+interpolated rather than raw. Same report
    // columns, same full-vs-pruned two-pass shape as q195.
    QueryDef(
      "q204_lm_prune_effect_5gram",
      (s, dir) => {
        val toks = tokenized(T.documents(s, dir))
          .localCheckpoint(eager = false) // fit + both scoring passes
        val lm = fivegramCountsTk(toks)
          .localCheckpoint(eager = false) // model count + prune + score
        val vocab = vocabTokensTk(toks)
        val nTot = lm.agg(sum(col("cg")).as("ng"))
        val lmP = lm.crossJoin(broadcast(nTot))
          .filter(col("cg") >= greatest(lit(2L), expr("ng div 100000")))
          .select(col("pg"), col("cg"))
        val full = scoreAgainstLm5Tk(lm, vocab, toks)
          .select(col("doc_id"), col("total_bits").as("bf"))
        val pruned = scoreAgainstLm5Tk(lmP, vocab, toks)
          .select(col("doc_id"), col("total_bits").as("bp"))
        val mFull = lm.agg(count(lit(1)).as("model_rows_full"))
        val mPruned = lmP.agg(count(lit(1)).as("model_rows_pruned"))
        full.join(pruned, "doc_id")
          .agg(count(lit(1)).as("docs_scored"),
            sum(col("bf")).as("sum_bits_full"),
            sum(col("bp")).as("sum_bits_pruned"),
            sum(when(col("bp") < col("bf"), 1L).otherwise(0L))
              .as("docs_cheaper"),
            sum(when(col("bp") > col("bf"), 1L).otherwise(0L))
              .as("docs_costlier"))
          .crossJoin(broadcast(mFull))
          .crossJoin(broadcast(mPruned))
          .select(col("model_rows_full"), col("model_rows_pruned"),
            col("docs_scored"), col("sum_bits_full"),
            col("sum_bits_pruned"), col("docs_cheaper"),
            col("docs_costlier"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, ${X.tokensSql("text")} AS tk FROM documents),
        pg AS (SELECT doc_id, unnest(${X.shinglesSql("tk", 5)}) AS pg FROM tk),
        lmg AS (SELECT pg, COUNT(*) AS cg FROM pg GROUP BY pg),
        lmp AS (SELECT ${partsSql("pg", 1, 4)} AS p4,
                       CAST(SUM(cg) AS BIGINT) AS cpm
                FROM lmg GROUP BY 1),
        vc AS (SELECT COUNT(DISTINCT t) AS v
               FROM (SELECT unnest(tk) AS t FROM tk)),
        gsc AS (SELECT g.doc_id, l.cg + 1 AS den, p.cpm + vc.v AS num
                FROM pg g
                JOIN lmg l USING (pg)
                JOIN lmp p ON p.p4 = ${partsSql("g.pg", 1, 4)}
                CROSS JOIN vc),
        fbits AS (SELECT doc_id,
                         greatest(0, CASE WHEN (den << k) > num THEN k - 1 ELSE k END) AS bits
                  FROM (SELECT doc_id, den, num,
                               length(printf('%b', num))
                                 - length(printf('%b', den)) AS k
                        FROM gsc)),
        gn AS (SELECT CAST(SUM(cg) AS BIGINT) AS ng FROM lmg),
        plmg AS (SELECT pg, cg FROM lmg, gn
                 WHERE cg >= greatest(2, ng // 100000)),
        plmp AS (SELECT ${partsSql("pg", 1, 4)} AS p4,
                        CAST(SUM(cg) AS BIGINT) AS cpm
                 FROM plmg GROUP BY 1),
        psc AS (SELECT g.doc_id, coalesce(l.cg, 0) + 1 AS den,
                       coalesce(p.cpm, 0) + vc.v AS num
                FROM pg g
                LEFT JOIN plmg l USING (pg)
                LEFT JOIN plmp p ON p.p4 = ${partsSql("g.pg", 1, 4)}
                CROSS JOIN vc),
        pbits AS (SELECT doc_id,
                         greatest(0, CASE WHEN (den << k) > num THEN k - 1 ELSE k END) AS bits
                  FROM (SELECT doc_id, den, num,
                               length(printf('%b', num))
                                 - length(printf('%b', den)) AS k
                        FROM psc)),
        fdoc AS (SELECT doc_id, CAST(SUM(bits) AS BIGINT) AS bf
                 FROM fbits GROUP BY doc_id),
        pdoc AS (SELECT doc_id, CAST(SUM(bits) AS BIGINT) AS bp
                 FROM pbits GROUP BY doc_id)
        SELECT (SELECT COUNT(*) FROM lmg) AS model_rows_full,
               (SELECT COUNT(*) FROM plmg) AS model_rows_pruned,
               COUNT(*) AS docs_scored,
               CAST(SUM(f.bf) AS BIGINT) AS sum_bits_full,
               CAST(SUM(p.bp) AS BIGINT) AS sum_bits_pruned,
               CAST(SUM(CASE WHEN p.bp < f.bf THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_cheaper,
               CAST(SUM(CASE WHEN p.bp > f.bf THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_costlier
        FROM fdoc f JOIN pdoc p USING (doc_id)""")),

    // ------------------------------------------------------------------
    // q215: TRUE INTERPOLATED KNESER-NEY (see [[knMixtureScoresTk]]) —
    // q203's count CTEs (same fit slice, same continuation tables)
    // with the cheapest-level switch replaced by the actual
    // absolute-discount mixture in scaled integers: D = 1, backoff
    // masses γ5 = t5c/cp5 and γ4 = t4c/dn4 as ×1e6 integers,
    // probabilities ×1e9, every division overflow-guarded by the
    // joint-shift rule. The per-doc γ sums are hash-checked output:
    // the mixture WEIGHTS are contract, not just the resulting bits.
    QueryDef(
      "q215_lm_kn_mixture_score",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val fitTk = tokenized(docs.filter(col("lang") === "en"))
        knMixtureScoresTk(fitTk, tokenized(docs))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, lang, ${X.tokensSql("text")} AS tk
                    FROM documents),
        pgall AS (SELECT doc_id, unnest(${X.shinglesSql("tk", 5)}) AS pg
                  FROM tk),
        lmg AS (SELECT pg, COUNT(*) AS cg
                FROM (SELECT unnest(${X.shinglesSql("tk", 5)}) AS pg
                      FROM tk WHERE lang = 'en')
                GROUP BY pg),
        lmf4 AS (SELECT fg, COUNT(*) AS cf
                 FROM (SELECT unnest(${X.shinglesSql("tk", 4)}) AS fg
                       FROM tk WHERE lang = 'en')
                 GROUP BY fg),
        cc3 AS (SELECT ${partsSql("fg", 2, 3)} AS tl3, COUNT(*) AS cc3
                FROM lmf4 GROUP BY 1),
        dn3 AS (SELECT ${partsSql("fg", 2, 2)} AS md3, COUNT(*) AS dn3
                FROM lmf4 GROUP BY 1),
        vc AS (SELECT COUNT(DISTINCT t) AS v
               FROM (SELECT unnest(tk) AS t FROM tk WHERE lang = 'en')),
        ${knMixChainSql("", "lmg")}
        SELECT doc_id, COUNT(*) AS n_fivegrams,
               CAST(SUM(g5) AS BIGINT) AS sum_g5_e6,
               CAST(SUM(g4) AS BIGINT) AS sum_g4_e6,
               CAST(SUM(bits) AS BIGINT) AS total_bits,
               CAST(SUM(bits) * 100 // COUNT(*) AS BIGINT)
                 AS centibits_per_fivegram
        FROM knbits GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q216: PRUNING EFFECT UNDER THE KN MIXTURE — q204's report re-run
    // with q215's model doing the scoring (the verdict's "q204's
    // pruning re-run under it"): the 5-gram table pruned at q204's
    // mass-relative floor (cg ≥ max(2, Σcg/100000)), and BOTH scoring
    // passes priced by the interpolated mixture through ONE code path
    // ([[knMixtureScoresFromLm]] / [[knMixChainSql]]'s twin chains).
    // Pruning flows through the L5/L4 discount masses exactly as
    // shipping a pruned artifact would; L3's tables (from the 4-gram
    // table) are untouched. THIS is the meaningful pruning audit: the
    // raw add-one model (q204) barely registers a 95% row cut (+0.3%
    // bits at sf0.1) because order-5 raw scores already price at the
    // add-V smoothing floor — the MIXTURE actually depends on the
    // table through three levels, and measures +1.9% total bits for a
    // 97% row cut (with ~45% of docs getting CHEAPER — shrunken
    // discount masses route less probability away from surviving
    // grams). ±2% for a 36× artifact shrink is the shipping
    // justification, measured under the estimator that ships. Same
    // report columns as q204.
    QueryDef(
      "q216_lm_kn_prune_effect",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val fitTk = tokenized(docs.filter(col("lang") === "en"))
          .localCheckpoint(eager = false) // lm5 + t4 + vocab read it
        val scoreTk = tokenized(docs)
          .localCheckpoint(eager = false) // both scoring passes
        val lm = fivegramCountsTk(fitTk)
          .localCheckpoint(eager = false) // count + prune + two scores
        val t4 = fourgramCountsTk(fitTk)
          .localCheckpoint(eager = false) // both scoring passes
        val vocab = vocabTokensTk(fitTk)
        val nTot = lm.agg(sum(col("cg")).as("ng"))
        val lmP = lm.crossJoin(broadcast(nTot))
          .filter(col("cg") >= greatest(lit(2L), expr("ng div 100000")))
          .select(col("pg"), col("cg"))
        val full = knMixtureScoresFromLm(lm, t4, vocab, scoreTk)
          .select(col("doc_id"), col("total_bits").as("bf"))
        val pruned = knMixtureScoresFromLm(lmP, t4, vocab, scoreTk)
          .select(col("doc_id"), col("total_bits").as("bp"))
        val mFull = lm.agg(count(lit(1)).as("model_rows_full"))
        val mPruned = lmP.agg(count(lit(1)).as("model_rows_pruned"))
        full.join(pruned, "doc_id")
          .agg(count(lit(1)).as("docs_scored"),
            sum(col("bf")).as("sum_bits_full"),
            sum(col("bp")).as("sum_bits_pruned"),
            sum(when(col("bp") < col("bf"), 1L).otherwise(0L))
              .as("docs_cheaper"),
            sum(when(col("bp") > col("bf"), 1L).otherwise(0L))
              .as("docs_costlier"))
          .crossJoin(broadcast(mFull))
          .crossJoin(broadcast(mPruned))
          .select(col("model_rows_full"), col("model_rows_pruned"),
            col("docs_scored"), col("sum_bits_full"),
            col("sum_bits_pruned"), col("docs_cheaper"),
            col("docs_costlier"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, lang, ${X.tokensSql("text")} AS tk
                    FROM documents),
        pgall AS (SELECT doc_id, unnest(${X.shinglesSql("tk", 5)}) AS pg
                  FROM tk),
        lmg AS (SELECT pg, COUNT(*) AS cg
                FROM (SELECT unnest(${X.shinglesSql("tk", 5)}) AS pg
                      FROM tk WHERE lang = 'en')
                GROUP BY pg),
        gn AS (SELECT CAST(SUM(cg) AS BIGINT) AS ng FROM lmg),
        plmg AS MATERIALIZED (SELECT pg, cg FROM lmg, gn
                 WHERE cg >= greatest(2, ng // 100000)),
        lmf4 AS (SELECT fg, COUNT(*) AS cf
                 FROM (SELECT unnest(${X.shinglesSql("tk", 4)}) AS fg
                       FROM tk WHERE lang = 'en')
                 GROUP BY fg),
        cc3 AS (SELECT ${partsSql("fg", 2, 3)} AS tl3, COUNT(*) AS cc3
                FROM lmf4 GROUP BY 1),
        dn3 AS (SELECT ${partsSql("fg", 2, 2)} AS md3, COUNT(*) AS dn3
                FROM lmf4 GROUP BY 1),
        vc AS (SELECT COUNT(DISTINCT t) AS v
               FROM (SELECT unnest(tk) AS t FROM tk WHERE lang = 'en')),
        ${knMixChainSql("f", "lmg")},
        ${knMixChainSql("p", "plmg")},
        fdoc AS (SELECT doc_id, CAST(SUM(bits) AS BIGINT) AS bf
                 FROM knbitsf GROUP BY doc_id),
        pdoc AS (SELECT doc_id, CAST(SUM(bits) AS BIGINT) AS bp
                 FROM knbitsp GROUP BY doc_id)
        SELECT (SELECT COUNT(*) FROM lmg) AS model_rows_full,
               (SELECT COUNT(*) FROM plmg) AS model_rows_pruned,
               COUNT(*) AS docs_scored,
               CAST(SUM(f.bf) AS BIGINT) AS sum_bits_full,
               CAST(SUM(p.bp) AS BIGINT) AS sum_bits_pruned,
               CAST(SUM(CASE WHEN p.bp < f.bf THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_cheaper,
               CAST(SUM(CASE WHEN p.bp > f.bf THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_costlier
        FROM fdoc f JOIN pdoc p USING (doc_id)"""))
  )
}
