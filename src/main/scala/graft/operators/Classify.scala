package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical corpus-curation models over token counts: multinomial
  * Naive Bayes classification, n-gram language-model scoring (the
  * CCNet-style perplexity quality filter), and DSIR-style hashed
  * importance weighting for targeted data selection.
  *
  * Reference context: the reference (`cnics_to_fhir.py`) has no
  * model-based curation surface — this is the SURVEY §7.5 LLM-pipeline
  * extension. The shapes follow the public literature: fastText/NB
  * quality classifiers and KenLM perplexity filtering (CCNet,
  * Wenzek et al. 2020) and hashed-n-gram importance resampling (DSIR,
  * Xie et al. 2023).
  *
  * Exactness discipline (the repo-wide oracle contract, see
  * [[Lexical]]): every model probability is integer-count-derived, so
  * the double quotient feeding `ln` is bit-identical in any engine;
  * the `ln` result quantizes through DECIMAL(18,12)→6 digits — the one
  * libm call in the scoring path; each per-token contribution
  * quantizes to DECIMAL(18,8) so a document score is an order-free
  * exact decimal SUM and rankings tie identically everywhere.
  *
  * Scale shape: training is one groupBy over the tokenized corpus
  * (map-side combined counts — the model IS an aggregate); the model
  * tables are vocabulary-sized, never corpus-sized, and scoring is a
  * term-keyed equi-join of the batch against the model — cost follows
  * the batch, never the training corpus. All model tables are plain
  * DataFrames, so they persist/fold/store exactly like the lexical
  * index ([[graft.streaming.DocStreams.indexIngest]] discipline):
  * counts are mergeable by summation, making every model here
  * incrementally maintainable by construction.
  */
object Classify {

  /** ln quantized through DECIMAL(18,12)→6 digits (the [[Lexical]]
    * idf discipline — one libm call, then decimal). */
  def logq6(c: Column): Column =
    round(log(c).cast("decimal(18,12)"), 6).cast("double")

  /** Contribution quantizer: double → DECIMAL(18,8), the order-free
    * exact-summation cell type. */
  def c8(c: Column): Column =
    round(c.cast("decimal(18,12)"), 8).cast("decimal(18,8)")

  private def toks(textCol: String): String =
    graft.functions.TextFunctions.tokensSql(textCol)

  /** Per-(label, term) token counts + per-label totals + vocabulary:
    * the complete sufficient statistics of a multinomial NB model.
    * Every table is a pure additive aggregate — fold new batches by
    * summing counts. */
  final case class NbModel(
      condCounts: DataFrame, // (label, term, cnt)
      classStats: DataFrame, // (label, total_c, n_docs_c)
      vocab: DataFrame) // (term)

  /** Train sufficient statistics from labelled documents.
    * One tokenize pass; both aggregates map-side combine. */
  def nbTrain(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", labelCol: String = "label"): NbModel = {
    val t = docs.select(col(idCol).as("doc_id"), col(labelCol).as("label"),
      explode(expr(toks(textCol))).as("term"))
    val cond = t.groupBy("label", "term").agg(count(lit(1)).as("cnt"))
    val perDocLen = docs.select(col(labelCol).as("label"),
      size(expr(toks(textCol))).cast("long").as("dl"))
    val cstats = perDocLen.groupBy("label")
      .agg(coalesce(sum("dl"), lit(0L)).as("total_c"),
        count(lit(1)).as("n_docs_c"))
    NbModel(cond, cstats, cond.select("term").distinct())
  }

  /** The dense smoothed log-probability table (label × vocab): each
    * cell lp8 = c8(logq6((cnt+1)/(total_c+V))) — add-one smoothing
    * over the training vocabulary. c8 of a 6-digit-rounded double is
    * EXACT (the nearest double of a 6-decimal value re-rounds to the
    * same value at 8 digits), so lp8 is the model cell as an exact
    * decimal: per-token contributions become exact decimal products
    * and a tf-weighted batch sum equals a per-occurrence streaming
    * sum bit-for-bit — the property the online serving path rides.
    * Vocabulary-sized (K·V rows), the "impact index" of the
    * classifier: compute once, reuse per batch. */
  def nbLogProbs(m: NbModel): DataFrame = {
    val v1 = m.vocab.agg(count(lit(1)).as("v")) // 1 row
    m.vocab.crossJoin(broadcast(m.classStats)).crossJoin(broadcast(v1))
      .join(m.condCounts, Seq("label", "term"), "left")
      .select(col("label"), col("term"),
        c8(logq6((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("total_c") + col("v")).cast("double"))).as("lp8"))
  }

  /** Quantized per-label log prior: lprior8 (DECIMAL(18,8)). */
  def nbPriors(m: NbModel): DataFrame = {
    val n1 = m.classStats.agg(coalesce(sum("n_docs_c"), lit(0L)).as("n"))
    m.classStats.crossJoin(broadcast(n1))
      .select(col("label"),
        c8(logq6(col("n_docs_c").cast("double") / col("n").cast("double")))
          .as("lprior8"))
  }

  /** Joint log-likelihood of each (doc, label): prior + Σ tf·lp8.
    * Out-of-vocabulary tokens drop (inner join with the model) — the
    * standard closed-vocabulary NB treatment; a doc with zero
    * in-vocabulary tokens drops entirely. Scoring cost = batch
    * postings × K; the training corpus is never rescanned. */
  def nbScores(logProbs: DataFrame, priors: DataFrame, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(expr(toks(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    tf.join(logProbs, Seq("term"))
      .select(col("doc_id"), col("label"),
        (col("tf").cast("decimal(18,0)") * col("lp8")).as("__c8"))
      .groupBy("doc_id", "label")
      .agg(sum("__c8").as("__ll"), count(lit(1)).as("n_terms"))
      .join(broadcast(priors), Seq("label"))
      .select(col("doc_id"), col("label"),
        (col("__ll") + col("lprior8")).as("__score_dec"), col("n_terms"))
  }

  /** Argmax prediction per doc: (score DESC, label ASC) — exact
    * decimal comparison, so ties break identically in any engine.
    * Implemented as `min(struct(-score, label, …))`, NOT a per-doc
    * window: a plain hash aggregate combines map-side and carries no
    * sort, and the same expression is legal over a streaming frame
    * (the serving path) where a Window would not be. */
  def nbPredict(scores: DataFrame): DataFrame =
    scores.groupBy("doc_id")
      .agg(min(struct(
        (lit(0).cast("decimal(18,8)") - col("__score_dec")).as("__ns"),
        col("label"), col("n_terms"), col("__score_dec").as("__sd"))).as("__w"))
      .select(col("doc_id"), col("__w.label").as("pred_label"),
        round(col("__w.__sd").cast("double"), 6).as("score"),
        col("__w.n_terms").as("n_terms"))

  /** Per-class precision/recall/F1 from a confusion matrix frame
    * (trueCol, predCol, nCol): integer-exact counts, ratios emitted as
    * round-half-up parts-per-million BIGINTs (the registry-wide
    * quantized-exact contract — no raw double division), and the −1
    * sentinel (never NULL) for zero denominators. K²-row input →
    * K-row output; 2e6·tp stays inside signed 64-bit to ~4.6e12 rows
    * per class. Shares [[agreementStats]]'s K²-row checkpoint cut. */
  def prfStats(cm0: DataFrame, trueCol: String = "true_lang",
      predCol: String = "pred_lang", nCol: String = "n"): DataFrame = {
    // enforce the one-row-per-cell contract (K²-row cheap): a cm input
    // with duplicate (true, pred) rows would otherwise duplicate
    // marginal rows through the diagonal join and silently inflate tp
    val cm = cmCells(cm0, trueCol, predCol, nCol)
    val byTrue = cm.groupBy(col(trueCol).as("label")).agg(sum(nCol).as("n_true"))
    val byPred = cm.groupBy(col(predCol).as("label")).agg(sum(nCol).as("n_pred"))
    val diag = cm.filter(col(trueCol) === col(predCol))
      .select(col(trueCol).as("label"), col(nCol).as("__tp"))
    byTrue.join(byPred, Seq("label"), "full_outer")
      .join(diag, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("__tp"), lit(0L)).as("tp"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"))
      .select(col("label"), col("tp"), col("n_true"), col("n_pred"),
        when(col("n_pred") > 0,
          expr("(2000000 * tp + n_pred) div (2 * n_pred)"))
          .otherwise(lit(-1L)).as("precision_ppm"),
        when(col("n_true") > 0,
          expr("(2000000 * tp + n_true) div (2 * n_true)"))
          .otherwise(lit(-1L)).as("recall_ppm"),
        when(col("n_true") + col("n_pred") > 0,
          expr("(4000000 * tp + n_true + n_pred) div (2 * (n_true + n_pred))"))
          .otherwise(lit(-1L)).as("f1_ppm"))
  }

  /** Shared cm-frame normalizer for [[prfStats]]/[[agreementStats]]:
    * re-aggregate to one row per (true, pred) cell — making the
    * one-row-per-cell contract ENFORCED rather than assumed — and cut
    * the lineage once (K²-row checkpoint; the matrix is read three
    * times downstream and Catalyst does not dedupe identical
    * subtrees). */
  private def cmCells(cm0: DataFrame, trueCol: String, predCol: String,
      nCol: String): DataFrame =
    cm0.groupBy(col(trueCol), col(predCol)).agg(sum(nCol).as(nCol))
      .localCheckpoint(true)

  /** Chance-corrected agreement (Cohen's κ) from a confusion matrix
    * frame (trueCol, predCol, nCol): one row with the marginals-exact
    * κ = (N·A − C)/(N² − C), A = Σ diagonal, C = Σ_k n_true_k·n_pred_k.
    * Arithmetic is DECIMAL(38,0) end-to-end (N² overflows BIGINT past
    * ~3e9 rows); κ ∈ [−1, 1] can be negative, so its ppm division uses
    * the signed round-half-away form (both engines' integer division
    * truncates toward zero); a single-class degenerate matrix
    * (N² = C) reports the −2e6 sentinel, never NULL (the canonicalizer
    * float-widening rule). K²-row input → K-row marginals → one row:
    * metadata-sized at any corpus scale. */
  def agreementStats(cm0: DataFrame, trueCol: String = "true_lang",
      predCol: String = "pred_lang", nCol: String = "n"): DataFrame = {
    // K²-row cut: the matrix is referenced three times below (both
    // marginals + the diagonal) and Catalyst does not dedupe identical
    // subtrees — without it a caller passing a full train+score
    // pipeline as `cm0` (eval_kappa_nb) would replay it three times
    // (the mix_* queries' four-scan lesson); cmCells also enforces the
    // one-row-per-cell contract
    val cm = cmCells(cm0, trueCol, predCol, nCol)
    val byTrue = cm.groupBy(col(trueCol).as("label")).agg(sum(nCol).as("n_true"))
    val byPred = cm.groupBy(col(predCol).as("label")).agg(sum(nCol).as("n_pred"))
    val diag = cm.filter(col(trueCol) === col(predCol))
      .select(col(trueCol).as("label"), col(nCol).as("__tp"))
    byTrue.join(byPred, Seq("label"), "full_outer")
      .join(diag, Seq("label"), "left")
      .agg(sum(coalesce(col("n_true"), lit(0L))).as("n_docs"),
        sum(coalesce(col("__tp"), lit(0L))).as("n_agree"),
        sum(expr("CAST(coalesce(n_true, 0) AS DECIMAL(38,0)) * coalesce(n_pred, 0)"))
          .as("__c"))
      .select(col("n_docs"), col("n_agree"),
        expr("""CAST((2000000 * CAST(n_agree AS DECIMAL(38,0)) + n_docs)
                div (2 * CAST(n_docs AS DECIMAL(38,0))) AS BIGINT)""").as("po_ppm"),
        expr("""CAST((2000000 * __c + CAST(n_docs AS DECIMAL(38,0)) * n_docs)
                div (2 * CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)""").as("pe_ppm"),
        expr("""CAST(CASE
                WHEN CAST(n_docs AS DECIMAL(38,0)) * n_docs = __c THEN -2000000
                ELSE (2 * (1000000 * (CAST(n_docs AS DECIMAL(38,0)) * n_agree - __c))
                  + CASE WHEN CAST(n_docs AS DECIMAL(38,0)) * n_agree >= __c
                    THEN CAST(n_docs AS DECIMAL(38,0)) * n_docs - __c
                    ELSE __c - CAST(n_docs AS DECIMAL(38,0)) * n_docs END)
                  div (2 * (CAST(n_docs AS DECIMAL(38,0)) * n_docs - __c))
                END AS BIGINT)""").as("kappa_ppm"))
  }

  /** Serving form of the model: (term, label, lp8s) with the exact
    * DECIMAL(18,8) cell as a LOSSLESS 1e-8-scaled BIGINT (the
    * [[Lexical.impactIndex]] trick) — integer sums in the online
    * aggregator are then exact and equal the batch decimal sums. */
  def nbImpact(logProbs: DataFrame): DataFrame =
    logProbs.select(col("term"), col("label"),
      (col("lp8") * lit(100000000L)).cast("long").as("lp8s"))

  /** K-row scaled prior map for [[ArgmaxSumAgg]] (metadata-sized
    * driver collect, like the BPE round tables). */
  def nbPriorMap(priors: DataFrame): Map[String, Long] =
    priors.select(col("label"),
        (col("lprior8") * lit(100000000L)).cast("long").as("p8s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Single-aggregation streaming argmax: state is the K-entry
    * label → Σ lp8s map (bounded by the label alphabet, merges
    * pointwise — map-side combining works); finish adds the scaled
    * priors and picks (max score, min label). The NB analogue of
    * [[graft.functions.TopK]]'s bounded heaps: one ObjectHashAggregate,
    * no Window, legal over a streaming frame. */
  final class ArgmaxSumAgg(priors: Map[String, Long])
      extends org.apache.spark.sql.expressions.Aggregator[
        (String, Long), Map[String, Long], (String, Long)] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], a: (String, Long)): Map[String, Long] =
      b.updated(a._1, b.getOrElse(a._1, 0L) + a._2)
    def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    /** (winning label, SCALED score) — the final /1e8 + round happens
      * in SQL via Spark's own `round`, so the score goes through the
      * identical double-rounding path as the batch twin. Only labels
      * with at least one scored token compete — mirrors the batch
      * inner join (a label can't miss: the grid is dense over
      * vocab × labels). */
    def finish(r: Map[String, Long]): (String, Long) =
      r.iterator
        .map { case (l, s) => (l, s + priors.getOrElse(l, 0L)) }
        .reduceLeft { (a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a
        }
    def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[(String, Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** ONLINE NB classification (the annServe/bm25Serve discipline):
    * `probe` rows are (doc_id, text) — batch OR streaming frame. The
    * probe side is a pure projection (token explode, no tf
    * pre-aggregation), joined term-keyed against the precomputed
    * [[nbImpact]] grid, argmax'd by ONE [[ArgmaxSumAgg]] aggregation.
    * Output (doc_id, pred_label, score) equals [[nbPredict]] of the
    * batch path bit-for-bit: per-occurrence integer sums == tf-
    * weighted decimal sums (exact arithmetic end to end; the only
    * difference is n_terms, which the occurrence stream cannot count
    * distinctly and therefore omits). */
  def nbServe(probe: DataFrame, impact: DataFrame,
      priorMap: Map[String, Long]): DataFrame = {
    val agg = udaf(new ArgmaxSumAgg(priorMap))
    probe
      .select(col("doc_id"), explode(expr(toks("text"))).as("term"))
      .join(impact, Seq("term"))
      .groupBy("doc_id")
      .agg(agg(col("label"), col("lp8s")).as("w"))
      .select(col("doc_id"), col("w._1").as("pred_label"),
        round(col("w._2").cast("double") / lit(1.0e8), 6).as("score"))
  }

  // ───────────────────────── n-gram LM ─────────────────────────

  /** (doc_id, w1, w2) bigram stream. Docs under 2 tokens contribute
    * nothing (explicit length guard: Spark's `sequence(1, 0)` would
    * DESCEND, not empty). */
  def bigrams(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), expr(toks(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(__tk) - 1), " +
          "i -> struct(element_at(__tk, i) AS w1, element_at(__tk, i + 1) AS w2))"))
        .as("__bg"))
      .select(col("doc_id"), col("__bg.w1"), col("__bg.w2"))

  /** Bigram LM sufficient statistics: bigram counts, unigram
    * (context) counts, vocabulary size — all additive aggregates. */
  final case class LmModel(
      bigramCounts: DataFrame, // (w1, w2, cnt2)
      unigramCounts: DataFrame, // (w1, cnt1)
      vocab: DataFrame) // (term)

  def lmTrain(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): LmModel = {
    // The unigram table is eagerly cut (r18): one scoring pass
    // references it four ways (w2-vocab semi join, |V| count, the
    // context-count join — and historically a w1-vocab semi join too),
    // and each uncut reference re-tokenized and re-aggregated the
    // training corpus because the pruning-diverged subtrees defeat
    // ReuseExchange — the curation-manifest profile showed six full
    // document scans per cold pass. The cut is model-sized (one row
    // per vocabulary term), never corpus-sized. `bi` stays lazy: it is
    // referenced once per scoring pass.
    val uni = docs.select(explode(expr(toks(textCol))).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cnt1"))
      .localCheckpoint(true)
    val bi = bigrams(docs, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt2"))
    LmModel(bi, uni, uni.select(col("w1").as("term")))
  }

  /** Per-document average negative log-likelihood under the add-one
    * bigram model: nll = Σ −logq6((cnt2+1)/(cnt1+V)) / n_bigrams.
    * Only bigrams whose BOTH tokens are in the training vocabulary
    * score (closed-vocabulary; the join drops the rest). High avg_nll
    * = high perplexity = the CCNet "unusual text" signal. Scoring is
    * two vocab-keyed joins against model tables; the per-bigram sum is
    * exact decimal. */
  def lmPerplexity(m: LmModel, docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val v1 = m.vocab.agg(count(lit(1)).as("v")) // 1 row
    // No w1 vocab semi join (r18): the INNER unigram-count join below
    // already drops every bigram whose context word is out of
    // vocabulary (vocab IS the unigram table's key set), so the semi
    // join was a third broadcast build doing zero extra filtering.
    val bg = bigrams(docs, idCol, textCol)
      .join(m.vocab.select(col("term").as("w2")), Seq("w2"), "left_semi")
    bg.join(m.unigramCounts, Seq("w1"))
      .join(m.bigramCounts, Seq("w1", "w2"), "left")
      .crossJoin(broadcast(v1))
      .select(col("doc_id"),
        c8(lit(-1.0) * logq6((coalesce(col("cnt2"), lit(0L)) + lit(1L)).cast("double") /
          (col("cnt1") + col("v")).cast("double"))).as("__c8"))
      .groupBy("doc_id")
      .agg(sum("__c8").as("__nll_dec"), count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("__nll_dec").cast("double") / col("n_bigrams").cast("double"), 6)
          .as("avg_nll"))
  }

  // ───────────────────────── DSIR ─────────────────────────

  /** Hashed-unigram importance weights (DSIR): per doc,
    * logw = Σ_slots tf·(logq6 p_target(slot) − logq6 p_raw(slot)),
    * add-one smoothed over `buckets` hash slots. The feature space is
    * FIXED-width (buckets rows per model) regardless of vocabulary —
    * the hashing trick that lets the target/raw models broadcast at
    * any corpus size. Requires `graft_poly` registered on the session
    * ([[graft.functions.GraftFunctions.register]]). */
  def dsirLogWeights(target: DataFrame, raw: DataFrame, score: DataFrame,
      buckets: Int = 1024, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def slotTf(docs: DataFrame): DataFrame = docs
      .select(col(idCol).as("doc_id"), explode(expr(toks(textCol))).as("__tok"))
      .select(col("doc_id"), expr(s"pmod(graft_poly(__tok), $buckets)").as("slot"))
      .groupBy("doc_id", "slot").agg(count(lit(1)).as("tf"))
    def slotCounts(docs: DataFrame): DataFrame =
      slotTf(docs).groupBy("slot").agg(sum("tf").as("cnt"))
    val tc = slotCounts(target)
    val rc = slotCounts(raw)
    val tot = tc.agg(coalesce(sum("cnt"), lit(0L)).as("tot_t")).crossJoin(
      rc.agg(coalesce(sum("cnt"), lit(0L)).as("tot_r"))) // 1 row
    slotTf(score)
      .join(broadcast(tc.withColumnRenamed("cnt", "cnt_t")), Seq("slot"), "left")
      .join(broadcast(rc.withColumnRenamed("cnt", "cnt_r")), Seq("slot"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        c8(col("tf").cast("double") *
          (logq6((coalesce(col("cnt_t"), lit(0L)) + lit(1L)).cast("double") /
             (col("tot_t") + lit(buckets.toLong)).cast("double")) -
           logq6((coalesce(col("cnt_r"), lit(0L)) + lit(1L)).cast("double") /
             (col("tot_r") + lit(buckets.toLong)).cast("double")))).as("__c8"))
      .groupBy("doc_id")
      .agg(sum("__c8").as("__lw_dec"), count(lit(1)).as("n_slots"))
      .select(col("doc_id"), col("n_slots"),
        col("__lw_dec").as("logw_dec"))
  }

  // ───────────────────────── χ² association ─────────────────────────

  /** Per-term chi-square association with a boolean document class,
    * from document-frequency 2×2 tables — the classic feature-
    * selection statistic. All four cells are exact integer counts; the
    * numerator N·(ad−bc)² and denominator row/column products are
    * computed in DECIMAL(38,0) (HUGEINT in the oracle) so they stay
    * exact far past 2⁵³, and only the final ratio drops to double
    * (correctly rounded from exact integers in both engines) before
    * the 6-digit round. One presence aggregate + one vocab-sized
    * pass; no joins against the corpus. `classCol` must be a boolean
    * column on `docs`. */
  /** The χ² sufficient statistics: per-term document-frequency cells
    * (term, a = docs in class with term, b = docs outside class with
    * term) and the 1-row corpus totals (n, n_pos). Both are additive
    * aggregates — they fold (and unlearn) under the same count-table
    * discipline as the NB/LM models. */
  def chi2Counts(docs: DataFrame, classCol: Column, idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, DataFrame) = {
    // NULL class ⇒ negative, explicitly: `when(__pos,…).otherwise(…)`
    // would silently route NULLs to the otherwise-branch while a SQL
    // `FILTER (WHERE NOT __pos)` oracle excludes them entirely — the
    // b/d cells (and the ranking) would fork between engines on a
    // nullable class column. coalesce pins one semantics both can say.
    val cls = coalesce(classCol, lit(false))
    val pres = docs
      .select(col(idCol).as("doc_id"), cls.as("__pos"), explode(
        expr(s"array_distinct(${toks(textCol)})")).as("term"))
    val totals = docs.agg(
      count(lit(1)).as("n"),
      coalesce(sum(when(cls, 1L).otherwise(0L)), lit(0L)).as("n_pos")) // 1 row
    val grid = pres.groupBy("term").agg(
      coalesce(sum(when(col("__pos"), 1L).otherwise(0L)), lit(0L)).as("a"),
      coalesce(sum(when(col("__pos"), 0L).otherwise(1L)), lit(0L)).as("b"))
    (grid, totals)
  }

  /** Finish χ² from prebuilt sufficient statistics (the store-served
    * form of [[chi2Terms]]). */
  def chi2FromCounts(grid: DataFrame, totals: DataFrame,
      minDf: Long = 5L): DataFrame = {
    val d38 = "decimal(38,0)"
    grid.crossJoin(broadcast(totals))
      .filter(col("a") + col("b") >= minDf)
      .withColumn("c", col("n_pos") - col("a"))
      .withColumn("d", col("n") - col("n_pos") - col("b"))
      .withColumn("__diff",
        col("a").cast(d38) * col("d").cast(d38) -
          col("b").cast(d38) * col("c").cast(d38))
      .withColumn("__num", col("n").cast(d38) * col("__diff") * col("__diff"))
      .withColumn("__den",
        (col("a") + col("b")).cast(d38) * (col("c") + col("d")).cast(d38) *
          (col("a") + col("c")).cast(d38) * (col("b") + col("d")).cast(d38))
      .filter(col("__den") > 0)
      .select(col("term"), col("a").as("df_pos"), col("b").as("df_neg"),
        round(col("__num").cast("double") / col("__den").cast("double"), 6)
          .as("chi2"))
  }

  def chi2Terms(docs: DataFrame, classCol: Column, idCol: String = "doc_id",
      textCol: String = "text", minDf: Long = 5L): DataFrame = {
    val (grid, totals) = chi2Counts(docs, classCol, idCol, textCol)
    chi2FromCounts(grid, totals, minDf)
  }
}
