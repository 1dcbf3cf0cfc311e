package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Classify
import graft.sources.Tables

/** Model-based corpus curation over `documents` (SURVEY §7.5): the
  * statistical filters an LLM data pipeline runs between dedup and
  * tokenization — a trained quality/language classifier, an n-gram LM
  * perplexity filter (CCNet), hashed importance weighting for targeted
  * selection (DSIR), and χ² feature selection. Every model is trained
  * IN the query from a deterministic split of the fixture corpus and
  * every scoring rule is quantized-exact (see [[Classify]]), so the
  * DuckDB oracles replay training + inference end-to-end.
  */
object CurationQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  private val dkToks = TextDedupQueries.dkTokens
  private def dkPoly(e: String) = TextDedupQueries.dkPoly(e)

  /** logq6 in DuckDB: ln → DECIMAL(18,12) → 6 digits → DOUBLE. */
  private def dkLogq6(e: String) =
    s"round((ln($e))::DECIMAL(18,12), 6)::DOUBLE"
  /** c8 in DuckDB: DOUBLE → DECIMAL(18,12) → 8 digits → DECIMAL(18,8). */
  private def dkC8(e: String) =
    s"round(($e)::DECIMAL(18,12), 8)::DECIMAL(18,8)"

  /** CTE prefix replaying NB training + holdout scoring end-to-end
    * (terminal CTE `fin`: one scored (doc, label) row each). Shared by
    * the prediction and confusion-matrix oracles. */
  private def dkNbCtes =
    s"""train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
       |hold AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
       |ttk AS (SELECT lang, unnest($dkToks) AS term FROM train),
       |cond AS (SELECT lang, term, count(*) AS cnt FROM ttk GROUP BY 1, 2),
       |cst AS (SELECT lang, count(*) AS total_c FROM ttk GROUP BY 1),
       |cdoc AS (SELECT lang, count(*) AS ndc FROM train GROUP BY 1),
       |nd AS (SELECT count(*) AS n FROM train),
       |vocab AS (SELECT DISTINCT term FROM ttk),
       |vs AS (SELECT count(*) AS v FROM vocab),
       |model AS (SELECT cs.lang, vb.term,
       |    ${dkC8(dkLogq6("(coalesce(cc.cnt, 0) + 1)::DOUBLE / (cs.total_c + vs.v)::DOUBLE"))} AS lp8
       |  FROM vocab vb CROSS JOIN cst cs CROSS JOIN vs
       |  LEFT JOIN cond cc ON cc.term = vb.term AND cc.lang = cs.lang),
       |pri AS (SELECT lang,
       |    ${dkC8(dkLogq6("ndc::DOUBLE / n::DOUBLE"))} AS lprior8
       |  FROM cdoc CROSS JOIN nd),
       |htk AS (SELECT doc_id, lang AS true_lang, unnest($dkToks) AS term FROM hold),
       |htf AS (SELECT doc_id, true_lang, term, count(*) AS tf FROM htk GROUP BY 1, 2, 3),
       |contrib AS (SELECT h.doc_id, h.true_lang, m.lang,
       |    h.tf * m.lp8 AS c8
       |  FROM htf h JOIN model m USING (term)),
       |sc AS (SELECT doc_id, true_lang, lang, sum(c8) AS ll, count(*) AS n_terms
       |  FROM contrib GROUP BY 1, 2, 3),
       |fin AS (SELECT sc.doc_id, sc.true_lang, sc.lang,
       |    sc.ll + p.lprior8 AS sd, sc.n_terms
       |  FROM sc JOIN pri p ON p.lang = sc.lang)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ── Multinomial Naive Bayes language classifier ──
    //    Train on doc_id % 5 != 0, predict `lang` on the % 5 == 0
    //    holdout — the fastText-style quality/language-ID filter shape.
    //    The model is three additive aggregates (vocab-sized), scoring
    //    is a term-keyed join of holdout postings against the smoothed
    //    log-prob grid; argmax ties break on exact decimal scores.
    QueryDef(
      "nb_train_classify",
      "multinomial NB: train lang classifier on 4/5 split, predict holdout",
      (s, d) => {
        val docs = t(s, d, "documents")
        val train = docs.filter(col("doc_id") % 5 =!= 0)
        val hold = docs.filter(col("doc_id") % 5 === 0)
        val m = Classify.nbTrain(train, "doc_id", "text", "lang")
        val preds = Classify.nbPredict(
          Classify.nbScores(Classify.nbLogProbs(m), Classify.nbPriors(m), hold))
        preds.join(hold.select(col("doc_id"), col("lang").as("true_lang")), Seq("doc_id"))
          .select(col("doc_id"), col("true_lang"),
            col("pred_label").as("pred_lang"), col("score"), col("n_terms"))
      },
      Some(s"""WITH $dkNbCtes
              |SELECT doc_id, true_lang, lang AS pred_lang,
              |  round(sd::DOUBLE, 6) AS score, n_terms
              |FROM fin QUALIFY row_number() OVER (PARTITION BY doc_id
              |  ORDER BY sd DESC, lang) = 1""".stripMargin),
      bench = true),

    // ── Classifier quality eval: the confusion matrix of the NB
    //    holdout predictions — the accuracy surface a curation
    //    pipeline monitors before trusting a filter model. K²-row
    //    output from the same scored frame; no extra corpus pass. ──
    QueryDef(
      "eval_confusion_nb",
      "NB holdout confusion matrix: (true_lang, pred_lang, n)",
      (s, d) => {
        val docs = t(s, d, "documents")
        val train = docs.filter(col("doc_id") % 5 =!= 0)
        val hold = docs.filter(col("doc_id") % 5 === 0)
        val m = Classify.nbTrain(train, "doc_id", "text", "lang")
        Classify.nbPredict(
            Classify.nbScores(Classify.nbLogProbs(m), Classify.nbPriors(m), hold))
          .join(hold.select(col("doc_id"), col("lang").as("true_lang")), Seq("doc_id"))
          .groupBy(col("true_lang"), col("pred_label").as("pred_lang"))
          .agg(count(lit(1)).as("n"))
      },
      Some(s"""WITH $dkNbCtes,
              |pred AS (SELECT doc_id, true_lang, lang AS pred_lang FROM fin
              |  QUALIFY row_number() OVER (PARTITION BY doc_id
              |    ORDER BY sd DESC, lang) = 1)
              |SELECT true_lang, pred_lang, count(*) AS n
              |FROM pred GROUP BY 1, 2""".stripMargin)),

    // ── Bigram LM perplexity (the CCNet quality filter) ──
    //    Add-one bigram model trained on the 4/5 split; the holdout's
    //    20 highest average-NLL (most "unusual") documents — what a
    //    CCNet-style pipeline would route to the tail quality bucket.
    QueryDef(
      "txt_lm_perplexity",
      "bigram-LM avg negative log-likelihood: 20 most perplexing holdout docs",
      (s, d) => {
        val docs = t(s, d, "documents")
        val train = docs.filter(col("doc_id") % 5 =!= 0)
        val hold = docs.filter(col("doc_id") % 5 === 0)
        Classify.lmPerplexity(Classify.lmTrain(train), hold)
          .orderBy(desc("avg_nll"), asc("doc_id")).limit(20)
      },
      Some(s"""WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
              |hold AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
              |uni AS (SELECT w1, count(*) AS cnt1 FROM
              |    (SELECT unnest($dkToks) AS w1 FROM train) GROUP BY 1),
              |vs AS (SELECT count(*) AS v FROM uni),
              |tbg AS (SELECT tk[i] AS w1, tk[i + 1] AS w2 FROM
              |    (SELECT $dkToks AS tk FROM train WHERE len($dkToks) >= 2),
              |    unnest(range(1, len(tk))) AS r(i)),
              |bi AS (SELECT w1, w2, count(*) AS cnt2 FROM tbg GROUP BY 1, 2),
              |hbg AS (SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM
              |    (SELECT doc_id, $dkToks AS tk FROM hold WHERE len($dkToks) >= 2),
              |    unnest(range(1, len(tk))) AS r(i)),
              |hbv AS (SELECT doc_id, w1, w2 FROM hbg
              |  WHERE w1 IN (SELECT w1 FROM uni) AND w2 IN (SELECT w1 FROM uni)),
              |con AS (SELECT h.doc_id,
              |    ${dkC8("-1.0::DOUBLE * " + dkLogq6(
                     "(coalesce(b.cnt2, 0) + 1)::DOUBLE / (u.cnt1 + vs.v)::DOUBLE"))} AS c8
              |  FROM hbv h JOIN uni u USING (w1)
              |  LEFT JOIN bi b ON b.w1 = h.w1 AND b.w2 = h.w2
              |  CROSS JOIN vs),
              |agg AS (SELECT doc_id, sum(c8) AS nd, count(*) AS n_bigrams
              |  FROM con GROUP BY 1)
              |SELECT doc_id, n_bigrams,
              |  round(nd::DOUBLE / n_bigrams::DOUBLE, 6) AS avg_nll
              |FROM agg ORDER BY avg_nll DESC, doc_id LIMIT 20""".stripMargin),
      bench = true),

    // ── DSIR hashed importance selection ──
    //    Importance weight of each holdout doc toward the lang='en'
    //    target distribution over 1024 hashed unigram slots
    //    (fixed-width models → broadcast at any corpus size); the 20
    //    most target-like docs, ranked on exact decimal log-weights.
    QueryDef(
      "curate_dsir_select",
      "DSIR hashed-unigram importance weights: top-20 docs toward lang='en'",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val docs = t(s, d, "documents")
        val train = docs.filter(col("doc_id") % 5 =!= 0)
        val hold = docs.filter(col("doc_id") % 5 === 0)
        Classify.dsirLogWeights(train.filter(col("lang") === "en"), train, hold)
          .orderBy(desc("logw_dec"), asc("doc_id")).limit(20)
          .select(col("doc_id"), col("n_slots"),
            round(col("logw_dec").cast("double"), 6).as("logw"))
      },
      Some(s"""WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
              |hold AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
              |tc AS (SELECT slot, count(*) AS cnt_t FROM
              |    (SELECT ${dkPoly("tok")} % 1024 AS slot FROM
              |      (SELECT unnest($dkToks) AS tok FROM train WHERE lang = 'en'))
              |  GROUP BY 1),
              |rc AS (SELECT slot, count(*) AS cnt_r FROM
              |    (SELECT ${dkPoly("tok")} % 1024 AS slot FROM
              |      (SELECT unnest($dkToks) AS tok FROM train))
              |  GROUP BY 1),
              |tt AS (SELECT (SELECT coalesce(sum(cnt_t), 0) FROM tc) AS tot_t,
              |    (SELECT coalesce(sum(cnt_r), 0) FROM rc) AS tot_r),
              |htf AS (SELECT doc_id, slot, count(*) AS tf FROM
              |    (SELECT doc_id, ${dkPoly("tok")} % 1024 AS slot FROM
              |      (SELECT doc_id, unnest($dkToks) AS tok FROM hold))
              |  GROUP BY 1, 2),
              |con AS (SELECT doc_id,
              |    ${dkC8("tf::DOUBLE * (" +
                     dkLogq6("(coalesce(cnt_t, 0) + 1)::DOUBLE / (tot_t + 1024)::DOUBLE") +
                     " - " +
                     dkLogq6("(coalesce(cnt_r, 0) + 1)::DOUBLE / (tot_r + 1024)::DOUBLE") + ")")} AS c8
              |  FROM htf LEFT JOIN tc USING (slot) LEFT JOIN rc USING (slot)
              |  CROSS JOIN tt),
              |agg AS (SELECT doc_id, sum(c8) AS lw, count(*) AS n_slots
              |  FROM con GROUP BY 1)
              |SELECT doc_id, n_slots, round(lw::DOUBLE, 6) AS logw
              |FROM agg ORDER BY lw DESC, doc_id LIMIT 20""".stripMargin)),

    // ── χ² token–class association (feature selection) ──
    //    Document-frequency 2×2 tables vs the lang='en' class; exact
    //    DECIMAL(38,0)/HUGEINT numerators and denominators, double
    //    only at the final correctly-rounded ratio. The 20 strongest
    //    class markers — what a feature-selected classifier keeps.
    QueryDef(
      "txt_token_chi2",
      "chi-square token-class association vs lang='en': top-20 marker terms",
      (s, d) =>
        Classify.chi2Terms(t(s, d, "documents"), col("lang") === "en")
          .orderBy(desc("chi2"), asc("term")).limit(20),
      Some(s"""WITH pres AS (SELECT doc_id, lang = 'en' AS is_pos,
              |    unnest(list_distinct($dkToks)) AS term FROM documents),
              |tot AS (SELECT count(*) AS n,
              |    count(*) FILTER (WHERE lang = 'en') AS n_pos FROM documents),
              |grid AS (SELECT term,
              |    count(*) FILTER (WHERE is_pos) AS a,
              |    count(*) FILTER (WHERE NOT is_pos) AS b
              |  FROM pres GROUP BY 1),
              |f AS (SELECT term, a, b, n_pos - a AS c, n - n_pos - b AS d, n
              |  FROM grid CROSS JOIN tot WHERE a + b >= 5),
              |x AS (SELECT term, a, b,
              |    (n::HUGEINT * (a::HUGEINT * d::HUGEINT - b::HUGEINT * c::HUGEINT)
              |      * (a::HUGEINT * d::HUGEINT - b::HUGEINT * c::HUGEINT)) AS num,
              |    ((a + b)::HUGEINT * (c + d)::HUGEINT
              |      * (a + c)::HUGEINT * (b + d)::HUGEINT) AS den
              |  FROM f)
              |SELECT term, a AS df_pos, b AS df_neg,
              |  round(num::DOUBLE / den::DOUBLE, 6) AS chi2
              |FROM x WHERE den > 0
              |ORDER BY chi2 DESC, term LIMIT 20""".stripMargin))
  )
}
