package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Classify

class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ── Naive Bayes ──

  test("NB separates disjoint-vocabulary classes and matches the hand-computed smoothed score") {
    val train = Seq(
      (1L, "cat cat dog", "animal"),
      (2L, "dog cat", "animal"),
      (3L, "bolt nut nut", "hardware"),
      (4L, "nut bolt bolt", "hardware"))
      .toDF("doc_id", "text", "label")
    val m = Classify.nbTrain(train)
    val score = Seq((10L, "cat dog cat"), (11L, "bolt nut")).toDF("doc_id", "text")
    val preds = Classify.nbPredict(
      Classify.nbScores(Classify.nbLogProbs(m), Classify.nbPriors(m), score))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds === Map(10L -> "animal", 11L -> "hardware"))

    // hand-check one joint log-likelihood cell: doc 11 under "hardware".
    // vocab = {cat, dog, bolt, nut} → V=4; hardware totals: 6 tokens.
    // p(bolt|hw) = (3+1)/(6+4) = 0.4 ; p(nut|hw) = (3+1)/10 = 0.4
    // prior(hw) = 2/4 = 0.5
    // score = q6(ln .5) + 1·q6(ln .4) + 1·q6(ln .4)
    def q6(x: Double) = BigDecimal(math.log(x)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = BigDecimal(q6(0.5) + q6(0.4) + q6(0.4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Classify.nbScores(Classify.nbLogProbs(m), Classify.nbPriors(m), score)
      .filter(col("doc_id") === 11L && col("label") === "hardware")
      .select(round(col("__score_dec").cast("double"), 6)).as[Double].head()
    assert(got === want)
  }

  test("NB out-of-vocabulary tokens drop; all-OOV docs disappear") {
    val train = Seq((1L, "aa bb", "x"), (2L, "cc dd", "y")).toDF("doc_id", "text", "label")
    val m = Classify.nbTrain(train)
    val score = Seq((10L, "aa zz"), (11L, "zz qq")).toDF("doc_id", "text")
    val preds = Classify.nbPredict(
      Classify.nbScores(Classify.nbLogProbs(m), Classify.nbPriors(m), score))
    // doc 10 scores on "aa" alone (n_terms=1); doc 11 has no in-vocab
    // tokens and must drop rather than score on the prior only
    val rows = preds.collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(rows === Map(10L -> 1L))
  }

  // ── bigram LM ──

  test("bigrams: explicit length guard — 0- and 1-token docs contribute nothing") {
    val docs = Seq((1L, "one"), (2L, " "), (3L, "a b c")).toDF("doc_id", "text")
    val bg = Classify.bigrams(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(bg.toSet === Set((3L, "a", "b"), (3L, "b", "c")))
  }

  test("LM perplexity: an unseen-bigram doc scores higher avg_nll than a memorized one") {
    val train = Seq.tabulate(8)(i => (i.toLong, "the quick fox jumps")).toDF("doc_id", "text")
    val m = Classify.lmTrain(train)
    // both test docs use only in-vocab tokens; doc 21 chains them in an
    // order never seen in training
    val test_ = Seq((20L, "the quick fox jumps"), (21L, "jumps fox quick the"))
      .toDF("doc_id", "text")
    val nll = Classify.lmPerplexity(m, test_).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(21L) > nll(20L))
    assert(nll.keySet === Set(20L, 21L))
  }

  // ── DSIR ──

  test("DSIR importance weights rank the target-like doc first") {
    graft.functions.GraftFunctions.register(spark)
    val target = Seq.tabulate(6)(i => (i.toLong, "alpha beta gamma")).toDF("doc_id", "text")
    val raw = target.union(
      Seq.tabulate(6)(i => (100L + i, "delta epsilon zeta")).toDF("doc_id", "text"))
    val score = Seq((200L, "alpha beta"), (201L, "delta epsilon")).toDF("doc_id", "text")
    val w = Classify.dsirLogWeights(target, raw, score)
      .select(col("doc_id"), col("logw_dec").cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(200L) > w(201L))
    // target tokens are ~2x as frequent in target as in raw → positive
    // log-ratio; off-target tokens are absent from target → negative
    assert(w(200L) > 0 && w(201L) < 0)
  }

  // ── chi2 ──

  test("chi2: a perfect class marker maxes the statistic; an uninformative term scores 0") {
    val docs = (Seq.tabulate(10)(i => (i.toLong, "marker filler", true)) ++
      Seq.tabulate(10)(i => (10L + i, "other filler", false)))
      .toDF("doc_id", "text", "pos")
    val got = Classify.chi2Terms(docs, col("pos"), minDf = 1L)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // marker: a=10 b=0 c=0 d=10 → chi2 = N = 20 (perfect association)
    assert(got("marker") === ((10L, 0L, 20.0)))
    assert(got("other") === ((0L, 10L, 20.0)))
    // filler appears in every doc → c+d = 0 → den=0 row is excluded
    assert(!got.contains("filler"))
  }

  test("chi2 2x2 arithmetic matches the textbook formula on an asymmetric table") {
    // 3 pos docs with term, 1 neg with term, 2 pos without, 4 neg without
    val docs = (
      Seq.tabulate(3)(i => (i.toLong, "t x", true)) ++
      Seq((3L, "t x", false)) ++
      Seq.tabulate(2)(i => (4L + i, "y x", true)) ++
      Seq.tabulate(4)(i => (6L + i, "y x", false))
    ).toDF("doc_id", "text", "pos")
    val got = Classify.chi2Terms(docs, col("pos"), minDf = 1L)
      .filter(col("term") === "t").select("chi2").as[Double].head()
    val (a, b, c, d) = (3.0, 1.0, 2.0, 4.0); val n = 10.0
    val want = BigDecimal(n * math.pow(a * d - b * c, 2) /
        ((a + b) * (c + d) * (a + c) * (b + d)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === want)
  }

  // ── model-fold property: NB sufficient statistics are additive ──

  test("NB model folds: training on batch1 ∪ batch2 == summing per-batch count tables") {
    val b1 = Seq((1L, "a b a", "x"), (2L, "c", "y")).toDF("doc_id", "text", "label")
    val b2 = Seq((3L, "a c", "x"), (4L, "b b", "y")).toDF("doc_id", "text", "label")
    val whole = Classify.nbTrain(b1.union(b2))
    val m1 = Classify.nbTrain(b1); val m2 = Classify.nbTrain(b2)
    val foldedCond = m1.condCounts.union(m2.condCounts)
      .groupBy("label", "term").agg(sum("cnt").as("cnt"))
    val foldedStats = m1.classStats.union(m2.classStats)
      .groupBy("label").agg(sum("total_c").as("total_c"), sum("n_docs_c").as("n_docs_c"))
    assert(foldedCond.except(whole.condCounts).isEmpty &&
      whole.condCounts.except(foldedCond).isEmpty)
    assert(foldedStats.except(whole.classStats).isEmpty &&
      whole.classStats.except(foldedStats).isEmpty)
  }

  // ── Cohen's kappa: textbook values land exactly ──

  private def kappaRow(cells: Seq[(String, String, Long)]) =
    Classify.agreementStats(cells.toDF("true_lang", "pred_lang", "n"))
      .select("n_docs", "n_agree", "po_ppm", "pe_ppm", "kappa_ppm")
      .as[(Long, Long, Long, Long, Long)].head()

  test("agreementStats: textbook 2x2 kappa = 0.4 exactly") {
    // N=50, A=35, po=0.7; marginals 25/25 vs 30/20 -> pe=0.5; k=0.4
    val got = kappaRow(Seq(("a", "a", 20L), ("a", "b", 5L),
      ("b", "a", 10L), ("b", "b", 15L)))
    assert(got === ((50L, 35L, 700000L, 500000L, 400000L)))
  }

  test("agreementStats: perfect agreement is kappa = 1, independence is 0, inversion is negative") {
    assert(kappaRow(Seq(("a", "a", 7L), ("b", "b", 3L)))._5 === 1000000L)
    // exact independence: cm = outer product of the marginals
    // marginals 1/2,1/2 both sides; po = pe = 1/2 -> k = 0
    assert(kappaRow(Seq(("a", "a", 5L), ("a", "b", 5L),
      ("b", "a", 5L), ("b", "b", 5L)))._5 === 0L)
    // total inversion of the 50/50 matrix: po=0, pe=1/2 -> k=-1
    assert(kappaRow(Seq(("a", "b", 5L), ("b", "a", 5L)))._5 === -1000000L)
  }

  test("agreementStats: single-class matrix reports the -2e6 sentinel, never NULL") {
    val got = kappaRow(Seq(("a", "a", 9L)))
    assert(got._5 === -2000000L && got._3 === 1000000L && got._4 === 1000000L)
  }

  test("prfStats: textbook per-class values land exactly; never-predicted class gets the sentinel") {
    // cm [[20,5],[10,15]]: class a P=20/30, R=20/25, F1=40/55
    val rows = Classify.prfStats(Seq(("a", "a", 20L), ("a", "b", 5L),
        ("b", "a", 10L), ("b", "b", 15L)).toDF("true_lang", "pred_lang", "n"))
      .collect().map(r => (r.getString(0), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(rows(0) === (("a", 666667L, 800000L, 727273L)))
    assert(rows(1) === (("b", 750000L, 600000L, 666667L)))
    // class never predicted: precision sentinel, recall 0, f1 defined
    val c = Classify.prfStats(Seq(("c", "a", 4L), ("a", "a", 6L))
        .toDF("true_lang", "pred_lang", "n"))
      .filter(col("label") === "c")
      .select("precision_ppm", "recall_ppm", "f1_ppm")
      .as[(Long, Long, Long)].head()
    assert(c === ((-1L, 0L, 0L)))
  }

  test("prfStats/agreementStats: duplicate (true, pred) cells are re-aggregated, not inflated") {
    // the same textbook matrix delivered as duplicate per-cell rows:
    // the internal cell re-aggregation must make it identical to the
    // one-row-per-cell form (previously the un-aggregated diagonal
    // join silently duplicated marginal rows and inflated tp/n_docs)
    val clean = Seq(("a", "a", 20L), ("a", "b", 5L),
      ("b", "a", 10L), ("b", "b", 15L)).toDF("true_lang", "pred_lang", "n")
    val dup = Seq(("a", "a", 12L), ("a", "a", 8L), ("a", "b", 5L),
      ("b", "a", 10L), ("b", "b", 7L), ("b", "b", 8L))
      .toDF("true_lang", "pred_lang", "n")
    assert(Classify.prfStats(dup).orderBy("label").collect().toSeq ===
      Classify.prfStats(clean).orderBy("label").collect().toSeq)
    assert(Classify.agreementStats(dup).collect().toSeq ===
      Classify.agreementStats(clean).collect().toSeq)
  }
}
