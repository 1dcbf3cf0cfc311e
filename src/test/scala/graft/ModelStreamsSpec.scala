package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Classify
import graft.streaming.ModelStreams

class ModelStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val d = "/root/testdata/sf0.001"

  private def fixtureDocs() =
    graft.sources.Tables(spark, d, "documents")
      .select(col("doc_id"), col("text"), col("lang").as("label"))

  private def predictions(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Double)] =
    df.select("doc_id", "pred_label", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("nbServe (single-agg scaled-integer path) == batch nbPredict incl. scores; one-agg plan") {
    val docs = fixtureDocs()
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val probe = docs.filter(col("doc_id") % 5 === 0).select("doc_id", "text")
    val m = Classify.nbTrain(train)
    val lp = Classify.nbLogProbs(m).localCheckpoint(true)
    val batch = predictions(Classify.nbPredict(
      Classify.nbScores(lp, Classify.nbPriors(m), probe)))
    val served = Classify.nbServe(probe, Classify.nbImpact(lp),
      Classify.nbPriorMap(Classify.nbPriors(m)))
    assert(predictions(served) === batch)
    assert(batch.nonEmpty)
    // serving is ONE aggregation (streaming-legal): ObjectHashAggregate
    // over the K-entry label-sum map, no Window, no per-doc sort
    val pp = served.queryExecution.executedPlan.toString
    assert(pp.contains("ObjectHashAggregate"), pp)
    assert(!pp.contains("Window"), pp)
    // ... and the batch argmax is itself aggregate-shaped (min-struct),
    // not a window: map-side combinable at any fan-in
    val bp = Classify.nbPredict(
      Classify.nbScores(lp, Classify.nbPriors(m), probe))
      .queryExecution.executedPlan.toString
    assert(!bp.contains("Window"), bp)
  }

  test("two-batch nbModelIngest fold == batch-trained model; replay is a no-op; streamed probe == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tbl = java.nio.file.Files.createTempDirectory("graft_nbstore").toString

    val all = fixtureDocs().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val (b1, b2) = all.partition(_._1 % 2 == 0)

    val mem = MemoryStream[(Long, String, String)]
    val q = ModelStreams.nbModelIngest(
      mem.toDF().toDF("doc_id", "text", "label"), tbl)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(graft.operators.Lakehouse.currentVersion(spark, tbl) === Some("v1"))

    // folded sufficient statistics == one-shot training on the union
    val whole = Classify.nbTrain(fixtureDocs())
    val stored = ModelStreams.nbModelFromStore(spark, tbl)
    assert(stored.condCounts.except(whole.condCounts).isEmpty &&
      whole.condCounts.except(stored.condCounts).isEmpty)
    assert(stored.classStats.except(whole.classStats).isEmpty &&
      whole.classStats.except(stored.classStats).isEmpty)

    // replaying an already-committed batch id must not re-fold (the
    // crash-between-swing-and-commit redelivery): store is unchanged
    val before = stored.condCounts.agg(sum("cnt")).head().getLong(0)
    ModelStreams.foldNbBatch(
      b2.toDF("doc_id", "text", "label"), tbl, 1L)
    assert(graft.operators.Lakehouse.currentVersion(spark, tbl) === Some("v1"))
    assert(ModelStreams.nbModelFromStore(spark, tbl)
      .condCounts.agg(sum("cnt")).head().getLong(0) === before)

    // ONLINE serving from the pinned store == batch nbPredict of the
    // union-trained model, scores included
    val probe = fixtureDocs().filter(col("doc_id") % 5 === 0).select("doc_id", "text")
    val want = predictions(Classify.nbPredict(Classify.nbScores(
      Classify.nbLogProbs(whole), Classify.nbPriors(whole), probe)))
    assert(predictions(ModelStreams.nbServeFromStore(probe, tbl)) === want)

    // ... and a STREAMED probe frame through the same serve path
    // yields the same classifications
    val pm = MemoryStream[(Long, String)]
    val out = ModelStreams.nbServeFromStore(
      pm.toDF().toDF("doc_id", "text"), tbl)
    val q2 = out.writeStream.outputMode("update")
      .format("memory").queryName("graft_nbserve_test").start()
    val streamed =
      try {
        pm.addData(probe.collect().map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
        q2.processAllAvailable()
        predictions(spark.table("graft_nbserve_test"))
      } finally q2.stop()
    assert(streamed === want)
  }

  test("continuous eval: folded confusion store == one-shot matrix; kappa served off CURRENT") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val nbDir = java.nio.file.Files.createTempDirectory("graft_nb_eval_m").toString
    val evalDir = java.nio.file.Files.createTempDirectory("graft_nb_eval_cm").toString

    // train on the 4/5 split, monitor the holdout in two micro-batches
    val train = fixtureDocs().filter(col("doc_id") % 5 =!= 0)
    val hold = fixtureDocs().filter(col("doc_id") % 5 === 0)
    ModelStreams.foldNbBatch(train, nbDir, 0L)
    val rows = hold.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val (h1, h2) = rows.partition(_._1 % 2 == 0)
    val mem = MemoryStream[(Long, String, String)]
    val q = ModelStreams.evalIngest(
      mem.toDF().toDF("doc_id", "text", "label"), nbDir, evalDir)
    try {
      mem.addData(h1: _*); q.processAllAvailable()
      mem.addData(h2: _*); q.processAllAvailable()
    } finally q.stop()

    // accumulated matrix == one-shot serve over the whole holdout
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = cells(ModelStreams.nbServeFromStore(hold.select("doc_id", "text"), nbDir)
      .join(hold.select(col("doc_id"), col("label").as("true_label")), Seq("doc_id"))
      .groupBy("true_label", "pred_label").agg(count(lit(1)).as("n"))
      .select("true_label", "pred_label", "n"))
    val stored = graft.operators.Lakehouse.readCurrent(spark, evalDir, "cm")
      .select("true_label", "pred_label", "n")
    assert(cells(stored) === want)
    assert(want.nonEmpty)

    // the served scalars == agreementStats over the one-shot matrix,
    // and replaying a committed batch id leaves them untouched
    def scalars(df: org.apache.spark.sql.DataFrame) =
      df.select("n_docs", "n_agree", "po_ppm", "pe_ppm", "kappa_ppm")
        .as[(Long, Long, Long, Long, Long)].head()
    val served = scalars(ModelStreams.agreementFromStore(spark, evalDir))
    ModelStreams.foldEvalBatch(h2.toDF("doc_id", "text", "label"), nbDir, evalDir, 1L)
    assert(scalars(ModelStreams.agreementFromStore(spark, evalDir)) === served)
    assert(served._1 === rows.size.toLong) // every holdout doc scored on these fixtures

    // per-class P/R/F1 served off the same store == prfStats over the
    // one-shot matrix
    def prf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4),
        r.getLong(5), r.getLong(6))).toSet
    val wantPrf = prf(Classify.prfStats(
      ModelStreams.nbServeFromStore(hold.select("doc_id", "text"), nbDir)
        .join(hold.select(col("doc_id"), col("label").as("true_label")), Seq("doc_id"))
        .groupBy("true_label", "pred_label").agg(count(lit(1)).as("n")),
      "true_label", "pred_label", "n"))
    assert(prf(ModelStreams.prfFromStore(spark, evalDir)) === wantPrf)

    // the time series: one cumulative snapshot per retained version,
    // newest row == the CURRENT scalars, doc counts strictly growing
    val hist = ModelStreams.agreementHistory(spark, evalDir)
      .orderBy("version").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(5)))
    assert(hist.map(_._1).toSeq === Seq("v0", "v1"))
    assert(hist.last._2 === served._1 && hist.last._3 === served._5)
    assert(hist.head._2 < hist.last._2)
  }

  test("ArgmaxSumAgg merge laws: any partitioning of the input stream yields the same argmax") {
    // the map-side-combine guarantee: reduce/merge must commute and
    // associate so the K-entry label-sum state gives one answer under
    // ANY split of rows across partitions — checked against a plain
    // sequential fold, with deliberate ties (few labels, coarse sums)
    val rnd = new scala.util.Random(11)
    val priors = Map("a" -> 7L, "b" -> -3L, "c" -> 0L)
    val agg = new Classify.ArgmaxSumAgg(priors)
    (1 to 50).foreach { trial =>
      val rows = Seq.fill(200)(
        (Seq("a", "b", "c", "d")(rnd.nextInt(4)), (rnd.nextInt(5) - 2).toLong))
      val seq = rows.foldLeft(agg.zero)(agg.reduce)
      val nParts = 1 + rnd.nextInt(7)
      val merged = rows.grouped(rows.size / nParts + 1)
        .map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) === agg.finish(seq), s"trial $trial")
      // and the winner really is (max prior-adjusted sum, min label)
      val adj = seq.map { case (l, s) => (l, s + priors.getOrElse(l, 0L)) }
      val want = adj.toSeq.sortBy { case (l, s) => (-s, l) }.head
      assert(agg.finish(seq) === want, s"trial $trial")
    }
  }

  test("model-store retention: vacuumKeep retires old versions after each fold, CURRENT intact") {
    val tbl = java.nio.file.Files.createTempDirectory("graft_nbvac").toString
    val docs = fixtureDocs()
    ModelStreams.foldNbBatch(docs.filter(col("doc_id") % 3 === 0), tbl, 0L, vacuumKeep = 1)
    ModelStreams.foldNbBatch(docs.filter(col("doc_id") % 3 === 1), tbl, 1L, vacuumKeep = 1)
    ModelStreams.foldNbBatch(docs.filter(col("doc_id") % 3 === 2), tbl, 2L, vacuumKeep = 1)
    assert(graft.operators.Lakehouse.currentVersion(spark, tbl) === Some("v2"))
    assert(graft.operators.Lakehouse.listVersions(spark, tbl) === Seq("v2"))
    // the retained model is the full 3-batch fold
    val whole = Classify.nbTrain(docs)
    val stored = ModelStreams.nbModelFromStore(spark, tbl)
    assert(stored.condCounts.except(whole.condCounts).isEmpty &&
      whole.condCounts.except(stored.condCounts).isEmpty)
  }

  test("exact unlearning: negative fold == retrain on survivors; tripwire on never-trained rows") {
    val tbl = java.nio.file.Files.createTempDirectory("graft_nbunlearn").toString
    val docs = fixtureDocs()
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 =!= 0)
    ModelStreams.foldNbBatch(b1, tbl, 0L)
    ModelStreams.foldNbBatch(b2, tbl, 1L)

    // right-to-be-forgotten: every doc with doc_id % 10 == 1 leaves
    val forget = docs.filter(col("doc_id") % 10 === 1)
    ModelStreams.unlearnNbBatch(forget, tbl, 2L)
    val survivors = docs.filter(col("doc_id") % 10 =!= 1)
    val want = Classify.nbTrain(survivors)
    val got = ModelStreams.nbModelFromStore(spark, tbl)
    assert(got.condCounts.except(want.condCounts).isEmpty &&
      want.condCounts.except(got.condCounts).isEmpty)
    assert(got.classStats.except(want.classStats).isEmpty &&
      want.classStats.except(got.classStats).isEmpty)

    // served classifications after the unlearn == batch predictions of
    // the survivor-retrained model
    val probe = docs.filter(col("doc_id") % 5 === 0).select("doc_id", "text")
    val wantPred = predictions(Classify.nbPredict(Classify.nbScores(
      Classify.nbLogProbs(want), Classify.nbPriors(want), probe)))
    assert(predictions(ModelStreams.nbServeFromStore(probe, tbl)) === wantPred)

    // unlearning rows never folded in must abort LOUDLY before the
    // swing: counts would go negative
    import spark.implicits._
    val alien = Seq((999999L, "zzz_never_trained zzz_never_trained", "xx"))
      .toDF("doc_id", "text", "label")
    intercept[IllegalArgumentException] {
      ModelStreams.unlearnNbBatch(alien, tbl, 3L)
    }
    // ... and the store is still on the pre-abort version
    assert(graft.operators.Lakehouse.currentVersion(spark, tbl) === Some("v2"))
    // ... with NO torn v3 dir: subtables write into a dot-prefixed tmp
    // that only renames to v3 after every tripwire passes, so retention
    // counting (listVersions/vacuum) and time-travel readVersion can
    // never see the aborted fold — and no stray tmp is orphaned either
    assert(graft.operators.Lakehouse.listVersions(spark, tbl) === Seq("v0", "v1", "v2"))
    assert(!new java.io.File(s"$tbl/v3").exists && !new java.io.File(s"$tbl/.v3.tmp").exists)

    // LM twin: fold-all then unlearn the same cohort == retrain
    val ltbl = java.nio.file.Files.createTempDirectory("graft_lmunlearn").toString
    val dtext = docs.select("doc_id", "text")
    ModelStreams.foldLmBatch(dtext, ltbl, 0L)
    ModelStreams.unlearnLmBatch(dtext.filter(col("doc_id") % 10 === 1), ltbl, 1L)
    val lwant = Classify.lmTrain(dtext.filter(col("doc_id") % 10 =!= 1))
    val lgot = ModelStreams.lmModelFromStore(spark, ltbl)
    assert(lgot.bigramCounts.except(lwant.bigramCounts).isEmpty &&
      lwant.bigramCounts.except(lgot.bigramCounts).isEmpty)
    assert(lgot.unigramCounts.except(lwant.unigramCounts).isEmpty &&
      lwant.unigramCounts.except(lgot.unigramCounts).isEmpty)
  }

  test("curationIngest: streamed decision manifest == batch curation rules on an id-ordered feed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Dedup
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    val docs = fixtureDocs()
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val (dedupDir, lmDir, nbDir, manifestDir) =
      (tmp("graft_cur_dedup"), tmp("graft_cur_lm"), tmp("graft_cur_nb"), tmp("graft_cur_m"))
    ModelStreams.foldLmBatch(train.select("doc_id", "text"), lmDir, 0L)
    ModelStreams.foldNbBatch(train, nbDir, 0L)

    // id-ordered feed: batch 0 = lower half of doc_ids, batch 1 = upper
    val all = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val (b1, b2) = all.splitAt(all.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.curationIngest(
      mem.toDF().toDF("doc_id", "text"), dedupDir, lmDir, nbDir, manifestDir)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val manifest = spark.read.parquet(manifestDir)
      .select("doc_id", "drop_dup", "drop_quality", "pred_lang").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2),
        if (r.isNullAt(3)) null else r.getString(3)))).toMap
    assert(manifest.size === all.length)

    // batch rules over the SAME corpus with the same operators:
    // dup = verified J>=0.8 partner with a smaller doc_id
    val hashed = Dedup.withShingleHashes(docs.select("doc_id", "text"), "text")
      .localCheckpoint(true)
    val bands = Dedup.minhashBandsFromHashes(hashed, "doc_id")
    val capped = Dedup.dropHotBuckets(bands, Seq("band", "band_hash"),
      Dedup.MaxBucket, "curation_test")
    val hs = hashed.select(col("doc_id"), array_distinct(col("shingle_hashes")).as("hs"))
    val pairs = Dedup.lshCandidatePairs(capped, "doc_id")
      .join(hs.select(col("doc_id").as("id_a"), col("hs").as("sh_a")), Seq("id_a"))
      .join(hs.select(col("doc_id").as("id_b"), col("hs").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), Dedup.jaccardCol.as("jaccard"))
      .filter(col("jaccard") >= 0.8).select("id_a", "id_b")
    val dupIds = pairs.select(col("id_a").as("d"), col("id_b").as("o"))
      .union(pairs.select(col("id_b").as("d"), col("id_a").as("o")))
      .filter(col("o") < col("d")).select("d").distinct()
      .collect().map(_.getLong(0)).toSet

    val wantLq = Classify.lmPerplexity(Classify.lmTrain(train), docs)
      .filter(col("avg_nll") >= 3.5).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val m = Classify.nbTrain(train)
    val wantPred = Classify.nbPredict(Classify.nbScores(
        Classify.nbLogProbs(m), Classify.nbPriors(m), docs))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    all.foreach { case (id, _) =>
      val (dup, lowq, pred) = manifest(id)
      assert(dup === dupIds.contains(id), s"dup flag for doc $id")
      assert(lowq === wantLq.contains(id), s"quality flag for doc $id")
      assert(pred === wantPred.getOrElse(id, null), s"pred for doc $id")
    }
    // the corpus genuinely exercises the dup rule (planted near-dups)
    assert(dupIds.nonEmpty, "fixture corpus should contain near-dup pairs")

    // replay idempotency at the function level: re-folding batch 1 and
    // re-emitting its manifest partition are both no-ops
    val before = spark.read.parquet(manifestDir).count()
    assert(graft.streaming.DocStreams.dedupFoldBatch(
      b2.toSeq.toDF("doc_id", "text"), dedupDir, 1L).isEmpty)
    assert(spark.read.parquet(manifestDir).count() === before)
  }

  test("chi2 store: keyless totals fold; two-batch fold == one-shot; unlearn == survivors") {
    val tbl = java.nio.file.Files.createTempDirectory("graft_chi2store").toString
    val docs = fixtureDocs()
      .select(col("doc_id"), col("text"), (col("label") === "en").as("is_pos"))
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 =!= 0)
    ModelStreams.foldChi2Batch(b1, tbl, 0L)
    ModelStreams.foldChi2Batch(b2, tbl, 1L)
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val want = scores(Classify.chi2Terms(docs, col("is_pos")))
    assert(scores(ModelStreams.chi2FromStore(spark, tbl)) === want)
    assert(want.nonEmpty)

    // exact unlearning extends to feature selection: negative-fold a
    // cohort, the served scores equal a from-scratch pass on survivors
    val forget = docs.filter(col("doc_id") % 10 === 3)
    val m = Classify.chi2Counts(forget, col("is_pos"))
    ModelStreams.foldCountTables(spark, tbl, 2L, Seq(
      ModelStreams.CountTable("grid",
        m._1.withColumn("a", -col("a")).withColumn("b", -col("b")),
        Seq("term"), Seq("a", "b")),
      ModelStreams.CountTable("totals",
        m._2.withColumn("n", -col("n")).withColumn("n_pos", -col("n_pos")),
        Seq.empty, Seq("n", "n_pos"))), unlearn = true)
    val wantSurv = scores(Classify.chi2Terms(
      docs.filter(col("doc_id") % 10 =!= 3), col("is_pos")))
    assert(scores(ModelStreams.chi2FromStore(spark, tbl)) === wantSurv)
  }

  test("model fold: pre-swing crash leftovers in the version dir are overwritten on redelivery") {
    import spark.implicits._
    val tbl = java.nio.file.Files.createTempDirectory("graft_crash_model").toString
    val docs = fixtureDocs()
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 =!= 0)
    ModelStreams.foldNbBatch(b1, tbl, 0L)
    // crash simulation: a partial v1/cond with wrong content, CURRENT
    // still on v0
    Seq(("zz", "never_a_term", 999L)).toDF("label", "term", "cnt")
      .write.parquet(s"$tbl/v1/cond")
    assert(graft.operators.Lakehouse.currentVersion(spark, tbl) === Some("v0"))
    ModelStreams.foldNbBatch(b2, tbl, 1L)
    assert(graft.operators.Lakehouse.currentVersion(spark, tbl) === Some("v1"))
    val whole = Classify.nbTrain(docs)
    val stored = ModelStreams.nbModelFromStore(spark, tbl)
    assert(stored.condCounts.except(whole.condCounts).isEmpty &&
      whole.condCounts.except(stored.condCounts).isEmpty)
  }

  test("DSIR store: two-batch fold serves weights == one-shot dsirLogWeights") {
    graft.functions.GraftFunctions.register(spark)
    val tbl = java.nio.file.Files.createTempDirectory("graft_dsirstore").toString
    val docs = fixtureDocs()
    val train = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("text"), (col("label") === "en").as("is_target"))
    val b1 = train.filter(col("doc_id") % 2 === 0)
    val b2 = train.filter(col("doc_id") % 2 =!= 0)
    ModelStreams.foldDsirBatch(b1, tbl, 0L)
    ModelStreams.foldDsirBatch(b2, tbl, 1L)
    val hold = docs.filter(col("doc_id") % 5 === 0).select("doc_id", "text")
    def weights(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("n_slots"), col("logw_dec").cast("string"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = weights(graft.operators.Classify.dsirLogWeights(
      docs.filter(col("doc_id") % 5 =!= 0 && col("label") === "en"),
      docs.filter(col("doc_id") % 5 =!= 0), hold))
    assert(weights(ModelStreams.dsirWeightsFromStore(hold, tbl)) === want)
    assert(want.nonEmpty)
  }

  test("bigram-LM store: two-batch fold == one-shot train; streamed probe scores == batch perplexity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tbl = java.nio.file.Files.createTempDirectory("graft_lmstore").toString

    val docs = fixtureDocs().select("doc_id", "text")
    val all = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (b1, b2) = all.partition(_._1 % 2 == 0)
    val mem = MemoryStream[(Long, String)]
    val q = ModelStreams.lmModelIngest(mem.toDF().toDF("doc_id", "text"), tbl)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val whole = Classify.lmTrain(docs)
    val stored = ModelStreams.lmModelFromStore(spark, tbl)
    assert(stored.bigramCounts.except(whole.bigramCounts).isEmpty &&
      whole.bigramCounts.except(stored.bigramCounts).isEmpty)
    assert(stored.unigramCounts.except(whole.unigramCounts).isEmpty &&
      whole.unigramCounts.except(stored.unigramCounts).isEmpty)

    // streamed probe through the SAME scoring call == batch scores
    val probe = docs.filter(col("doc_id") % 5 === 0)
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = scores(Classify.lmPerplexity(whole, probe))
    val pm = MemoryStream[(Long, String)]
    val out = ModelStreams.lmScoreFromStore(pm.toDF().toDF("doc_id", "text"), tbl)
    val q2 = out.writeStream.outputMode("update")
      .format("memory").queryName("graft_lmserve_test").start()
    val streamed =
      try {
        pm.addData(probe.collect().map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
        q2.processAllAvailable()
        scores(spark.table("graft_lmserve_test"))
      } finally q2.stop()
    assert(streamed === want)
    assert(want.nonEmpty)
  }
}
