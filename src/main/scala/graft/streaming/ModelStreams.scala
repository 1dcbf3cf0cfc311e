package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Classify, Lakehouse}

/** Standing CURATION-MODEL store: the Naive Bayes sufficient
  * statistics as a versioned, incrementally folded table set — the
  * model-family entry of the standing-store matrix (lexical index →
  * [[DocStreams.indexIngest]], dense vectors →
  * [[VectorStreams.vectorIndexIngest]], perceptual →
  * [[DocStreams.mediaDedupIngest]]; this is the same discipline for a
  * trained statistical model).
  *
  * Because NB's model IS a pair of additive count tables
  * ([[Classify.NbModel]]), the fold is exact by construction: training
  * on batch₁ ∪ batch₂ equals summing per-batch counts (property-tested
  * in ClassifySpec). The store holds two vocabulary-sized tables per
  * version — `cond/` (label, term, cnt) and `cstats/` (label, total_c,
  * n_docs_c) — under an atomic CURRENT pointer; the fold's store-sized
  * work is one vocabulary-keyed count merge (the same trade the
  * lexical termstats fold makes), while tokenization cost is
  * batch-proportional.
  */
object ModelStreams {

  /** One table of an additive-count model: `batch` holds this batch's
    * counts, `keys` the grouping identity, `sums` the count columns to
    * merge by summation.
    *
    * `signedSums` names sum columns that are legitimately negative on
    * survivor rows (e.g. an embedding-component Σv): the unlearn
    * tripwire skips them — a negative there is data, not corruption —
    * while the all-zero vanish rule still requires EVERY sum zero.
    *
    * `countCol` names the column that counts contributing ROWS (when
    * one exists): a survivor with that count at zero but any other sum
    * nonzero is corrupt by construction (mass with no contributors —
    * the signed-sum cancellation a plain negativity check can't see),
    * and aborts the unlearn before the swing. */
  final case class CountTable(name: String, batch: DataFrame,
      keys: Seq[String], sums: Seq[String], signedSums: Seq[String] = Nil,
      countCol: Option[String] = None)

  /** Generic micro-batch fold for a model made of ADDITIVE count
    * tables (sufficient statistics): sum each table into its stored
    * counterpart, write v`id`, swing CURRENT atomically. Fold ≡
    * retrain is then a theorem, not a test target. Replaying an
    * already-committed batch id is a no-op (the dedupIngest
    * idempotency contract — a crash between the swing and the
    * streaming commit re-delivers the id). */
  def foldCountTables(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, id: Long, tables: Seq[CountTable],
      unlearn: Boolean = false, vacuumKeep: Int = 0): Unit = {
    val ver = Lakehouse.currentVersion(spark, tableDir)
    if (ver.exists(Lakehouse.sameBatch(_, id))) return
    // reads (previous version) and writes (next) touch different
    // directories; ordering is tables → CURRENT swing, so a reader
    // never sees a half-written version and a crash before the swing
    // leaves the store on the previous consistent version. Subtables
    // accumulate in a DOT-PREFIXED tmp dir that renames to v$id only
    // once every table (and every unlearn tripwire) has passed: a
    // crash or an aborted unlearn mid-write can never leave a torn
    // v$id that listVersions/vacuum would count in retention or that
    // time-travel readVersion could open.
    val vdir = s"$tableDir/v$id"
    val vtmp = s"$tableDir/.v$id.tmp"
    val fsys = Lakehouse.fs(spark, tableDir)
    fsys.delete(new org.apache.hadoop.fs.Path(vtmp), true)
    try tables.foreach { tb =>
      val merged = ver match {
        case None => tb.batch
        case Some(v) =>
          spark.read.parquet(s"$tableDir/$v/${tb.name}")
            .unionByName(tb.batch)
            .groupBy(tb.keys.map(col): _*)
            .agg(sum(tb.sums.head).as(tb.sums.head),
              tb.sums.tail.map(c => sum(c).as(c)): _*)
      }
      // unlearning (negative folds) must leave EXACTLY the counts a
      // retrain-on-survivors would produce: all-zero rows vanish (a
      // fully-forgotten term/label is not "present with count 0" —
      // add-one smoothing over the vocabulary would differ), and a
      // negative survivor means the caller unlearned rows that were
      // never folded in — corrupt by construction, so fail LOUDLY
      // before the swing (the store stays on the previous version).
      val cleaned =
        if (!unlearn) merged
        else {
          val allZero = tb.sums.map(c => col(c) === 0L).reduce(_ && _)
          val anyNeg = tb.sums.filterNot(tb.signedSums.contains)
            .map(c => col(c) < 0L).reduceOption(_ || _).getOrElse(lit(false))
          // countCol == 0 with residual mass: a signed sum cancelled to
          // a zero contributor count — rows never folded in, invisible
          // to the negativity check (e.g. unlearning a drifted twin of
          // a stored vector)
          val zeroCountResidue = tb.countCol.map { cc =>
            // reduceOption: a table whose ONLY sum column is its
            // countCol has no residue columns to check (empty.reduce
            // would throw during unlearn)
            col(cc) === 0L &&
              tb.sums.filterNot(_ == cc).map(col(_) =!= 0L)
                .reduceOption(_ || _).getOrElse(lit(false))
          }.getOrElse(lit(false))
          val m2 = merged.filter(!allZero).localCheckpoint(true)
          val neg = m2.filter(anyNeg || zeroCountResidue).limit(1).count()
          require(neg == 0L,
            s"unlearn fold corrupted ${tb.name}: negative counts or " +
              "zero-contributor residue — batch contains rows never " +
              "folded into this store")
          m2
        }
      cleaned.write.mode("overwrite").parquet(s"$vtmp/${tb.name}")
    } catch {
      case e: Throwable =>
        fsys.delete(new org.apache.hadoop.fs.Path(vtmp), true)
        throw e
    }
    // a torn v$id from a pre-tmp-era crash (or a racing duplicate
    // replay) is superseded wholesale by this complete rewrite
    fsys.delete(new org.apache.hadoop.fs.Path(vdir), true)
    if (!fsys.rename(new org.apache.hadoop.fs.Path(vtmp),
        new org.apache.hadoop.fs.Path(vdir)))
      throw new IllegalStateException(s"foldCountTables: rename $vtmp -> $vdir failed")
    val tmp = new java.io.File(s"$tableDir/CURRENT.tmp")
    val cur = new java.io.File(s"$tableDir/CURRENT")
    java.nio.file.Files.write(tmp.toPath,
      s"v$id".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath, cur.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // retention: model tables are rewritten whole per fold (they are
    // vocabulary-sized), so versions accumulate one per batch — a
    // standing ingest needs the vacuum or the store grows per-batch
    // forever. Runs AFTER the swing: a crash here loses retention
    // only, never the fold. 0 disables (keep everything).
    if (vacuumKeep > 0) Lakehouse.vacuum(spark, tableDir, vacuumKeep)
  }

  /** One NB micro-batch fold (exposed for replay tests). */
  def foldNbBatch(batch: DataFrame, tableDir: String, id: Long,
      labelCol: String = "label", vacuumKeep: Int = 0): Unit = {
    val bm = Classify.nbTrain(batch, "doc_id", "text", labelCol)
    foldCountTables(batch.sparkSession, tableDir, id, Seq(
      CountTable("cond", bm.condCounts, Seq("label", "term"), Seq("cnt")),
      CountTable("cstats", bm.classStats, Seq("label"),
        Seq("total_c", "n_docs_c"))), vacuumKeep = vacuumKeep)
  }

  /** Fold each micro-batch of `(doc_id, text, <labelCol>)` labelled
    * documents into the standing NB model store under `tableDir`. */
  def nbModelIngest(docStream: DataFrame, tableDir: String,
      labelCol: String = "label",
      vacuumKeep: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        foldNbBatch(batch.toDF(), tableDir, id, labelCol, vacuumKeep)
        ()
      }
      .start()

  /** Rebuild the [[Classify.NbModel]] view of one PINNED store version
    * (one CURRENT resolution; the model tables then stay consistent
    * for the reader's lifetime). */
  def nbModelFromStore(spark: org.apache.spark.sql.SparkSession,
      tableDir: String): Classify.NbModel = {
    // resolve CURRENT ONCE and pin both subtables to that version —
    // two readCurrent calls could straddle a concurrent fold's swing
    // and pair cond counts with the other version's totals (a torn
    // model whose smoothing denominators are inconsistent)
    val ver = Lakehouse.currentVersion(spark, tableDir).getOrElse(
      throw new IllegalStateException(s"no CURRENT pointer under $tableDir"))
    val cond = Lakehouse.readVersion(spark, tableDir, ver, "cond")
    val cstats = Lakehouse.readVersion(spark, tableDir, ver, "cstats")
    Classify.NbModel(cond, cstats, cond.select("term").distinct())
  }

  /** ONLINE classification from the standing store: pin the current
    * version, precompute the scaled impact grid + prior map, and
    * serve the probe frame (batch OR streaming) through the
    * single-aggregation [[Classify.nbServe]] path. */
  def nbServeFromStore(probe: DataFrame, tableDir: String): DataFrame = {
    val spark = probe.sparkSession
    val m = nbModelFromStore(spark, tableDir)
    val lp = Classify.nbLogProbs(m)
    Classify.nbServe(probe, Classify.nbImpact(lp),
      Classify.nbPriorMap(Classify.nbPriors(m)))
  }

  /** CONTINUOUS EVALUATION fold: score one labelled micro-batch
    * against the PINNED NB model store and fold the resulting
    * confusion cells into a standing `cm` count table under `evalDir`
    * — the [[foldCountTables]] discipline, so the accumulated matrix
    * after N batches equals the one-shot matrix over the union
    * (additivity), replay is a no-op, and a crash never tears a
    * version. Cells count SCORED docs (the [[Classify.nbServe]]
    * contract: a doc with zero in-vocabulary terms yields no
    * prediction and no cell). The cm table is K²-rows — metadata-sized
    * at any stream volume. */
  def foldEvalBatch(batch: DataFrame, nbDir: String, evalDir: String,
      id: Long, labelCol: String = "label", vacuumKeep: Int = 0): Unit = {
    val cm = nbServeFromStore(batch.select("doc_id", "text"), nbDir)
      .join(batch.select(col("doc_id"), col(labelCol).as("true_label")), Seq("doc_id"))
      .groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("n"))
    foldCountTables(batch.sparkSession, evalDir, id, Seq(
      CountTable("cm", cm, Seq("true_label", "pred_label"), Seq("n"))),
      vacuumKeep = vacuumKeep)
  }

  /** Fold each labelled micro-batch of `(doc_id, text, <labelCol>)`
    * into the standing confusion-matrix store — the monitoring loop
    * that watches a deployed classifier drift, one K²-row fold per
    * batch. */
  def evalIngest(docStream: DataFrame, nbDir: String, evalDir: String,
      labelCol: String = "label",
      vacuumKeep: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        foldEvalBatch(batch.toDF(), nbDir, evalDir, id, labelCol, vacuumKeep)
        ()
      }
      .start()

  /** The monitoring scalars served off the standing matrix: one pinned
    * read of `cm`, then [[Classify.agreementStats]] (n, agreements,
    * observed/expected agreement ppm, Cohen's κ ppm). */
  def agreementFromStore(spark: org.apache.spark.sql.SparkSession,
      evalDir: String): DataFrame =
    Classify.agreementStats(
      Lakehouse.readCurrent(spark, evalDir, "cm"),
      "true_label", "pred_label", "n")

  /** Per-class precision/recall/F1 served off the standing confusion
    * store — the eval_prf_nb arithmetic over one pinned version. */
  def prfFromStore(spark: org.apache.spark.sql.SparkSession,
      evalDir: String): DataFrame =
    Classify.prfStats(
      Lakehouse.readCurrent(spark, evalDir, "cm"),
      "true_label", "pred_label", "n")

  /** The monitoring TIME SERIES: agreement scalars for every retained
    * version of the eval store, ordered oldest→newest — κ drifting
    * down across versions is the "retrain or investigate" alarm. One
    * K²-row read per retained version (retention is the vacuum knob),
    * each a cumulative snapshot since folds are additive. Version ids
    * are listed driver-side (metadata-sized, like lakehouse retention
    * itself); the math stays in [[Classify.agreementStats]]. */
  def agreementHistory(spark: org.apache.spark.sql.SparkSession,
      evalDir: String): DataFrame = {
    val versions = Lakehouse.listVersions(spark, evalDir)
    require(versions.nonEmpty,
      s"agreementHistory: no versions under $evalDir — fold a batch first")
    versions
      .map { v =>
        Classify.agreementStats(
          Lakehouse.readVersion(spark, evalDir, v, "cm"),
          "true_label", "pred_label", "n")
          .withColumn("version", lit(v))
      }
      .reduce(_.unionByName(_))
      .select("version", "n_docs", "n_agree", "po_ppm", "pe_ppm", "kappa_ppm")
  }

  /** EXACT machine unlearning (right-to-be-forgotten for the trained
    * model — the [[graft.operators.Lexical]].forgetDocs twin): because
    * the model is additive sufficient statistics, forgetting documents
    * is folding their counts NEGATED — the post-unlearn store equals a
    * retrain on the survivors bit-for-bit, at batch cost, no retrain.
    * `docs` must be rows previously folded in (tripwired: a count
    * driven negative aborts before the CURRENT swing). Replay-
    * idempotent like any fold. */
  def unlearnNbBatch(docs: DataFrame, tableDir: String, id: Long,
      labelCol: String = "label"): Unit = {
    val bm = Classify.nbTrain(docs, "doc_id", "text", labelCol)
    foldCountTables(docs.sparkSession, tableDir, id, Seq(
      CountTable("cond",
        bm.condCounts.withColumn("cnt", -col("cnt")),
        Seq("label", "term"), Seq("cnt")),
      CountTable("cstats",
        bm.classStats.withColumn("total_c", -col("total_c"))
          .withColumn("n_docs_c", -col("n_docs_c")),
        Seq("label"), Seq("total_c", "n_docs_c"))), unlearn = true)
  }

  /** Exact unlearning for the bigram-LM store (see [[unlearnNbBatch]]). */
  def unlearnLmBatch(docs: DataFrame, tableDir: String, id: Long): Unit = {
    val m = Classify.lmTrain(docs)
    foldCountTables(docs.sparkSession, tableDir, id, Seq(
      CountTable("bi", m.bigramCounts.withColumn("cnt2", -col("cnt2")),
        Seq("w1", "w2"), Seq("cnt2")),
      CountTable("uni", m.unigramCounts.withColumn("cnt1", -col("cnt1")),
        Seq("w1"), Seq("cnt1"))), unlearn = true)
  }

  // ───────────── χ² feature-selection store ─────────────

  /** One χ² micro-batch fold: the per-term (a, b) document-frequency
    * grid and the KEYLESS 1-row (n, n_pos) totals are both additive,
    * so feature selection maintains incrementally under the same
    * [[foldCountTables]] discipline (an empty `keys` list folds as a
    * global aggregate). `classCol` must name a boolean column on the
    * batch. */
  def foldChi2Batch(batch: DataFrame, tableDir: String, id: Long,
      classCol: String = "is_pos", vacuumKeep: Int = 0): Unit = {
    val (grid, totals) = Classify.chi2Counts(batch, col(classCol))
    foldCountTables(batch.sparkSession, tableDir, id, Seq(
      CountTable("grid", grid, Seq("term"), Seq("a", "b")),
      CountTable("totals", totals, Seq.empty, Seq("n", "n_pos"))),
      vacuumKeep = vacuumKeep)
  }

  /** χ² association scores served from one PINNED store version. */
  def chi2FromStore(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, minDf: Long = 5L): DataFrame = {
    val ver = Lakehouse.currentVersion(spark, tableDir).getOrElse(
      throw new IllegalStateException(s"no CURRENT pointer under $tableDir"))
    Classify.chi2FromCounts(
      Lakehouse.readVersion(spark, tableDir, ver, "grid"),
      Lakehouse.readVersion(spark, tableDir, ver, "totals"), minDf)
  }

  // ───────────── DSIR importance-model store ─────────────

  /** One DSIR micro-batch fold: the 1024-slot hashed-unigram count
    * tables of the target and raw distributions are additive (and
    * FIXED-width — the model never outgrows its `buckets` rows), so
    * the importance model maintains incrementally too. `batch` rows
    * are (doc_id, text, is_target); every doc folds into the raw
    * distribution, `is_target` rows additionally into the target one
    * (the [[graft.operators.Classify.dsirLogWeights]] convention:
    * target ⊆ raw). Both tables land in the SAME version — a fold
    * never leaves a version missing one distribution. */
  def foldDsirBatch(batch: DataFrame, tableDir: String, id: Long,
      buckets: Int = 1024, vacuumKeep: Int = 0): Unit = {
    val spark = batch.sparkSession
    graft.functions.GraftFunctions.register(spark)
    def slots(df: DataFrame): DataFrame = df
      .select(explode(expr(graft.functions.TextFunctions.tokensSql("text"))).as("__tok"))
      .select(expr(s"pmod(graft_poly(__tok), $buckets)").as("slot"))
      .groupBy("slot").agg(count(lit(1)).as("cnt"))
    foldCountTables(spark, tableDir, id, Seq(
      CountTable("target", slots(batch.filter(col("is_target"))),
        Seq("slot"), Seq("cnt")),
      CountTable("raw", slots(batch), Seq("slot"), Seq("cnt"))),
      vacuumKeep = vacuumKeep)
  }

  /** DSIR log importance weights of `score` docs served from one
    * PINNED store version (mirrors
    * [[graft.operators.Classify.dsirLogWeights]] arithmetic over the
    * stored counts). */
  def dsirWeightsFromStore(score: DataFrame, tableDir: String,
      buckets: Int = 1024): DataFrame = {
    val spark = score.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val ver = Lakehouse.currentVersion(spark, tableDir).getOrElse(
      throw new IllegalStateException(s"no CURRENT pointer under $tableDir"))
    val tc = Lakehouse.readVersion(spark, tableDir, ver, "target")
      .withColumnRenamed("cnt", "cnt_t")
    val rc = Lakehouse.readVersion(spark, tableDir, ver, "raw")
      .withColumnRenamed("cnt", "cnt_r")
    val tot = tc.agg(coalesce(sum("cnt_t"), lit(0L)).as("tot_t"))
      .crossJoin(rc.agg(coalesce(sum("cnt_r"), lit(0L)).as("tot_r"))) // 1 row
    score
      .select(col("doc_id"), explode(expr(
        graft.functions.TextFunctions.tokensSql("text"))).as("__tok"))
      .select(col("doc_id"), expr(s"pmod(graft_poly(__tok), $buckets)").as("slot"))
      .groupBy("doc_id", "slot").agg(count(lit(1)).as("tf"))
      .join(broadcast(tc), Seq("slot"), "left")
      .join(broadcast(rc), Seq("slot"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        Classify.c8(col("tf").cast("double") *
          (Classify.logq6((coalesce(col("cnt_t"), lit(0L)) + lit(1L)).cast("double") /
             (col("tot_t") + lit(buckets.toLong)).cast("double")) -
           Classify.logq6((coalesce(col("cnt_r"), lit(0L)) + lit(1L)).cast("double") /
             (col("tot_r") + lit(buckets.toLong)).cast("double")))).as("__c8"))
      .groupBy("doc_id")
      .agg(sum("__c8").as("__lw_dec"), count(lit(1)).as("n_slots"))
      .select(col("doc_id"), col("n_slots"), col("__lw_dec").as("logw_dec"))
  }

  // ───────────── bigram-LM store (the perplexity filter) ─────────────

  /** One LM micro-batch fold: bigram + unigram counts are additive
    * sufficient statistics exactly like NB's, so the same
    * [[foldCountTables]] discipline applies. */
  def foldLmBatch(batch: DataFrame, tableDir: String, id: Long,
      vacuumKeep: Int = 0): Unit = {
    val m = Classify.lmTrain(batch)
    foldCountTables(batch.sparkSession, tableDir, id, Seq(
      CountTable("bi", m.bigramCounts, Seq("w1", "w2"), Seq("cnt2")),
      CountTable("uni", m.unigramCounts, Seq("w1"), Seq("cnt1"))),
      vacuumKeep = vacuumKeep)
  }

  /** Fold each micro-batch of `(doc_id, text)` documents into the
    * standing bigram-LM store under `tableDir`. */
  def lmModelIngest(docStream: DataFrame, tableDir: String,
      vacuumKeep: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        foldLmBatch(batch.toDF(), tableDir, id, vacuumKeep)
        ()
      }
      .start()

  /** [[Classify.LmModel]] view of one PINNED store version. */
  def lmModelFromStore(spark: org.apache.spark.sql.SparkSession,
      tableDir: String): Classify.LmModel = {
    // one CURRENT resolution for both subtables (see nbModelFromStore)
    val ver = Lakehouse.currentVersion(spark, tableDir).getOrElse(
      throw new IllegalStateException(s"no CURRENT pointer under $tableDir"))
    val bi = Lakehouse.readVersion(spark, tableDir, ver, "bi")
    val uni = Lakehouse.readVersion(spark, tableDir, ver, "uni")
    Classify.LmModel(bi, uni, uni.select(col("w1").as("term")))
  }

  /** ONLINE perplexity scoring from the standing store. The scoring
    * plan is already streaming-legal as written — bigram extraction is
    * a projection, the model joins are stream-static, and the per-doc
    * NLL sum is the query's single aggregation — so the same call
    * serves batch and streaming probes. */
  def lmScoreFromStore(probe: DataFrame, tableDir: String): DataFrame =
    Classify.lmPerplexity(lmModelFromStore(probe.sparkSession, tableDir), probe)
}
