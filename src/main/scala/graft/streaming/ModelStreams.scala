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

  /** One micro-batch fold (exposed for replay tests): train counts on
    * the batch, sum into the stored tables, write v`id`, swing
    * CURRENT. Replaying an already-committed batch id is a no-op (the
    * dedupIngest idempotency contract — a crash between the swing and
    * the streaming commit re-delivers the id). */
  def foldNbBatch(batch: DataFrame, tableDir: String, id: Long,
      labelCol: String = "label"): Unit = {
    val spark = batch.sparkSession
    val ver = Lakehouse.currentVersion(spark, tableDir)
    if (ver.exists(Lakehouse.sameBatch(_, id))) return
    def stored(t: String): Option[DataFrame] =
      ver.map(v => spark.read.parquet(s"$tableDir/$v/$t"))
    val bm = Classify.nbTrain(batch, "doc_id", "text", labelCol)
    val cond = stored("cond") match {
      case None => bm.condCounts
      case Some(st) => st.unionByName(bm.condCounts)
        .groupBy("label", "term").agg(sum("cnt").as("cnt"))
    }
    val cstats = stored("cstats") match {
      case None => bm.classStats
      case Some(st) => st.unionByName(bm.classStats)
        .groupBy("label").agg(sum("total_c").as("total_c"),
          sum("n_docs_c").as("n_docs_c"))
    }
    // reads (previous version) and writes (next) touch different
    // directories; ordering is tables → CURRENT swing, so a reader
    // never sees a half-written version and a crash before the swing
    // leaves the store on the previous consistent version
    val vdir = s"$tableDir/v$id"
    cond.write.mode("overwrite").parquet(s"$vdir/cond")
    cstats.write.mode("overwrite").parquet(s"$vdir/cstats")
    val tmp = new java.io.File(s"$tableDir/CURRENT.tmp")
    val cur = new java.io.File(s"$tableDir/CURRENT")
    java.nio.file.Files.write(tmp.toPath,
      s"v$id".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath, cur.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Fold each micro-batch of `(doc_id, text, <labelCol>)` labelled
    * documents into the standing NB model store under `tableDir`. */
  def nbModelIngest(docStream: DataFrame, tableDir: String,
      labelCol: String = "label"): org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        foldNbBatch(batch.toDF(), tableDir, id, labelCol)
        ()
      }
      .start()

  /** Rebuild the [[Classify.NbModel]] view of one PINNED store version
    * (one CURRENT resolution; the model tables then stay consistent
    * for the reader's lifetime). */
  def nbModelFromStore(spark: org.apache.spark.sql.SparkSession,
      tableDir: String): Classify.NbModel = {
    val cond = Lakehouse.readCurrent(spark, tableDir, "cond")
    val cstats = Lakehouse.readCurrent(spark, tableDir, "cstats")
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
}
