package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for [[graft.streaming.ModelStreams.nbModelIngest]]: is
  * the NB-model fold batch-proportional when the standing corpus is
  * 48× the batch?
  *
  * Corpus: the LexicalSoak replica recipe — sf0.1 `documents` (5 000
  * labelled docs) replicated 48× with shifted doc_ids = 240 000
  * standing docs; today's crawl is one extra replica slice. The
  * standing model is built by a first streamed fold, the crawl folded
  * by a second, and the comparison is the crawl fold's wall against a
  * from-scratch retrain (tokenize + count) of the 245 000-doc union —
  * plus exactness: the folded sufficient statistics must equal the
  * retrained ones EXACTLY (additive counts — the fold≡retrain
  * contract), and classifications served from the store must equal
  * the retrained model's batch predictions row-for-row.
  *
  * The fold's store-sized work is the vocabulary-keyed count merge
  * (the termstats trade LexicalSoak documents); its corpus-sized work
  * is ZERO — only the batch is tokenized.
  *
  * Prints one JSON evidence line; recorded in BASELINE.md.
  */
object ModelSoak {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val base = graft.sources.Tables(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text", "lang").localCheckpoint(true)
    val nBase = base.count()
    def replicas(from: Int, until: Int) =
      spark.range(from, until).crossJoin(base)
        .select((col("doc_id") + col("id") * 1000000L).as("doc_id"),
          col("text"), col("lang").as("label"))
    val standing = replicas(0, 48).localCheckpoint(true)
    val crawl = replicas(48, 49).localCheckpoint(true)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val tbl = java.nio.file.Files.createTempDirectory("graft_modelsoak").toString
    val mem = MemoryStream[(Long, String, String)]
    val q = graft.streaming.ModelStreams.nbModelIngest(
      mem.toDF().toDF("doc_id", "text", "label"), tbl)
    val rows = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val (_, standSec) = timed {
      mem.addData(rows(standing): _*); q.processAllAvailable()
    }
    val (_, foldSec) = timed {
      mem.addData(rows(crawl): _*); q.processAllAvailable()
    }
    q.stop()

    // from-scratch retrain of the union, materialized to parquet like
    // the fold's own write (apples to apples)
    val union = standing.unionByName(crawl)
    val retrainDir = java.nio.file.Files.createTempDirectory("graft_modelretrain").toString
    val (_, retrainSec) = timed {
      val m = graft.operators.Classify.nbTrain(union, "doc_id", "text", "label")
      m.condCounts.write.mode("overwrite").parquet(s"$retrainDir/cond")
      m.classStats.write.mode("overwrite").parquet(s"$retrainDir/cstats")
    }

    // fold ≡ retrain, exactly
    val stored = graft.streaming.ModelStreams.nbModelFromStore(spark, tbl)
    val rcond = spark.read.parquet(s"$retrainDir/cond")
    val rstats = spark.read.parquet(s"$retrainDir/cstats")
    val condExact = stored.condCounts.except(rcond).isEmpty &&
      rcond.except(stored.condCounts).isEmpty
    val statsExact = stored.classStats.except(rstats).isEmpty &&
      rstats.except(stored.classStats).isEmpty

    // served classifications from the store == batch predictions of
    // the retrained model (probe: one replica slice of unseen ids)
    val probe = spark.range(49, 50).crossJoin(base)
      .select((col("doc_id") + col("id") * 1000000L).as("doc_id"), col("text"))
      .localCheckpoint(true)
    def preds(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "pred_label", "score").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val m2 = graft.operators.Classify.NbModel(rcond, rstats,
      rcond.select("term").distinct())
    val (want, _) = timed(preds(graft.operators.Classify.nbPredict(
      graft.operators.Classify.nbScores(graft.operators.Classify.nbLogProbs(m2),
        graft.operators.Classify.nbPriors(m2), probe))))
    val (got, serveSec) = timed(preds(
      graft.streaming.ModelStreams.nbServeFromStore(probe, tbl)))
    val servedExact = got == want && want.nonEmpty

    println(s"""{"soak":"nb_model_fold","n_base":$nBase,""" +
      s""""n_standing":${nBase * 48},"n_docs":${nBase * 49},""" +
      s""""standing_fold_sec":${f"$standSec%.2f"},"crawl_fold_sec":${f"$foldSec%.2f"},""" +
      s""""retrain_sec":${f"$retrainSec%.2f"},"serve_sec":${f"$serveSec%.2f"},""" +
      s""""fold_eq_retrain":${condExact && statsExact},"served_exact":$servedExact}""")
    spark.stop()
  }
}
