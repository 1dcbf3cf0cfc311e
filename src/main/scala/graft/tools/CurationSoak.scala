package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the full curation-at-ingest loop
  * ([[graft.streaming.DocStreams.curationIngest]] body): with a 48×
  * standing dedup store and pre-trained model stores, what does one
  * crawl batch's COMPLETE decision cycle cost — dedup-store fold +
  * per-doc near-dup/quality/classification manifest?
  *
  * Corpus: the DedupStoreSoak recipe (240 000 standing docs, one
  * 5 000-doc crawl slice); model stores trained once on the sf0.1
  * train split. Checks: the crawl manifest lands as one `batch=1`
  * partition with a row per crawl doc; its dup flags match the
  * replica geometry (every crawl doc is a shifted copy of a standing
  * doc with a smaller id → drop_dup everywhere LSH recall admits, and
  * never a false flag: verified-Jaccard pairs only).
  *
  * Prints one JSON evidence line; recorded in BASELINE.md.
  */
object CurationSoak {
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
          col("text"), col("lang"))
    val standing = replicas(0, 48).select("doc_id", "text").localCheckpoint(true)
    val crawl = replicas(48, 49).select("doc_id", "text").localCheckpoint(true)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val (dedupDir, lmDir, nbDir, manifestDir) =
      (tmp("graft_cs_dedup"), tmp("graft_cs_lm"), tmp("graft_cs_nb"), tmp("graft_cs_m"))

    // model stores: one fold of the sf0.1 train split each
    val train = base.filter(col("doc_id") % 5 =!= 0)
    graft.streaming.ModelStreams.foldLmBatch(train.select("doc_id", "text"), lmDir, 0L)
    graft.streaming.ModelStreams.foldNbBatch(
      train.select(col("doc_id"), col("text"), col("lang").as("label")), nbDir, 0L)

    // standing corpus = batch 0, crawl = batch 1, through the real
    // streaming pipeline
    val rows = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.curationIngest(
      mem.toDF().toDF("doc_id", "text"), dedupDir, lmDir, nbDir, manifestDir)
    val (_, standSec) = timed {
      mem.addData(rows(standing): _*); q.processAllAvailable()
    }
    val (_, crawlSec) = timed {
      mem.addData(rows(crawl): _*); q.processAllAvailable()
    }
    q.stop()

    val m1 = spark.read.parquet(s"$manifestDir/batch=1")
    val nRows = m1.count()
    val nDup = m1.filter(col("drop_dup")).count()
    val nLowq = m1.filter(col("drop_quality")).count()
    val nPred = m1.filter(col("pred_lang").isNotNull).count()
    // geometry check: every crawl doc is a replica of a smaller-id
    // standing doc, so NO crawl doc should survive the dup filter
    // unless LSH banding missed its twin (report the recall, expect
    // high; false flags are impossible — pairs are verified Jaccard)
    val dupRecallE6 = if (nRows == 0) 0L else nDup * 1000000L / nRows

    println(s"""{"soak":"curation_ingest","n_base":$nBase,""" +
      s""""n_standing":${nBase * 48},"n_crawl":$nRows,""" +
      s""""standing_cycle_sec":${f"$standSec%.2f"},"crawl_cycle_sec":${f"$crawlSec%.2f"},""" +
      s""""crawl_dup_flagged":$nDup,"dup_recall_e6":$dupRecallE6,""" +
      s""""lowq_flagged":$nLowq,"classified":$nPred}""")
    spark.stop()
  }
}
