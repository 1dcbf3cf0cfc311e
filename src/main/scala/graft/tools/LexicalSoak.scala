package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for [[graft.streaming.DocStreams.indexIngest]]: is the
  * lexical-index fold batch-proportional when the standing corpus is
  * two orders of magnitude bigger than the batch?
  *
  * Corpus: the SparseSoak replica recipe — sf0.1 `documents` (5 000
  * docs) replicated 48× with shifted doc_ids = 240 000 standing docs;
  * today's crawl is one extra replica slice (5 000 docs). The standing
  * index is built by a first streamed fold, the crawl by a second, and
  * the comparison is the crawl fold's wall against a full batch
  * rebuild of the 245 000-doc index — plus exactness: the served
  * ranking after both folds must equal [[graft.operators.Lexical.bm25]]
  * over the union corpus row-for-row, and the crawl fold must have
  * written ONLY its own `batch=1` partitions (append-only I/O), never
  * rewritten the standing postings.
  *
  * Prints one JSON evidence line; recorded in BASELINE.md.
  */
object LexicalSoak {
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
      .select("doc_id", "text").localCheckpoint(true)
    val nBase = base.count()
    def replicas(from: Int, until: Int) =
      spark.range(from, until).crossJoin(base)
        .select((col("doc_id") + col("id") * 1000000L).as("doc_id"), col("text"))
    val standing = replicas(0, 48).localCheckpoint(true)
    val crawl = replicas(48, 49).localCheckpoint(true)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val queries = Seq((0L, "spark hash join"), (1L, "stream window agg"),
      (2L, "fast vector scan"), (3L, "customer query filter"))
      .toDF("query_id", "qtext").localCheckpoint(true)

    val tbl = java.nio.file.Files.createTempDirectory("graft_lexsoak").toString
    // memory-sink micro-batches: batch 0 = standing corpus, batch 1 = crawl
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.indexIngest(
      mem.toDF().toDF("doc_id", "text"), tbl)
    val rows = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (_, standSec) = timed {
      mem.addData(rows(standing): _*); q.processAllAvailable()
    }
    val (_, foldSec) = timed {
      mem.addData(rows(crawl): _*); q.processAllAvailable()
    }
    q.stop()

    // append-only evidence: the crawl fold created exactly batch=1
    def parts(t: String) = new java.io.File(s"$tbl/$t").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(parts("postings") == Seq("batch=0", "batch=1"), parts("postings"))
    assert(parts("doclens") == Seq("batch=0", "batch=1"), parts("doclens"))

    val union = standing.unionByName(crawl)
    val (expected, rebuildSec) = timed {
      graft.operators.Lexical.bm25(union, queries, 5)
        .collect().map(_.toSeq).toSet
    }
    val (served, serveSec) = timed {
      graft.operators.Lexical.searchStore(spark, tbl, queries, 5)
        .collect().map(_.toSeq).toSet
    }
    assert(served == expected, "served ranking != batch-built ranking")

    val nDocs = graft.operators.Lakehouse.readCurrent(spark, tbl, "stats")
      .head().getLong(0)
    println(s"""{"soak":"lexical_index_fold","n_base":$nBase,""" +
      s""""n_standing":${nBase * 48},"n_docs":$nDocs,""" +
      s""""standing_fold_sec":${f"$standSec%.2f"},"crawl_fold_sec":${f"$foldSec%.2f"},""" +
      s""""rebuild_sec":${f"$rebuildSec%.2f"},"serve_sec":${f"$serveSec%.2f"},""" +
      s""""ranking_exact":true,"append_only":true}""")
    spark.stop()
  }
}
