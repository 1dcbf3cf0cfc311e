package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the APPEND-ONLY dedup store
  * ([[graft.streaming.DocStreams.dedupFoldBatch]]): is the crawl fold
  * batch-proportional when the standing corpus is 48× the batch?
  *
  * Corpus: the LexicalSoak replica recipe — sf0.1 `documents` (5 000
  * docs) replicated 48× with shifted doc_ids = 240 000 standing docs;
  * today's crawl is one extra replica slice. The standing store is
  * built by a first fold, the crawl folded on top, and the comparison
  * is the crawl fold's wall against a one-shot fold of the 245 000-doc
  * union into a fresh store — plus the I/O evidence: the crawl fold's
  * bands/hashes writes are ONLY its own `batch=1` partitions (the
  * standing partitions untouched — under the previous copy-on-write
  * layout every fold rewrote the full corpus-sized band table), and
  * the folded cluster labelling equals the one-shot clustering of the
  * union corpus row-for-row.
  *
  * Prints one JSON evidence line; recorded in BASELINE.md.
  */
object DedupStoreSoak {
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

    val tbl = java.nio.file.Files.createTempDirectory("graft_dedupsoak").toString
    val (_, standSec) = timed {
      graft.streaming.DocStreams.dedupFoldBatch(standing, tbl, 0L)
    }
    // mtime snapshot of the standing partitions: the crawl fold must
    // not touch them (append-only I/O)
    def partDirs(t: String) = new java.io.File(s"$tbl/$t").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    val mtime0 = new java.io.File(s"$tbl/bands/batch=0").lastModified()
    val (_, foldSec) = timed {
      graft.streaming.DocStreams.dedupFoldBatch(crawl, tbl, 1L)
    }
    val appendOnly = partDirs("bands") == Seq("batch=0", "batch=1") &&
      partDirs("hashes") == Seq("batch=0", "batch=1") &&
      new java.io.File(s"$tbl/bands/batch=0").lastModified() == mtime0

    // one-shot fold of the union into a fresh store (the rebuild)
    val union = standing.unionByName(crawl).localCheckpoint(true)
    val tbl2 = java.nio.file.Files.createTempDirectory("graft_dedupsoak2").toString
    val (_, rebuildSec) = timed {
      graft.streaming.DocStreams.dedupFoldBatch(union, tbl2, 0L)
    }
    // folded clustering == one-shot clustering, row for row
    val folded = graft.operators.Lakehouse.readCurrent(spark, tbl, "clusters")
    val oneShot = graft.operators.Lakehouse.readCurrent(spark, tbl2, "clusters")
    val clustersExact = folded.except(oneShot).isEmpty &&
      oneShot.except(folded).isEmpty &&
      folded.count() > 0

    println(s"""{"soak":"dedup_store_fold","n_base":$nBase,""" +
      s""""n_standing":${nBase * 48},"n_docs":${nBase * 49},""" +
      s""""standing_fold_sec":${f"$standSec%.2f"},"crawl_fold_sec":${f"$foldSec%.2f"},""" +
      s""""rebuild_sec":${f"$rebuildSec%.2f"},"append_only":$appendOnly,""" +
      s""""clusters_exact":$clustersExact}""")
    spark.stop()
  }
}
