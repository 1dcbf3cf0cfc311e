package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Lakehouse, Lexical}

/** BM25 lexical retrieval: the streaming index fold converges to the
  * batch-built index, serving reads the pinned CURRENT, and replay of
  * a committed batch is a no-op (the dedupIngest store discipline). */
class LexicalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def queries() = {
    import spark.implicits._
    Seq((0L, "spark hash join"), (1L, "stream window agg"),
      (2L, "fast vector scan"), (3L, "customer query filter"))
      .toDF("query_id", "qtext")
  }

  private def ranking(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getInt(4))).toSet

  test("two-batch indexIngest fold == batch-built BM25 index, served from CURRENT") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = graft.sources.Tables(spark, d, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(docs.size > 10)
    val (b1, b2) = docs.partition(_._1 % 2 == 0)

    val tbl = java.nio.file.Files.createTempDirectory("graft_lex").toString
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.indexIngest(
      mem.toDF().toDF("doc_id", "text"), tbl)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      assert(Lakehouse.currentVersion(spark, tbl).contains("v0"))
    } finally q.stop()

    // a crash between the CURRENT swing and the streaming commit
    // re-delivers batch 0 while CURRENT already names v0: the fold
    // must skip instead of double-counting (idempotent replay) —
    // then the next batch folds normally on top
    val mem2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.DocStreams.indexIngest(
      mem2.toDF().toDF("doc_id", "text"), tbl)
    try {
      mem2.addData(b1: _*); q2.processAllAvailable()
      assert(Lakehouse.currentVersion(spark, tbl).contains("v0"))
      assert(Lakehouse.readCurrent(spark, tbl, "stats").head().getLong(0)
        === b1.size.toLong)
      mem2.addData(b2: _*); q2.processAllAvailable()
      assert(Lakehouse.currentVersion(spark, tbl).contains("v1"))
    } finally q2.stop()

    val batchDf = docs.toDF("doc_id", "text")
    val expected = ranking(Lexical.bm25(batchDf, queries(), 5))
    val served = ranking(Lexical.searchStore(spark, tbl, queries(), 5))
    assert(served === expected)
    assert(served.nonEmpty)

    // store stats match the corpus exactly
    val st = Lakehouse.readCurrent(spark, tbl, "stats").head()
    assert(st.getLong(0) === docs.size.toLong)

    // searching a pinned pre-fold version still works (time travel):
    // the batch<=0 partition cut + v0 termstats/stats reproduce the
    // batch-1-only index exactly, even though batch 1's partitions
    // are already on disk
    val v0 = Lexical.searchStore(spark, tbl, queries(), 5, version = Some("v0"))
    assert(ranking(v0) === ranking(Lexical.bm25(b1.toDF("doc_id", "text"), queries(), 5)))

    // fold I/O is batch-proportional: each batch wrote exactly its own
    // partition of the append tables, nothing was rewritten
    def parts(t: String) = new java.io.File(s"$tbl/$t").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(parts("postings") === Seq("batch=0", "batch=1"))
    assert(parts("doclens") === Seq("batch=0", "batch=1"))

    // the pinned-snapshot cut is PARTITION PRUNING, not a data filter:
    // the batch<=N predicate must land in the scan's PartitionFilters
    // (a planning-time file-list cut — at 100 TB the reader never
    // opens newer batches' files)
    val pp = Lexical.searchStore(spark, tbl, queries(), 5, version = Some("v0"))
      .queryExecution.executedPlan.toString
    assert(pp.contains("PartitionFilters"), pp)
    assert(pp.contains("(batch#") && pp.contains("<= 0)"), pp)
  }

  test("indexIngest with maintenance compacts each batch partition pre-swing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = graft.sources.Tables(spark, d, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val tbl = java.nio.file.Files.createTempDirectory("graft_lex_cmp").toString
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.indexIngest(
      mem.toDF().toDF("doc_id", "text"), tbl, compactEvery = 1)
    try { mem.addData(docs: _*); q.processAllAvailable() } finally q.stop()
    def files(t: String) = new java.io.File(s"$tbl/$t/batch=0").listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files("postings") === 1)
    assert(files("doclens") === 1)
    // compaction is content-preserving: served == batch-built
    assert(ranking(Lexical.searchStore(spark, tbl, queries(), 5))
      === ranking(Lexical.bm25(docs.toDF("doc_id", "text"), queries(), 5)))
  }

  test("forgetDocs: append-store GDPR delete == from-scratch index over survivors") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = graft.sources.Tables(spark, d, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val (b1, b2) = docs.partition(_._1 % 2 == 0)
    val tbl = java.nio.file.Files.createTempDirectory("graft_lex_gdpr").toString
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.indexIngest(
      mem.toDF().toDF("doc_id", "text"), tbl)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // forget two docs that the index currently RETURNS (one per batch)
    val top = Lexical.searchStore(spark, tbl, queries(), 5)
      .select("doc_id").collect().map(_.getLong(0)).distinct
    val doomed = Seq(top.find(_ % 2 == 0).get, top.find(_ % 2 == 1).get)
    val rewritten = Lexical.forgetDocs(spark, tbl, doomed)
    assert(rewritten === 4) // both tables × both batches
    assert(Lakehouse.currentVersion(spark, tbl).contains("v1c1"))

    // the store now equals a from-scratch index over the survivors —
    // rankings AND scores (df/avgdl corrections are exact, not lossy)
    val survivors = docs.filterNot(r => doomed.contains(r._1))
    assert(ranking(Lexical.searchStore(spark, tbl, queries(), 5))
      === ranking(Lexical.bm25(survivors.toDF("doc_id", "text"), queries(), 5)))
    assert(!Lexical.searchStore(spark, tbl, queries(), 5)
      .select("doc_id").collect().map(_.getLong(0)).exists(doomed.contains))
    val st = Lakehouse.readCurrent(spark, tbl, "stats").head()
    assert(st.getLong(0) === survivors.size.toLong)
  }

  test("corpusStats of an empty batch folds as (0, 0), never (0, null)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "dl")
    val st = Lexical.corpusStats(empty).head()
    assert(st.getLong(0) === 0L)
    assert(!st.isNullAt(1) && st.getLong(1) === 0L)
    // the stats ADD an indexIngest fold performs stays non-null
    val prev = Seq((10L, 400L)).toDF("n_docs", "total_len")
    val folded = prev.select(col("n_docs").as("__on"), col("total_len").as("__ot"))
      .crossJoin(Lexical.corpusStats(empty))
      .select((col("__on") + col("n_docs")).as("n_docs"),
        (col("__ot") + col("total_len")).as("total_len")).head()
    assert(folded.getLong(0) === 10L && folded.getLong(1) === 400L)
  }

  test("bm25Serve: streamed ranking over the impact index == batch top-k; one-agg plan") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = graft.sources.Tables(spark, d, "documents").select("doc_id", "text")
    val post = Lexical.postings(docs).localCheckpoint(true)
    val dl = Lexical.doclens(docs).localCheckpoint(true)
    val ts = Lexical.termstats(post)
    val st = Lexical.corpusStats(dl)
    val idx = Lexical.impactIndex(post, dl, ts, st).localCheckpoint(true)

    val qrows = Seq((0L, "spark hash join"), (1L, "stream window agg"),
      (2L, "fast vector scan"), (3L, "customer query filter"))
    val mem = MemoryStream[(Long, String)]
    val out = Lexical.bm25Serve(mem.toDF().toDF("query_id", "qtext"), idx, 5)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("graft_bm25serve_test").start()
    val streamed =
      try {
        mem.addData(qrows: _*); q.processAllAvailable()
        spark.table("graft_bm25serve_test").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      } finally q.stop()

    // batch twin over the SAME prebuilt tables: identical rankings and
    // identical (single-double-rounding) scores
    val batch = Lexical.bm25TopK(post, dl, ts, st, queries(), 5)
      .collect().map(r => (r.getLong(0), r.getInt(4), r.getLong(1), r.getDouble(3))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)

    // serving is ONE aggregation (streaming-legal, map-side combining):
    // ObjectHashAggregate over the heap state, no window sort anywhere
    val pp = Lexical.bm25Serve(queries(), idx, 5).queryExecution.executedPlan.toString
    assert(pp.contains("ObjectHashAggregate"), pp)
    assert(!pp.contains("Window"), pp)

    // static pruning bounds every posting list; the capped index still
    // serves (approximate by design once the cap bites)
    val capped = Lexical.impactIndex(post, dl, ts, st, maxPostingsPerTerm = 7)
    val maxList = capped.groupBy("term").count().agg(max("count")).head().getLong(0)
    assert(maxList <= 7L)
    assert(Lexical.bm25Serve(queries(), capped, 5).count() > 0)
  }
}
