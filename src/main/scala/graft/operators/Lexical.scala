package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical (sparse) retrieval: BM25 over term-keyed posting lists.
  *
  * Reference context: no text-retrieval surface in the reference
  * (cnics_to_fhir.py is an ETL job); this is the SURVEY §7.5 extension
  * completing the hybrid stack — `txt_bm25_topk` is the batch query,
  * [[graft.streaming.DocStreams.indexIngest]] maintains the same four
  * tables as a standing store, and [[searchStore]] serves from it.
  *
  * Exactness discipline (the repo-wide oracle contract): idf
  * = ln(1 + (N−df+½)/(df+½)) quantizes through DECIMAL(18,12)→6
  * digits immediately after the ln — the one libm call in the whole
  * scoring path; everything else is IEEE-exact rational arithmetic.
  * Each (doc, term) contribution quantizes to DECIMAL(18,8), so a doc
  * score is an order-free exact decimal SUM and the (score DESC,
  * doc_id) ranking ties identically in any engine.
  *
  * Scale shape: scoring is a term-keyed equi-join of broadcast query
  * terms against posting lists — cost follows the posting lists hit,
  * never the corpus. df and corpus stats are separate store-maintained
  * side tables (vocabulary-sized and 1-row), so a search never
  * re-aggregates the postings.
  */
object Lexical {

  val K1 = 1.2
  val B = 0.75
  // Spelled as literals, NOT derived (1.2 + 1.0 != the double literal
  // 2.2 in the last ulp) — the oracle SQL interpolates the same
  // literals, so both engines compute on identical doubles.
  val K1Plus1 = 2.2
  val OneMinusB = 0.25

  /** Posting lists: one row per (doc, term) with its term frequency. */
  def postings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(expr(graft.functions.TextFunctions.tokensSql(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Per-document token length (the BM25 length normalizer). */
  def doclens(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      size(expr(graft.functions.TextFunctions.tokensSql(textCol))).cast("long").as("dl"))

  /** Per-term document frequency from a posting table. */
  def termstats(post: DataFrame): DataFrame =
    post.groupBy("term").agg(count(lit(1)).as("df_cnt"))

  /** 1-row corpus stats (doc count, total token length). The sum is
    * null-guarded: an EMPTY batch (real streams deliver them) must
    * fold as (0, 0), not (0, null) — a null total would silently
    * poison every later fold's avgdl through the stats add. */
  def corpusStats(dlens: DataFrame): DataFrame =
    dlens.agg(count(lit(1)).as("n_docs"),
      coalesce(sum("dl"), lit(0L)).as("total_len"))

  /** Append the quantized BM25 contribution `__c8` (DECIMAL(18,8)) to
    * any frame carrying (tf, df_cnt, dl, n_docs, total_len) — shared
    * by the ad-hoc scorer and the precomputed impact index. */
  private def withContribution(df: DataFrame): DataFrame =
    df.withColumn("__idf6", round(
        log(lit(1.0) + (col("n_docs").cast("double") - col("df_cnt").cast("double") + 0.5) /
          (col("df_cnt").cast("double") + 0.5)).cast("decimal(18,12)"), 6)
        .cast("double"))
      .withColumn("__tff",
        (col("tf").cast("double") * K1Plus1) /
          (col("tf").cast("double") + lit(K1) * (lit(OneMinusB) +
            lit(B) * (col("dl").cast("double") /
              (col("total_len").cast("double") / col("n_docs").cast("double"))))))
      .withColumn("__c8",
        round((col("__idf6") * col("__tff")).cast("decimal(18,12)"), 8)
          .cast("decimal(18,8)"))

  /** BM25 top-`k` over prebuilt index tables. `queries` is
    * (query_id, qtext); terms are whitespace-split and deduped.
    * Output: (query_id, doc_id, n_terms, score, rnk). */
  def bm25TopK(post: DataFrame, dlens: DataFrame, tstats: DataFrame,
      stats: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val qterms = queries.select(col("query_id"),
      explode(expr("array_distinct(split(qtext, ' '))")).as("term"))
    withContribution(
      post.join(broadcast(qterms), Seq("term"))
        .join(broadcast(tstats), Seq("term"))
        .join(dlens, Seq("doc_id"))
        .crossJoin(broadcast(stats)))
      .groupBy("query_id", "doc_id")
      .agg(sum("__c8").as("__score_dec"), count(lit(1)).as("n_terms"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("__score_dec").desc, col("doc_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("n_terms"),
        round(col("__score_dec").cast("double"), 6).as("score"), col("rnk"))
  }

  /** Batch convenience: build the four index tables from `docs` and
    * score `queries` in one go (the `txt_bm25_topk` shape). */
  def bm25(docs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val post = postings(docs)
    val dl = doclens(docs)
    bm25TopK(post, dl, termstats(post), corpusStats(dl), queries, k)
  }

  /** Serve BM25 from a standing [[graft.streaming.DocStreams.indexIngest]]
    * store, pinned to `version` (defaults to CURRENT).
    *
    * Consistency without rewrites: postings/doclens are APPEND-ONLY
    * batch partitions (`postings/batch=N/`), so a reader pinned on
    * version `vN` filters `batch <= N` — partition pruning makes that
    * a planning-time file-list cut, and a half-appended next batch is
    * invisible until CURRENT swings. termstats/stats come from the
    * pinned version dir. One pointer read = one consistent snapshot. */
  def searchStore(spark: SparkSession, tableDir: String,
      queries: DataFrame, k: Int, version: Option[String] = None,
      predicate: Option[String] = None): DataFrame = {
    val ver = version.orElse(Lakehouse.currentVersion(spark, tableDir))
      .getOrElse(throw new IllegalStateException(s"no CURRENT pointer under $tableDir"))
    val maxBatch = Lakehouse.versionKey(ver).map(_._1)
      .getOrElse(throw new IllegalStateException(s"unparseable version '$ver'"))
    def pinned(t: String) =
      spark.read.parquet(s"$tableDir/$t")
        .filter(col("batch") <= maxBatch).drop("batch")
    // FILTERED retrieval (r16 — the lexical twin of the vector stores'
    // pre-filter): `predicate` evaluates on the per-doc `doclens` scan
    // (whose attr columns the fold declared via `attrCols`), and the
    // survivor ids left-semi-prune the postings BELOW the query-term
    // join — Lucene filtered-query semantics: candidates are
    // restricted, scoring statistics (df/avgdl/N) stay CORPUS-level,
    // so a doc's score is identical filtered or not.
    val dlens = predicate.map(p => pinned("doclens").filter(expr(p)))
      .getOrElse(pinned("doclens"))
    val posts = if (predicate.isEmpty) pinned("postings")
      else pinned("postings").join(dlens.select("doc_id"), Seq("doc_id"), "left_semi")
    bm25TopK(
      posts,
      dlens,
      Lakehouse.readVersion(spark, tableDir, ver, "termstats"),
      Lakehouse.readVersion(spark, tableDir, ver, "stats"),
      queries, k)
  }

  /** Right-to-be-forgotten for the APPEND store (the operation
    * [[Lakehouse.deleteWhere]] gives copy-on-write stores): remove
    * `docIds` from a [[graft.streaming.DocStreams.indexIngest]] store
    * and CORRECT the statistics, so a later [[searchStore]] equals a
    * from-scratch index over the surviving corpus exactly (tested).
    *
    * Mechanics: the doomed postings/doclens are located by a
    * column-pruned scan, only the batch partitions that actually
    * contain them are rewritten (survivors → a dot-prefixed tmp dir —
    * invisible to readers — then an atomic-rename swap), per-term df
    * decrements and the doc/len mass fold into a NEW termstats/stats
    * version (`v<id>c<n>`), and CURRENT swings last.
    *
    * Isolation caveat, stated plainly: unlike every other operation on
    * this store, deletion REWRITES partitions in place — a reader
    * pinned on an older version may fail mid-scan during the swap and
    * must retry. That is the same trade Delta/Iceberg make when
    * compliance vacuum removes files a stale reader holds:
    * right-to-be-forgotten beats reader isolation, by design.
    *
    * Returns the number of partitions rewritten. */
  def forgetDocs(spark: SparkSession, tableDir: String, docIds: Seq[Long]): Int = {
    val curName = Lakehouse.currentVersion(spark, tableDir).getOrElse(
      throw new IllegalStateException(s"no CURRENT pointer under $tableDir"))
    val cond = col("doc_id").isin(docIds: _*)
    // materialize the doomed rows BEFORE their files are rewritten:
    // the statistic corrections below must read pre-delete state
    def doomedIn(t: String) =
      spark.read.parquet(s"$tableDir/$t").filter(cond).localCheckpoint(true)
    val doomedPost = doomedIn("postings")
    val doomedDl = doomedIn("doclens")
    val rewritten =
      Lakehouse.deleteFromPartitions(spark, s"$tableDir/postings", cond) +
        Lakehouse.deleteFromPartitions(spark, s"$tableDir/doclens", cond)
    // exact statistic corrections: each doomed (doc, term) row is one
    // df decrement; terms reaching zero leave the vocabulary
    val dfDec = doomedPost.groupBy("term").agg(count(lit(1)).as("__dec"))
    val newTs = Lakehouse.readVersion(spark, tableDir, curName, "termstats")
      .join(dfDec, Seq("term"), "left")
      .select(col("term"),
        (col("df_cnt") - coalesce(col("__dec"), lit(0L))).as("df_cnt"))
      .filter(col("df_cnt") > 0)
    val dlLoss = doomedDl.agg(count(lit(1)).as("__nd"),
      coalesce(sum("dl"), lit(0L)).as("__dl"))
    val newStats = Lakehouse.readVersion(spark, tableDir, curName, "stats")
      .crossJoin(dlLoss)
      .select((col("n_docs") - col("__nd")).as("n_docs"),
        (col("total_len") - col("__dl")).as("total_len"))
    Lakehouse.bumpVersion(spark, tableDir) { vdir =>
      newTs.write.mode("overwrite").parquet(s"$vdir/termstats")
      newStats.write.mode("overwrite").parquet(s"$vdir/stats")
    }
    rewritten
  }

  /** Precomputed IMPACT INDEX: every posting scored up front —
    * (term, doc_id, c8s) with `c8s` the exact contribution as a
    * 1e-8-scaled BIGINT (DECIMAL(18,8) × 10⁸, lossless). Serving then
    * touches no df/doclen/stats table at all: one term-keyed join plus
    * integer adds. `maxPostingsPerTerm` is the static-pruning lever
    * (Carmel et al.): keep only the top-impact postings of each term,
    * bounding both index size and the per-query candidate set — the
    * cap that keeps a stop-word's posting list from dominating serving
    * cost at corpus scale (exact when uncapped; WindowGroupLimit keeps
    * the one-time build's per-term cut map-side). */
  def impactIndex(post: DataFrame, dlens: DataFrame, tstats: DataFrame,
      stats: DataFrame, maxPostingsPerTerm: Int = Int.MaxValue): DataFrame = {
    val scored = withContribution(
        post.join(broadcast(tstats), Seq("term"))
          .join(dlens, Seq("doc_id"))
          .crossJoin(broadcast(stats)))
      .select(col("term"), col("doc_id"),
        (col("__c8") * 100000000L).cast("long").as("c8s"))
    if (maxPostingsPerTerm == Int.MaxValue) scored
    else scored
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("term")
          .orderBy(col("c8s").desc, col("doc_id"))))
      .filter(col("__r") <= maxPostingsPerTerm)
      .drop("__r")
  }

  /** Bounded BM25 top-`k` as ONE aggregation: per-doc integer score
    * sums and the final (score DESC, doc_id) heap live in the same
    * Aggregator state, so the whole ranking is a single
    * ObjectHashAggregate — legal in a streaming query (where the
    * two-level groupBy of [[bm25TopK]] is not) and map-side combining
    * in batch. Exact: scaled-BIGINT adds are order-free. */
  final class ScoreTopKAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long), Map[Long, Long], Array[(Long, Long)]] {
    require(k > 0, s"k must be positive: $k")
    def zero: Map[Long, Long] = Map.empty
    def reduce(m: Map[Long, Long], x: (Long, Long)): Map[Long, Long] =
      m.updated(x._1, m.getOrElse(x._1, 0L) + x._2)
    def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      b.foldLeft(a) { case (m, (d, s)) => m.updated(d, m.getOrElse(d, 0L) + s) }
    def finish(m: Map[Long, Long]): Array[(Long, Long)] =
      m.toArray.sortWith { case ((d1, s1), (d2, s2)) =>
        s1 > s2 || (s1 == s2 && d1 < d2)
      }.take(k)
    def bufferEncoder: org.apache.spark.sql.Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** ONLINE BM25 serving (the lexical half of the hybrid stack, under
    * the annServe/fingerprintServe discipline): `queryStream` rows are
    * (query_id, qtext); the stream side is a pure projection (term
    * explode), joined term-keyed against the precomputed
    * [[impactIndex]], and ranked by the single-aggregation
    * [[ScoreTopKAgg]] — the stream never shuffles before its one
    * aggregation. Output per emission: (query_id, rnk, doc_id, score),
    * row-for-row equal to [[bm25TopK]] over the same index
    * (equivalence-tested in LexicalSpec; score = c8-sum, single
    * double rounding on both paths). */
  def bm25Serve(queryStream: DataFrame, impactIdx: DataFrame, k: Int,
      docFilter: Option[DataFrame] = None): DataFrame = {
    val qterms = queryStream.select(col("query_id"),
      explode(expr("array_distinct(split(qtext, ' '))")).as("term"))
    val topk = udaf(new ScoreTopKAgg(k))
    // filtered online serving: the survivor-id frame prunes the
    // impact index on the BATCH side (stream-legal), below the
    // query-term join — scores stay corpus-level (searchStore's
    // Lucene filtered-query semantics)
    val idx = docFilter.map(f => impactIdx.join(
        f.select(col(f.columns.head).as("doc_id")), Seq("doc_id"), "left_semi"))
      .getOrElse(impactIdx)
    qterms.join(idx, Seq("term"))
      .groupBy("query_id")
      .agg(topk(col("doc_id"), col("c8s")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rnk"),
        col("e._1").as("doc_id"),
        round(col("e._2").cast("double") / lit(1.0e8), 6).as("score"))
  }
}
