package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the extension
  * operator set) is exposed as a named query over the fixture corpus,
  * paired with a DuckDB oracle where the semantics are SQL-expressible.
  */
object SparkEntry {

  /** All query packs. Order is presentation-only; names must be unique. */
  private lazy val packs: Seq[(String, Seq[QueryDef])] = Seq(
    "relational" -> RelationalQueries.defs,
    "tpch" -> TpchMoreQueries.defs,
    "transcode" -> TranscodeQueries.defs,
    "textdedup" -> TextDedupQueries.defs,
    "simstream" -> SimilarityStreamQueries.defs,
    "curation" -> CurationQueries.defs,
    "cnics" -> CnicsQueries.defs,
    "sourcesink" -> SourceSinkQueries.defs
  )

  lazy val all: Seq[QueryDef] = QueryDef.registry(packs.map(_._2))

  /** Query name → pack name, for the Verify sweep's per-family
    * runtime budget lines (round-12 verdict #8). */
  lazy val families: Map[String, String] =
    packs.flatMap { case (f, defs) => defs.map(_.name -> f) }.toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "q1_pricing_summary").get.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Headline queries for Bench. */
  def benchNames: Seq[String] = all.filter(_.bench).map(_.name)

  /** The CORE bench set, run every round so per-round artifacts stay
    * comparable as the registry grows (round-10 verdict #8): the
    * round-1-baselined queries plus the dedup / ANN / serving / graph
    * headliners. Everything else in [[benchNames]] is the EXTENDED set,
    * benched at round close (SPARK_GRAFT_BENCH_SET=all) to keep
    * ratcheting bench_best.json over the full registry — bench_best
    * keys are unchanged by the split. */
  val benchCoreNames: Seq[String] = Seq(
    // round-1 baseline set (BENCH_r01 keys)
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "d3_fanout_join", "window_running_sum", "asof_join_events",
    "ev_sessionize", "ev_window_tumbling", "dedup_exact",
    "dedup_minhash_bands", "dedup_lsh_pairs", "dedup_neardup_pipeline",
    "sim_cosine_topk", "txt_quality",
    // cheap TPC-H continuity rows (contention canaries: code-untouched,
    // sub-second, so uniform inflation is visible on them first)
    "q6_forecast_revenue", "q9_profit_by_nation",
    // dedup / fingerprint headliners
    "dedup_simhash_hamming", "dedup_substring_windows",
    "dedup_components", "sem_dedup_clusters", "fp_search_index",
    // ANN / serving headliners (pq_ivf_adc_topk is the exploded
    // oracle-shape row; pq_ivf_adc_packed_topk is the production
    // packed-kernel plan — benched as a pair per round-12 verdict #6;
    // pq_ivfres_packed_topk is the round-13 residual IVFADC twin, and
    // ivfres_serve_pinned its production serve number off the pinned
    // store — paired per round-13 verdict #7 so the artifact carries
    // both the train-replaying one-shot and the amortized serve)
    "pq_adc_topk", "pq_ivf_adc_topk", "pq_ivf_adc_packed_topk",
    "pq_ivfres_packed_topk", "ivfres_serve_pinned",
    // the MIPS family's production serves off their pinned standing
    // stores (r14 verdict #6 — the family's wall-clock now ratchets
    // per round; hash-prune and partition-prune benched side by side)
    "mips_alsh_serve_pinned", "mips_ivf_serve_pinned",
    "nb_serve_classify",
    "txt_bm25_serve", "split_by_cluster",
    // the heaviest graph row keeps iterative-plan timing visible per round
    "pagerank_purchase_graph")

  /** A stale core name (query renamed, bench flag dropped) must fail
    * LOUDLY, not silently shrink the core set while the run stays
    * green — the same silent-shrink class the SPARK_GRAFT_BENCH_SET
    * sys.error guards (ADVICE, round 12). Checked here (not in Bench)
    * so the registry invariant also trips in tests. */
  def requireCoreSubset(): Unit = {
    val missing = benchCoreNames.toSet -- benchNames.toSet
    require(missing.isEmpty,
      s"benchCoreNames not registered as bench queries: ${missing.toSeq.sorted.mkString(", ")}")
  }
}
