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
  lazy val all: Seq[QueryDef] = QueryDef.registry(Seq(
    RelationalQueries.defs,
    TpchMoreQueries.defs,
    TranscodeQueries.defs,
    TextDedupQueries.defs,
    SimilarityStreamQueries.defs,
    CurationQueries.defs,
    CnicsQueries.defs,
    SourceSinkQueries.defs
  ))

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
}
