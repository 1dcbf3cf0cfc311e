package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A1/A2 JDBC source mode — the reference's native source is a MySQL
  * database with filter predicates and the cohort limit spliced into
  * the SQL text by hand (`cnics_to_fhir.py:106-156`, cohort limit
  * `259-266`). Spark-first, none of that is manual: `spark.read.jdbc`
  * with `pushDownPredicate`/`pushDownLimit` enabled lets Catalyst
  * compile `Filter`/`Limit` nodes above the scan into the remote SQL
  * (visible as `PushedFilters` on the JDBCRelation scan node), and a
  * numeric `partitionColumn` splits the scan into `numPartitions`
  * range-bounded queries so a big table arrives in parallel instead of
  * through one cursor (the reference is single-cursor by construction).
  *
  * The engine's fixture corpus stays parquet; this source exists so a
  * deployment can point the same pipelines at the upstream database.
  */
object JdbcSource {

  /** Unpartitioned read (dimension-sized tables). */
  def table(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty): DataFrame = {
    org.apache.spark.sql.jdbc.GraftMySQLDialect.ensureRegistered()
    spark.read
      .option("pushDownPredicate", "true")
      .option("pushDownLimit", "true")
      .jdbc(url, table, toProps(props))
  }

  /** Range-partitioned read for large tables: `numPartitions` parallel
    * cursors over `[lower, upper]` strides of the numeric/temporal
    * `partitionColumn` (stride predicates are added server-side). */
  def partitionedTable(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long, numPartitions: Int,
      props: Map[String, String] = Map.empty): DataFrame = {
    org.apache.spark.sql.jdbc.GraftMySQLDialect.ensureRegistered()
    spark.read
      .option("pushDownPredicate", "true")
      .option("pushDownLimit", "true")
      .jdbc(url, table, partitionColumn, lower, upper, numPartitions, toProps(props))
  }

  private def toProps(m: Map[String, String]): Properties = {
    val p = new Properties()
    m.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }
}
