package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query paired with an (optional) DuckDB oracle.
  *
  * The oracle SQL must produce the exact same column NAMES as the Spark
  * result (the driver sorts columns by name before hashing values), and
  * numerically identical values — float-producing aggregations are
  * rounded identically on both sides when summation order could differ.
  */
final case class QueryDef(
    name: String,
    description: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object QueryDef {
  /** Assemble a registry from packs, failing fast on duplicate names. */
  def registry(packs: Seq[Seq[QueryDef]]): Seq[QueryDef] = {
    val all = packs.flatten
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(",")}")
    all
  }
}
