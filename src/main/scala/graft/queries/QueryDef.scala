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

  /** Temp dir for an in-row standing store / scratch sink, reaped at
    * JVM exit (ADVICE r13: query builders previously leaked one
    * orphaned temp dir per invocation into /tmp across Verify/bench
    * runs — forceDeleteOnExit registers a recursive delete with the
    * JVM, so a run cleans up after itself while the dir stays live for
    * the whole session, which re-invocation within one JVM requires). */
  private[queries] def tempStoreDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    org.apache.commons.io.FileUtils.forceDeleteOnExit(p.toFile)
    p.toString
  }
}
