package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the latest right row with
  * right.time <= left.time within the same key — an operator Spark
  * lacks natively (SURVEY.md §2-I / §7.3 preference (a): compose
  * built-ins when semantics allow, before reaching for a custom
  * SparkPlan).
  *
  * Formulation: union both sides tagged, sort per key by (time, tag)
  * — right rows sort before left rows at equal times, giving the
  * inclusive <= semantics — and carry the last-seen right payload
  * forward with an ignore-nulls window. One shuffle on the key, no
  * range cross-product; skew is bounded by per-key cardinality (AQE
  * handles hot keys). This is the plan a 100 TB event table wants; a
  * bespoke SortMergeAsofExec would only shave the union overhead.
  *
  * Right-side ties on (key, time) must be pre-deduplicated by the
  * caller if determinism is required (same contract as DuckDB's
  * ASOF JOIN, which is the oracle for `asof_join_events`).
  */
object AsofJoin {

  /** Both frames must carry `keyCol` and numeric `timeCol` (e.g. epoch
    * ns). The right payload arrives as one struct column `asof_match`
    * containing (timeCol, payloadCols...). Inner semantics: left rows
    * with no prior right row are dropped. Left columns pass through. */
  def asof(leftDf: DataFrame, rightDf: DataFrame, keyCol: String, timeCol: String,
      payloadCols: Seq[String]): DataFrame =
    asofImpl(leftDf, rightDf, keyCol, timeCol, payloadCols, forward = false, toleranceNone)

  /** Forward as-of: for each left row, the EARLIEST right row with
    * right.time >= left.time in the same key — the "next event after"
    * direction (pandas merge_asof direction='forward'). Same one-
    * shuffle union+window plan, ordered descending so the carry-forward
    * sees the future. */
  def asofForward(leftDf: DataFrame, rightDf: DataFrame, keyCol: String, timeCol: String,
      payloadCols: Seq[String]): DataFrame =
    asofImpl(leftDf, rightDf, keyCol, timeCol, payloadCols, forward = true, toleranceNone)

  /** Tolerance-bounded as-of (either direction): matches further than
    * `tolerance` time units away are dropped (inner semantics, like
    * pandas merge_asof `tolerance=`). The bound is a post-window filter
    * on the matched pair — the window plan is unchanged, so the cost is
    * one codegen'd comparison per row. */
  def asofTolerance(leftDf: DataFrame, rightDf: DataFrame, keyCol: String, timeCol: String,
      payloadCols: Seq[String], tolerance: Long, forward: Boolean = false): DataFrame = {
    // a negative tolerance would alias the internal no-bound sentinel
    // and silently mean "unbounded" — reject it at the public surface
    require(tolerance >= 0L, s"tolerance must be >= 0: $tolerance")
    asofImpl(leftDf, rightDf, keyCol, timeCol, payloadCols, forward, tolerance)
  }

  private val toleranceNone = -1L

  private def asofImpl(leftDf: DataFrame, rightDf: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String], forward: Boolean,
      tolerance: Long): DataFrame = {
    val matchStruct = struct((timeCol +: payloadCols).map(col): _*)
    val matchType = rightDf.select(matchStruct).schema.head.dataType

    val leftTagged = leftDf
      .withColumn("__tag", lit(1))
      .withColumn("__rp", lit(null).cast(matchType))
    // right side exposes only key/time plus the payload struct; other
    // left columns become nulls through unionByName(allowMissing)
    val rightTagged = rightDf
      .select(col(keyCol), col(timeCol), matchStruct.as("__rp"))
      .withColumn("__tag", lit(0))

    // Backward: ascending time, right (tag 0) before left at equal
    // times ⇒ last-seen right is the latest with time <= left.time.
    // Forward: DESCENDING time with the same tag order ⇒ last-seen
    // right is the earliest with time >= left.time.
    val ord = if (forward) col(timeCol).desc else col(timeCol).asc
    val w = Window.partitionBy(keyCol)
      .orderBy(ord, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
      .withColumn("asof_match", last("__rp", ignoreNulls = true).over(w))
      .filter(col("__tag") === 1 && col("asof_match").isNotNull)
      .drop("__tag", "__rp")
    if (tolerance < 0L) joined
    else {
      val gap =
        if (forward) col(s"asof_match.$timeCol") - col(timeCol)
        else col(timeCol) - col(s"asof_match.$timeCol")
      joined.filter(gap <= tolerance)
    }
  }
}
