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
      payloadCols: Seq[String]): DataFrame = {
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

    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftTagged.unionByName(rightTagged, allowMissingColumns = true)
      .withColumn("asof_match", last("__rp", ignoreNulls = true).over(w))
      .filter(col("__tag") === 1 && col("asof_match").isNotNull)
      .drop("__tag", "__rp")
  }
}
