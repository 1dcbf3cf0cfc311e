package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F12/D4/D5 — the reconciliation MERGE at the heart of the reference
  * (cnics_to_fhir.py:548-584, 645-678, 728-763): classify source rows
  * vs current store contents by business key into insert / update /
  * delete actions.
  *
  * The reference does this as an O(n·m) nested Python loop per
  * patient; here it is a single full-outer hash join keyed on the
  * business identifier — shuffle-partitioned on the key, so at 100 TB
  * it scales horizontally and AQE handles key skew. When one side is
  * dimension-sized the optimizer (or an explicit hint by the caller)
  * turns it into a broadcast join.
  */
object Merge {

  val ActionCol = "merge_action"
  val StoreIdCol = "store_id"

  /** Classify `source` against `store` on equality of `keys`.
    *
    * `store` must carry the key columns plus an `id` column (the
    * store-assigned resource id, carried into updates — reference
    * lines 608/696/788). Result: all source columns + `merge_action`
    * ("insert" | "update" | "delete") + `store_id` (null for inserts).
    *
    * Contracts (property-tested):
    *  - insert ∪ update rows ≡ source rows
    *  - delete rows ≡ store ∖ source (by key)
    *  - re-running with store' = apply(actions) yields 0 inserts and
    *    0 deletes (idempotent re-run, the reference's steady state)
    */
  def classify(source: DataFrame, store: DataFrame, keys: Seq[String]): DataFrame = {
    val srcFlag = "__graft_src"
    val tgtFlag = "__graft_tgt"
    val s = source.withColumn(srcFlag, lit(true))
    val t = store
      .withColumnRenamed("id", StoreIdCol)
      .select((keys.map(col) :+ col(StoreIdCol) :+ lit(true).as(tgtFlag)): _*)
    s.join(t, keys, "full_outer")
      .withColumn(ActionCol,
        when(col(srcFlag).isNotNull && col(tgtFlag).isNotNull, "update")
          .when(col(tgtFlag).isNotNull, "delete")
          .otherwise("insert"))
      .drop(srcFlag, tgtFlag)
  }

  /** Split a classified actions frame. */
  def inserts(actions: DataFrame): DataFrame = actions.filter(col(ActionCol) === "insert")
  def updates(actions: DataFrame): DataFrame = actions.filter(col(ActionCol) === "update")
  def deletes(actions: DataFrame): DataFrame = actions.filter(col(ActionCol) === "delete")

  /** E1 — audit counters: action counts per resource type, the
    * reference's 12-counter summary (cnics_to_fhir.py:914-925). */
  def auditSummary(actions: DataFrame, resourceType: Column): DataFrame =
    actions.groupBy(resourceType.as("resource_type"), col(ActionCol))
      .agg(count(lit(1)).as("n"))
}
