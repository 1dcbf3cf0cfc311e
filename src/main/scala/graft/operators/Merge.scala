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

  /** Incremental-sync planner (extension — the reference re-PUTs its
    * whole cohort every run, cnics_to_fhir.py:548-584): diff the
    * freshly assembled source against the previous run's
    * `(key, content-hash)` manifest, so a re-sync touches the store
    * wire only for keys whose content actually changed.
    *
    * Returns `(dirty, manifest)`:
    *  - `dirty` — one `key` column: keys new in `cur`, keys whose hash
    *    changed, and keys present only in `prev` (they left the source
    *    and must DELETE). Unchanged keys are absent, which is the
    *    whole point: downstream scopes both the source and the store
    *    snapshot to `dirty`, and O(changed) rows — not O(cohort) —
    *    reach the store.
    *  - `manifest` — the next run's `(key, __h)` frame (write it only
    *    AFTER the store apply succeeds: a crash before the swing
    *    leaves the old manifest, and the next run re-finds the same
    *    dirty keys — PUT/DELETE are idempotent, so replay is safe).
    *
    * One hash join on `key`; the manifest is 16 bytes/row, so at a
    * 10⁸-patient site this is a dimension-sized shuffle, not a data
    * one. */
  def manifestDiff(cur: DataFrame, keyCol: String, contentCol: String,
      prev: DataFrame): (DataFrame, DataFrame) = {
    val manifest = cur.select(col(keyCol).as("key"),
      xxhash64(col(contentCol)).as("__h"))
    val dirty = manifest.withColumnRenamed("__h", "__h_cur")
      .join(prev.select(col("key"), col("__h").as("__h_prev")),
        Seq("key"), "full_outer")
      .filter(col("__h_cur").isNull || col("__h_prev").isNull ||
        col("__h_cur") =!= col("__h_prev"))
      .select("key")
    (dirty, manifest)
  }
}
