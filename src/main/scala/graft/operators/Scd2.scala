package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD type-2 dimension-history derivation and incremental maintenance
  * over an append-only event stream. Input shape for both entry
  * points: `(user_id, event_type, tus, event_id)` with `tus` the µs
  * event time and `event_id` a unique tie-break.
  *
  * Reference context: `cnics_to_fhir.py` reconciles full snapshots
  * (Merge.scala); SCD2 is the standing-history counterpart every
  * lakehouse pipeline materializes — part of the extension surface
  * (SURVEY §7.5), not a reference behavior.
  */
object Scd2 {

  private val w = Window.partitionBy("user_id").orderBy("tus", "event_id")

  /** Validity intervals of each user's `event_type`: a change row opens
    * an interval at its time, the next change closes it (NULL = still
    * current). Both windows partition on user_id → one exchange. */
  def intervals(ev: DataFrame): DataFrame = ev
    .withColumn("chg", !(lag("event_type", 1).over(w) <=> col("event_type")))
    .filter(col("chg"))
    .select(col("user_id"), col("event_type"),
      col("tus").as("valid_from_us"),
      lead("tus", 1).over(w).as("valid_to_us"))

  /** Fold the batch `ev.tus ≥ splitUs` into the stored intervals built
    * from `ev.tus < splitUs`, touching only the OPEN TAIL of users
    * present in the batch: closed intervals pass through verbatim and
    * untouched users' open intervals cross one anti join, nothing
    * more. Append-only time (every batch timestamp ≥ every stored one)
    * makes the tail rebuild provably equal to a full recompute —
    * `intervals(ev)` — which is what the oracle replays.
    *
    * The seed row trick: a touched user's open interval re-enters
    * change detection as a synthetic `event_id = −1` row carrying its
    * type and ORIGINAL start, so a batch continuing the same type
    * extends the interval silently while a type flip closes it at the
    * first new change. The stored frame is checkpointed to stand in
    * for a materialized table. */
  def mergeIncremental(ev: DataFrame, splitUs: Long): DataFrame =
    mergeBatch(
      intervals(ev.filter(col("tus") < splitUs)).localCheckpoint(true),
      ev.filter(col("tus") >= splitUs))

  /** The stored × batch core of [[mergeIncremental]], for callers that
    * hold a materialized interval table (the streaming maintainer
    * folds each micro-batch through this). PRECONDITION: append-only
    * time — every batch timestamp ≥ every stored one (the streaming
    * caller's in-order-replay/watermark responsibility).
    *
    * The precondition is ASSERTED, not assumed: a batch row older than
    * its user's open-interval start would splice history that the
    * user's closed intervals no longer see, and interval state cannot
    * repair that (events absorbed into an interval are gone) — so the
    * merge REJECTS loudly, naming the first offending row, instead of
    * silently diverging from a full rebuild. Recovery is the caller's:
    * rebuild the touched users with [[intervals]] over the full event
    * log. The check is one bounded probe job per merge (inner join
    * against the per-user open-interval frontier + limit 1); rows at
    * or after the frontier — including same-type late arrivals inside
    * the open interval — are mergeable and pass. */
  def mergeBatch(stored: DataFrame, batch: DataFrame): DataFrame = {
    val frontier = stored.filter(col("valid_to_us").isNull)
      .select(col("user_id"), col("valid_from_us").as("__frontier_us"))
    val offending = batch.join(frontier, Seq("user_id"))
      .filter(col("tus") < col("__frontier_us"))
      .select("user_id", "tus", "__frontier_us").limit(1).collect()
    require(offending.isEmpty,
      s"Scd2.mergeBatch: OUT-OF-ORDER batch — user ${offending.headOption.map(_.get(0)).orNull} " +
        s"has tus=${offending.headOption.map(_.get(1)).orNull} before its open-interval start " +
        s"${offending.headOption.map(_.get(2)).orNull}; closed history cannot be respliced " +
        "from interval state. Replay in event-time order, or rebuild that user " +
        "with Scd2.intervals over the full event log.")
    val touched = batch.select("user_id").distinct()
    val closed = stored.filter(col("valid_to_us").isNotNull)
    val openUntouched = stored.filter(col("valid_to_us").isNull)
      .join(touched, Seq("user_id"), "left_anti")
    val seed = stored.filter(col("valid_to_us").isNull)
      .join(touched, Seq("user_id"), "left_semi")
      .select(col("user_id"), col("event_type"),
        col("valid_from_us").as("tus"), lit(-1L).as("event_id"))
    val rebuilt = intervals(seed.unionByName(batch))
    closed.unionByName(openUntouched).unionByName(rebuilt)
  }
}
