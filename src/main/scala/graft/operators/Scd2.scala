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
    * The precondition check is a BEST-EFFORT TRIPWIRE, not a full
    * assertion: the probe catches any batch row older than its user's
    * open-interval START, but interval state cannot see events that
    * were ABSORBED into an interval (a same-type run keeps only its
    * first timestamp) — a late row of a different type landing between
    * the open-interval start and the newest absorbed event passes the
    * probe yet still diverges from a full rebuild. The full
    * precondition therefore remains the caller's; what the probe
    * guarantees is that the loudest violation class REJECTS, naming
    * the first offending row, instead of silently splicing closed
    * history. The check is one bounded probe job per merge (inner
    * join against the per-user open-interval frontier + limit 1).
    *
    * Recovery: pass `recoverLog` (the full event log that produced
    * `stored`, PLUS this batch's rows) and out-of-order users are
    * REBUILT from the log via [[intervals]] instead of rejected —
    * see [[mergeBatchRecovering]]. */
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

  /** [[mergeBatch]] with the auto-recovery its error message promises:
    * users whose batch rows arrive out of order are rebuilt from
    * `log` — the full event log that produced `stored`, plus this
    * batch's rows — while every well-ordered user still takes the
    * incremental open-tail path.
    *
    * Out-of-order detection here is EXACT, not the interval-state
    * tripwire: with the log in hand, a user is unsafe iff some batch
    * row's tus is ≤ the max tus of the user's NON-batch log rows
    * (batch rows are identified in the log by event_id). The ≤ is
    * deliberately conservative — an equal-timestamp arrival could
    * still splice via the event_id tie-break, and over-rebuilding is
    * always correct: a rebuilt user's output IS the full-recompute
    * answer. This closes the absorbed-event blind spot the
    * [[mergeBatch]] docstring describes: divergence there was
    * invisible to interval state, but the log sees every event.
    *
    * Cost at scale: one anti join of log×batch on event_id plus a
    * per-user max — both map-side-combinable — and the rebuild reads
    * only the unsafe users' log rows (left_semi). A standing pipeline
    * pays the log scan ONLY on batches that actually contain late
    * data if the caller probes with [[mergeBatch]] first and falls
    * back to this on rejection. */
  def mergeBatchRecovering(stored: DataFrame, batch: DataFrame,
      log: DataFrame): DataFrame = {
    val nonBatch = log.join(batch.select("event_id"), Seq("event_id"), "left_anti")
    val seen = nonBatch.groupBy("user_id").agg(max("tus").as("__max_seen_us"))
    val unsafe = batch.join(seen, Seq("user_id"))
      .filter(col("tus") <= col("__max_seen_us"))
      .select("user_id").distinct()
      .localCheckpoint(true) // reused by three pruning joins below
    val rebuilt = intervals(log.join(unsafe, Seq("user_id"), "left_semi"))
    mergeBatch(
        stored.join(unsafe, Seq("user_id"), "left_anti"),
        batch.join(unsafe, Seq("user_id"), "left_anti"))
      .unionByName(rebuilt)
  }
}
