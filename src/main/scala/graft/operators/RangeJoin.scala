package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join: points joined to the intervals containing them
  * WITHOUT the cartesian product Spark plans for a bare non-equi
  * condition (BroadcastNestedLoopJoin, O(|P|·|I|) comparisons).
  *
  * Both sides are discretized on a fixed bucket width W: a point lands
  * in exactly one bucket (floor(v/W)); an interval [lo, hi] is exploded
  * to every bucket it covers. The join becomes an EQUI-join on the
  * bucket id (hash-partitionable, AQE/skew-aware) and the exact
  * `lo <= v <= hi` predicate only runs on bucket-colocated candidates.
  * Correctness: a matching (point, interval) pair shares the point's
  * bucket — which the interval necessarily covers — and ONLY that
  * bucket satisfies the equi-key, so no dedup pass is needed.
  *
  * Scale shape: shuffle is keyed on (bucket [, extra keys]), candidate
  * count is |P| + Σ_i ceil(span_i/W) rather than |P|·|I|. W is the cost
  * dial: too small explodes wide intervals into many rows, too large
  * degrades the bucket filter toward all-pairs; set it near the median
  * interval span. Degenerate inputs (an interval spanning the whole
  * domain) are bounded by `maxBucketsPerInterval` — wider intervals are
  * excluded from the join (the caller can anti-join them separately if
  * they matter), mirroring the LSH hot-bucket policy
  * (Dedup.dropHotBuckets) instead of silently going quadratic.
  *
  * Reference context: the reference has no range predicate joins (flat
  * equality scans only, cnics_to_fhir.py:106-156); this is part of the
  * general-analytics extension (SURVEY §7.5), sibling of AsofJoin.
  */
object RangeJoin {

  /** Join `points` (value column `vCol`) to `intervals` (`loCol`,
    * `hiCol`): one output row per (point, containing interval), with
    * all columns of both inputs. Empty intervals (lo > hi) match
    * nothing; null bounds/values are dropped.
    *
    * Column names of the two inputs must not collide (same precondition
    * as [[intervalOverlap]]), and neither input may already carry a
    * `__bucket` column — the post-join BETWEEN predicate resolves by
    * name, so a collision would make it ambiguous or silently bind to
    * the wrong side. Alias columns before calling if needed.
    */
  def pointInInterval(
      points: DataFrame,
      vCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      width: Double,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(width > 0, s"bucket width must be positive: $width")
    val p = points
      .filter(col(vCol).isNotNull)
      .withColumn("__bucket", floor(col(vCol) / width).cast("long"))
    val spanOk = floor(col(hiCol) / width).cast("long") -
      floor(col(loCol) / width).cast("long") < lit(maxBucketsPerInterval.toLong)
    val i = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol) && spanOk)
      .withColumn("__bucket",
        explode(sequence(
          floor(col(loCol) / width).cast("long"),
          floor(col(hiCol) / width).cast("long"))))
    p.join(i, Seq("__bucket"))
      .filter(col(vCol) >= col(loCol) && col(vCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval-overlap join: one output row per (left, right) pair of
    * intervals with `llo <= rhi && rlo <= lhi`. Both sides explode to
    * their covered buckets and equi-join on the bucket id; a pair of
    * overlapping intervals shares every bucket of the overlap region,
    * so to emit exactly once the pair is CLAIMED by the first shared
    * bucket — the bucket of max(llo, rlo), which both sides necessarily
    * cover. No distinct pass, no cartesian product. Column names of the
    * two inputs must not collide. */
  def intervalOverlap(
      left: DataFrame,
      lloCol: String,
      lhiCol: String,
      right: DataFrame,
      rloCol: String,
      rhiCol: String,
      width: Double,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(width > 0, s"bucket width must be positive: $width")
    def explodeSide(df: DataFrame, lo: String, hi: String) = {
      val spanOk = floor(col(hi) / width).cast("long") -
        floor(col(lo) / width).cast("long") < lit(maxBucketsPerInterval.toLong)
      df.filter(col(lo).isNotNull && col(hi).isNotNull &&
          col(lo) <= col(hi) && spanOk)
        .withColumn("__bucket",
          explode(sequence(
            floor(col(lo) / width).cast("long"),
            floor(col(hi) / width).cast("long"))))
    }
    explodeSide(left, lloCol, lhiCol)
      .join(explodeSide(right, rloCol, rhiCol), Seq("__bucket"))
      .filter(col(lloCol) <= col(rhiCol) && col(rloCol) <= col(lhiCol) &&
        col("__bucket") ===
          floor(greatest(col(lloCol), col(rloCol)) / width).cast("long"))
      .drop("__bucket")
  }
}
