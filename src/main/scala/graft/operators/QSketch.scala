package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic log-linear histogram quantile sketch.
  *
  * Bucketing (DDSketch-style, but integer-exact): a positive BIGINT
  * value v with octave e = ⌊log₂ v⌋ lands in bucket
  * `16·e + ⌊16·(v − 2ᵉ)/2ᵉ⌋` — 16 linear sub-buckets per octave, at
  * most 16·63 ≈ 1000 buckets over the whole BIGINT range. The bucket's
  * lower boundary under-estimates any member value by less than
  * 2ᵉ/16 + 1 ≤ boundary/16 + 1, so every quantile read off the sketch
  * satisfies `est ≤ exact` and `16·(exact − est) ≤ est + 16` (≈6.3%
  * one-sided relative error) — a provable contract, checked in-row by
  * the `qsketch_quantiles` query.
  *
  * Everything is integer arithmetic (⌊log₂⌋ via the length of the
  * binary string, powers via shifts), so a SQL replay is bit-exact —
  * unlike register-layout sketches (HLL) this estimator can be
  * hash-matched, not just bound-checked.
  *
  * Scale shape: the sketch frame `(grp, bucket, cnt)` is built by one
  * map-side-combinable groupBy over the data; it IS the mergeable
  * state — a histogram of a union is the bucket-wise sum of the
  * histograms, exactly (proven by `qsketch_rollup`, which re-aggregates
  * month sketches into quarters and hash-matches a from-scratch
  * oracle). Quantile extraction runs windows only over the sketch
  * itself (≤ ~1000 rows per group by construction), never the data.
  */
object QSketch {

  /** Bucket id for a positive (≥1) BIGINT column expression. The
    * octave comes from the codegen'd `graft_log2floor` Expression (one
    * numberOfLeadingZeros instruction — the SQL-replayable
    * `length(bin(v)) − 1` form would allocate a binary STRING per row
    * on the sketch build's hot path; the DuckDB oracle keeps the
    * string form, the values are identical). For octaves ≥ 4 the
    * sub-bucket is `(v − 2ᵉ) div (2ᵉ/16)` — the exact same floor as
    * `((v − 2ᵉ)·16) div 2ᵉ` because 16 divides 2ᵉ, but it never
    * overflows (the ·16 form exceeds BIGINT for e ≥ 59, an ANSI throw
    * on values near Long.MaxValue). Callers need
    * `GraftFunctions.register` (done by [[histogram]]). */
  def bucket(v: String): Column = {
    val e = s"graft_log2floor($v)"
    val pow = s"shiftleft(CAST(1 AS BIGINT), $e)"
    expr(s"""$e * 16 + (CASE WHEN $e >= 4
            THEN ($v - $pow) div ($pow div 16)
            ELSE (($v - $pow) * 16) div $pow END)""")
  }

  /** Lower boundary of a bucket id — the quantile estimate. Same
    * overflow-free rewrite: sub·(2ᵉ/16) == (sub·2ᵉ) div 16 exactly
    * when 16 divides 2ᵉ. */
  def lowerBound(bucket: String): Column = {
    val pow = s"shiftleft(CAST(1 AS BIGINT), $bucket div 16)"
    expr(s"""$pow + (CASE WHEN $bucket div 16 >= 4
            THEN ($bucket % 16) * ($pow div 16)
            ELSE (($bucket % 16) * $pow) div 16 END)""")
  }

  /** Grouped sketch: one row per (group, bucket) with its exact count. */
  def histogram(df: DataFrame, grpCol: String, valCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(grpCol).as("grp"), bucket(valCol).as("bucket"))
      .groupBy("grp", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Weighted sketch: bucket mass is the SUM of an integer weight
    * column instead of a row count, so [[quantiles]] over the result
    * yields WEIGHTED quantiles — "the value below which q% of the
    * total weight lies" (e.g. the order value splitting total revenue
    * in half). Same mergeable-state and hash-exactness properties:
    * weights add bucket-wise exactly. */
  def histogramWeighted(
      df: DataFrame, grpCol: String, valCol: String, weightCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(grpCol).as("grp"), bucket(valCol).as("bucket"),
        col(weightCol).cast("long").as("w"))
      .groupBy("grp", "bucket").agg(sum("w").as("cnt"))
  }

  /** Read quantiles (percent ranks, e.g. 50/90/99) off a
    * `(grp, bucket, cnt)` sketch frame: rank ⌈q·n/100⌉ in the bucket
    * cumulative counts, estimate = that bucket's lower boundary.
    * Output: (grp, q, n, est). The window is sketch-sized. */
  def quantiles(hist: DataFrame, qs: Seq[Int]): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val n = hist.groupBy("grp").agg(sum("cnt").as("n"))
    val targets = n.crossJoin(broadcast(qs.toDF("q")))
      .withColumn("rank", expr("(q * n + 99) div 100"))
    val ranked = hist.withColumn("cum",
      sum("cnt").over(Window.partitionBy("grp").orderBy("bucket")))
    ranked.join(broadcast(targets), "grp")
      .filter(col("cum") >= col("rank"))
      .groupBy("grp", "q", "n").agg(min("bucket").as("bucket"))
      .select(col("grp"), col("q"), col("n"), lowerBound("bucket").as("est"))
  }
}
