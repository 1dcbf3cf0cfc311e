package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the per-user time-series family (ts_ewma_dyadic /
  * anomaly_trailing_z / ts_rolling_median / ts_drawdown) under the
  * worst key skew a window shape can face: ONE user owning 10M events
  * — the whole stream lands in a single window partition, i.e. a
  * single task. The point of evidence: these windows keep O(taps)
  * state (8 lags / running triple / 15-element buffer / running max),
  * so even a degenerate hub user costs seconds, not an OOM — the
  * honest contrast with buffering shapes (an unbounded collect_list
  * or a full-partition sort would die here).
  *
  * The synthetic stream has CLOSED-FORM answers, so exactness is
  * checked at soak scale, not just wall-clock:
  *  - hub user 1: 10M one-second-spaced events at a constant 5.00,
  *    with ten 1000.00 spikes (one per million events, last at the
  *    final row);
  *  - crowd: users 100..1099 × 1000 events each at a constant 7.00.
  *
  * Expected (derived in comments inline): EWMA settles to num=255·c
  * on every full-weight spike-free row (hub: 10M − 7 head − 73
  * spike-touched = 9 999 920; crowd: 993 per user); the anomaly
  * detector flags EXACTLY the ten spike rows (a single spike in a
  * 20-row baseline inflates the variance enough that the follower
  * rows stay under 3σ: dev² = (S−c)² vs thr = 171(S−c)²); the
  * rolling median never moves (one spike among 15 can't reach the
  * middle order statistics); the hub's max drawdown is exactly
  * spike − c and the crowd's is 0.
  *
  * Runs the REGISTERED SparkEntry queries on the synthetic table —
  * production query code, not a soak-local reimplementation. Prints
  * one JSON evidence line; recorded in BASELINE.md.
  */
object TsSoak {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = "/tmp/graft_tssoak"
    val base = 1704067200000000000L // 2024-01-01T00:00:00Z in ns
    val hub = spark.range(0, 10000000L).select(
      col("id").as("event_id"),
      (lit(base) + col("id") * 1000000000L).as("ts"),
      lit(1L).as("user_id"),
      when(col("id") % 1000000 === 999999, lit(1000.0)).otherwise(lit(5.0))
        .as("value"))
    val crowd = spark.range(0, 1000000L).select(
      (col("id") + 20000000L).as("event_id"),
      (lit(base) + (expr("id div 1000")) * 1000000000L).as("ts"),
      ((col("id") % 1000) + 100L).as("user_id"),
      lit(7.0).as("value"))
    hub.unionAll(crowd).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val qs = graft.SparkEntry.queries

    // EWMA: hub constant rows settle at num = 255·500; excluded are the
    // 7 renormalized head rows and the 73 spike-touched rows (9 spikes
    // × 8 taps + the final-row spike × 1). Crowd: 1000 users × 993.
    val (ewma, ewmaSec) = timed {
      qs("ts_ewma_dyadic")(spark, dir)
        .agg(
          sum(when(col("user_id") === 1 && col("wsum") === 255 &&
            col("ewma_num") === 255L * 500, 1L).otherwise(0L)).as("hub_settled"),
          sum(when(col("user_id") =!= 1 && col("wsum") === 255 &&
            col("ewma_num") === 255L * 700, 1L).otherwise(0L)).as("crowd_settled"),
          count(lit(1)).as("rows"))
        .collect()(0)
    }
    assert(ewma.getLong(0) == 9999920L, s"hub settled: ${ewma.getLong(0)}")
    assert(ewma.getLong(1) == 993000L, s"crowd settled: ${ewma.getLong(1)}")
    assert(ewma.getLong(2) == 11000000L, s"rows: ${ewma.getLong(2)}")

    // Anomaly: exactly the ten spike rows, nothing else on 11M events.
    val (anom, anomSec) = timed {
      qs("anomaly_trailing_z")(spark, dir)
        .select("user_id", "event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSet
    }
    val wantFlags = (0 until 10).map(k => (1L, 999999L + k * 1000000L)).toSet
    assert(anom == wantFlags, s"flags: $anom")

    // Rolling median: immovable — med2 = 2c on every row of both cohorts.
    val (med, medSec) = timed {
      qs("ts_rolling_median")(spark, dir)
        .agg(
          sum(when(col("user_id") === 1 && col("med2") === 1000L, 1L).otherwise(0L)),
          sum(when(col("user_id") =!= 1 && col("med2") === 1400L, 1L).otherwise(0L)))
        .collect()(0)
    }
    assert(med.getLong(0) == 10000000L, s"hub med: ${med.getLong(0)}")
    assert(med.getLong(1) == 1000000L, s"crowd med: ${med.getLong(1)}")

    // Drawdown: hub = spike − c exactly; every crowd user flat at 0.
    val (dd, ddSec) = timed {
      qs("ts_drawdown")(spark, dir)
        .agg(
          sum(when(col("user_id") === 1 && col("max_drawdown") === 99500L &&
            col("peak") === 100000L && col("n_events") === 10000000L, 1L)
            .otherwise(0L)),
          sum(when(col("user_id") =!= 1 && col("max_drawdown") === 0L &&
            col("peak") === 700L, 1L).otherwise(0L)),
          count(lit(1)))
        .collect()(0)
    }
    assert(dd.getLong(0) == 1L, s"hub drawdown row: ${dd.getLong(0)}")
    assert(dd.getLong(1) == 1000L, s"crowd drawdown rows: ${dd.getLong(1)}")
    assert(dd.getLong(2) == 1001L, s"users: ${dd.getLong(2)}")

    def r2(x: Double) = math.round(x * 100) / 100.0
    println(
      s"""{"soak":"ts_hub_user","rows":11000000,"hub_rows":10000000,""" +
      s""""ewma_sec":${r2(ewmaSec)},"anomaly_sec":${r2(anomSec)},""" +
      s""""median_sec":${r2(medSec)},"drawdown_sec":${r2(ddSec)},""" +
      s""""checks":"all-exact"}""")
    spark.stop()
  }
}
