package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic invariants for the series/basket trio added in round 6:
  * cumulative-distinct window, exact-rational interpolation gap-fill,
  * and market-basket pair support. The DuckDB oracle proves engine
  * parity; these tests pin the *meaning* (monotonicity, knot
  * exactness, grid coverage, support bounds) independently of it. */
class SeriesBasketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("window_cume_distinct: monotone per user, ends at the exact distinct count") {
    val got = q("window_cume_distinct")
    val events = spark.read.parquet(s"$dir/events.parquet")

    // final value per user == exact count(distinct event_type)
    val finalPerUser = got.groupBy("user_id")
      .agg(max("types_so_far").as("seen"))
    val exact = events.groupBy("user_id")
      .agg(countDistinct("event_type").as("exact"))
    val joined = finalPerUser.join(exact, "user_id")
    assert(joined.filter(col("seen") =!= col("exact")).count() === 0)

    // running count never decreases along (ts, event_id) within a user
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
    val ordered = got
      .join(events.select("event_id", "ts"), "event_id")
      .withColumn("prev", lag("types_so_far", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
    assert(ordered.filter(col("prev") > col("types_so_far")).count() === 0)
    assert(w != null) // silence unused warning paranoia
  }

  test("ts_interpolate: exact at knots, contiguous daily grid, den divides gap") {
    val got = q("ts_interpolate").cache()
    // Tables exposes the nanosecond epoch as a proper `ts` timestamp;
    // the raw parquet column is BIGINT nanos and can't cast to date.
    val events = graft.sources.Tables(spark, dir, "events")
    val knots = events
      .withColumn("day_no", datediff(col("ts").cast("date"), lit("1970-01-01")).cast("long"))
      .withColumn("cents", floor(col("value") * 100))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "day_no").orderBy("event_id")))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day_no").as("day"), col("cents"))

    // at every knot day the rational reduces exactly to the knot cents
    val atKnots = got.join(knots, Seq("user_id", "day"))
    assert(atKnots.count() === knots.count())
    assert(atKnots
      .filter(col("interp_num") =!= col("cents") * col("interp_den"))
      .count() === 0)

    // grid is contiguous: per user, exactly (max_day - min_day + 1) rows
    val span = got.groupBy("user_id")
      .agg(count(lit(1)).as("n"), (max("day") - min("day") + 1).as("want"))
    assert(span.filter(col("n") =!= col("want")).count() === 0)
    got.unpersist()
  }

  test("scd2_intervals: per user, intervals chain exactly and types alternate") {
    val got = q("scd2_intervals").cache()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from_us")
    val chained = got
      .withColumn("next_from", lead("valid_from_us", 1).over(w))
      .withColumn("next_type", lead("event_type", 1).over(w))
    // each interval closes exactly where the next one opens; the open
    // interval (valid_to NULL) is only ever the user's last
    assert(chained.filter(col("next_from").isNotNull &&
      col("valid_to_us") =!= col("next_from")).count() === 0)
    assert(chained.filter(col("next_from").isNull &&
      col("valid_to_us").isNotNull).count() === 0)
    // SCD2 meaning: consecutive intervals carry DIFFERENT values
    assert(chained.filter(col("next_type").isNotNull &&
      col("next_type") === col("event_type")).count() === 0)
    got.unpersist()
  }

  test("scd2_merge_incremental equals the batch rebuild on real data") {
    val inc = q("scd2_merge_incremental")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val full = q("scd2_intervals")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(inc === full)
    assert(inc.nonEmpty)
  }

  test("scd2 merge: untouched users pass through, continuation extends, flip closes") {
    // crafted history (every test-data user has late events, so the
    // anti-join passthrough never engages there): user 1 stops before
    // the split (passthrough), user 2 continues its open type
    // (silent extension), user 3 flips (open interval closes), user 4
    // is brand new (no seed)
    import spark.implicits._
    val ev = Seq(
      (1L, "a", 100L, 1L), (1L, "b", 200L, 2L),               // untouched
      (2L, "a", 110L, 3L), (2L, "a", 900L, 4L),               // continuation
      (3L, "a", 120L, 5L), (3L, "b", 910L, 6L),               // flip
      (4L, "c", 920L, 7L)                                     // new user
    ).toDF("user_id", "event_type", "tus", "event_id")
    val got = graft.operators.Scd2.mergeIncremental(ev, 500L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val want = Set(
      (1L, "a", 100L, 200L), (1L, "b", 200L, -1L),
      (2L, "a", 110L, -1L),
      (3L, "a", 120L, 910L), (3L, "b", 910L, -1L),
      (4L, "c", 920L, -1L))
    assert(got === want)
    // and the incremental result matches the full rebuild
    val full = graft.operators.Scd2.intervals(ev)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got === full)
  }

  test("scd2 merge: out-of-order batch rejected; random in-order folds equal full rebuild") {
    import spark.implicits._
    def shape(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

    // a batch row BEFORE a user's open-interval start must be rejected
    // loudly — interval state cannot resplice closed history
    val stored = graft.operators.Scd2.intervals(
      Seq((2L, "a", 110L, 3L), (2L, "b", 400L, 4L))
        .toDF("user_id", "event_type", "tus", "event_id"))
    val late = Seq((2L, "c", 50L, 9L)).toDF("user_id", "event_type", "tus", "event_id")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Scd2.mergeBatch(stored, late)
    }
    assert(ex.getMessage.contains("OUT-OF-ORDER"))

    // property: any in-order sequence of batch folds equals the full
    // rebuild — randomized cut points, multiple trials
    val rnd = new scala.util.Random(42)
    val types = Array("a", "b", "c")
    val evDf = (1 to 400).map { i =>
      ((rnd.nextInt(12) + 1).toLong, types(rnd.nextInt(3)), (i * 10).toLong, i.toLong)
    }.toDF("user_id", "event_type", "tus", "event_id")
    val full = shape(graft.operators.Scd2.intervals(evDf).collect())
    (0 until 3).foreach { trial =>
      val cuts = (Seq(Long.MinValue) ++
        Seq.fill(3)(rnd.nextInt(4000).toLong).sorted ++ Seq(Long.MaxValue)).distinct
      var state = graft.operators.Scd2.intervals(
        evDf.filter(col("tus") < cuts(1))).localCheckpoint(true)
      cuts.sliding(2).drop(1).foreach { case Seq(lo, hi) =>
        state = graft.operators.Scd2.mergeBatch(state,
          evDf.filter(col("tus") >= lo && col("tus") < hi)).localCheckpoint(true)
      }
      assert(shape(state.collect()) === full, s"trial $trial cuts $cuts")
    }
  }

  test("scd2 mergeBatchRecovering: arbitrary out-of-order batch splits equal full rebuild") {
    import spark.implicits._
    def shape(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

    // the exact case mergeBatch rejects: with the log supplied, user 2
    // is rebuilt from it instead
    val storedEv = Seq((2L, "a", 110L, 3L), (2L, "b", 400L, 4L))
      .toDF("user_id", "event_type", "tus", "event_id")
    val late = Seq((2L, "c", 50L, 9L)).toDF("user_id", "event_type", "tus", "event_id")
    val log0 = storedEv.unionByName(late)
    val recovered = shape(graft.operators.Scd2.mergeBatchRecovering(
      graft.operators.Scd2.intervals(storedEv), late, log0).collect())
    assert(recovered === shape(graft.operators.Scd2.intervals(log0).collect()))

    // property: events assigned to batches with NO regard for time —
    // every batch is out of order for some users — folding with
    // recovery must still equal the full rebuild at every step's end
    val rnd = new scala.util.Random(7)
    val types = Array("a", "b", "c")
    val rows = (1 to 300).map { i =>
      ((rnd.nextInt(10) + 1).toLong, types(rnd.nextInt(3)),
        (rnd.nextInt(500) * 10).toLong, i.toLong)
    }
    val full = shape(graft.operators.Scd2.intervals(
      rows.toDF("user_id", "event_type", "tus", "event_id")).collect())
    (0 until 3).foreach { trial =>
      val assign = rows.map(_ => rnd.nextInt(4))
      val batches = (0 until 4)
        .map(b => rows.zip(assign).collect { case (r, a) if a == b => r })
        .filter(_.nonEmpty)
        .map(_.toDF("user_id", "event_type", "tus", "event_id"))
      var state = graft.operators.Scd2.intervals(batches.head).localCheckpoint(true)
      var logSoFar = batches.head
      batches.tail.foreach { b =>
        logSoFar = logSoFar.unionByName(b).localCheckpoint(true)
        state = graft.operators.Scd2
          .mergeBatchRecovering(state, b, logSoFar).localCheckpoint(true)
      }
      assert(shape(state.collect()) === full, s"trial $trial")
    }
  }

  test("ts_autocorr_terms: pair counts and Cauchy-Schwarz hold at every lag") {
    val got = q("ts_autocorr_terms").cache()
    // n at lag L is knots-L (never negative, lags with no pairs absent)
    val knots = graft.sources.Tables(spark, dir, "events")
      .withColumn("day_no", datediff(col("ts").cast("date"), lit("1970-01-01")).cast("long"))
      .dropDuplicates("user_id", "day_no")
      .groupBy("user_id").agg(count(lit(1)).as("k"))
    val joined = got.join(knots, "user_id")
    assert(joined.filter(col("n") =!= col("k") - col("lag")).count() === 0)
    // |cov_num| ≤ n·sqrt((n·sxx−sx²)(n·syy−sy²)) — check the squared form
    // squared form reaches ~1e30 — DECIMAL(38,0) intermediates, the
    // query's own BIGINT outputs stay ≤ ~1e15
    val cs = got.selectExpr(
      "CAST(cov_num AS DECIMAL(38,0)) * cov_num AS lhs",
      "(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx) " +
        "* (CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy) AS rhs")
    assert(cs.filter(col("lhs") > col("rhs")).count() === 0)
    got.unpersist()
  }

  test("basket_pair_support: pairs ordered, support bounded by per-part counts, conf ≤ 1e6") {
    val got = q("basket_pair_support").cache()
    assert(got.filter(col("p1") >= col("p2")).count() === 0)
    assert(got.filter(col("conf_e6") > 1000000L).count() === 0)
    assert(got.filter(col("support") < 1L).count() === 0)

    // support(p1,p2) ≤ min(orders containing p1, orders containing p2)
    val items = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val per = items.groupBy("pk").agg(count(lit(1)).as("n_ok"))
    val checked = got
      .join(per.withColumnRenamed("pk", "p1").withColumnRenamed("n_ok", "n1"), "p1")
      .join(per.withColumnRenamed("pk", "p2").withColumnRenamed("n_ok", "n2"), "p2")
    assert(checked.filter(col("support") > least(col("n1"), col("n2"))).count() === 0)
    got.unpersist()
  }
}
