package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape
  * (SURVEY.md §7.5 / H): the same transforms the batch queries use,
  * expressed on an unbounded stream with watermarked event time.
  *
  * The reference is pure batch; its reconcile-against-store behavior is
  * micro-batch CDC, which maps to `foreachBatch(merge)` here. At scale
  * the stream is partitioned by source; state (windows, sessions) is
  * keyed and spills through the state store.
  */
object EventStreams {

  /** Canonical parquet-on-disk schema of `events`: `ts` is a real
    * µs-precision TIMESTAMP (the current fixture encoding). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType), // TIMESTAMP(MICROS) on disk
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet files.
    * `maxFilesPerTrigger` bounds each micro-batch (so the watermark
    * advances between files instead of one giant batch). Normalization
    * to the `ts`+`ts_ns` contract is single-sourced through
    * [[graft.sources.Tables.normalizeEvents]] — a fixture encoding
    * change lands in one place, not two. */
  def readEventStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "*.parquet")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    graft.sources.Tables.normalizeEvents(reader.parquet(dir))
  }

  /** Watermarked 5-minute tumbling counts — streaming twin of the
    * `ev_window_tumbling` batch query. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Watermarked 10-minute windows sliding every 5 — each event lands
    * in 2 overlapping windows (the Expand the batch twin plans); state
    * per (window, type) key is evicted once the watermark passes the
    * window end, so overlap multiplies state by length/slide, not by
    * stream history. Streaming twin of the `ev_window_sliding` batch
    * query. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Stream-stream interval join: each click joined to the same user's
    * views from the preceding `window` — the streaming relative of the
    * as-of join family. Both sides are watermarked, so join state for
    * rows older than watermark + interval is evicted instead of
    * accumulating forever (the state-retention contract that makes
    * stream-stream joins viable at scale). */
  def clickViewIntervalJoin(clicks: DataFrame, views: DataFrame,
      window: String = "10 minutes", watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val v = views.withWatermark("ts", watermark)
      .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    c.join(v,
      col("user_id") === col("v_user_id") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $window") &&
        col("view_ts") <= col("click_ts"))
      .select("user_id", "click_id", "view_id")
  }

  /** Watermarked tumbling-window KMV distinct-user estimate per event
    * type — a MERGEABLE SKETCH as streaming aggregation state. The KMV
    * buffer (≤ K sorted longs) is the per-(window, type) state Spark
    * carries and merges across micro-batches; exact distinct state
    * would grow with the stream, the sketch is bounded O(K). Identical
    * integer arithmetic to the batch `distinct_kmv_users` surface, so
    * the streamed estimates equal a batch run over the same data
    * (equivalence-tested). */
  def kmvDistinctCounts(events: DataFrame): DataFrame = {
    val kmv = org.apache.spark.sql.functions.udaf(graft.functions.KmvAgg)
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "60 minutes").as("w"), col("event_type"))
      .agg(kmv(col("user_id").cast("long")).as("est_users"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("est_users"))
  }

  /** Watermarked tumbling-window QUANTILE-SKETCH histogram per event
    * type — the QSketch `(window, type, bucket, cnt)` frame as
    * streaming aggregation state. Bucket counts are plain sums, so
    * they merge across micro-batches exactly (histogram of a union is
    * the bucket-wise sum of histograms) and the streamed sketch is
    * bit-identical to a batch build over the same data
    * (equivalence-tested); quantiles read downstream inherit QSketch's
    * ≤1/16 one-sided bound. State per (window, type) is bounded by the
    * ~1000-bucket id space, never by the data. */
  def qsketchHistograms(events: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    events
      .withWatermark("ts", "10 minutes")
      .withColumn("c", expr("greatest(CAST(floor(value * 100 + 0.5D) AS BIGINT), 1)"))
      .groupBy(window(col("ts"), "60 minutes").as("w"), col("event_type"),
        graft.operators.QSketch.bucket("c").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("bucket"), col("cnt"))
  }

  /** Streaming twin of the `cms_heavy_hitters` counter grid: the
    * count-min sketch maintained as streaming aggregation state. The
    * grid is a (row, hash-bucket) → count frame, and counts are plain
    * sums — they merge across micro-batches exactly (a CMS of a union
    * is the cell-wise sum of the CMSs), so the streamed grid is
    * bit-identical to a batch build over the same data
    * (equivalence-tested) and frequency estimates read downstream
    * inherit the one-sided est ≥ exact guarantee. State is the fixed
    * O(D·W) cell space — 4×1024 — regardless of stream history: the
    * third mergeable-sketch state shape beside [[kmvDistinctCounts]]
    * and [[qsketchHistograms]]. */
  def cmsGrid(events: DataFrame): DataFrame = {
    val P = 1000003L; val W = 1024; val D = 4
    events
      .select(col("user_id"), explode(sequence(lit(0), lit(D - 1))).as("j"))
      .withColumn("bucket",
        ((col("j") * 2 + 3) * (col("user_id") % P) + (col("j") * 7919 + 13)) % P % W)
      .groupBy("j", "bucket").agg(count(lit(1)).as("c"))
  }

  /** Stream-static broadcast enrichment: the third join class beside
    * stream-stream and foreachBatch — a static dimension joined into
    * the stream. Stateless (no watermark, no state store): every
    * micro-batch hash-joins against the broadcast static frame, the
    * stream side never shuffles. At scale this is the
    * dimension-attach of the batch pipelines applied per micro-batch. */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      key: String = "event_type"): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key))

  /** Micro-batch CDC into a FhirStore — the streaming form of the batch
    * pipeline's reconcile (`foreachBatch(merge)`, SURVEY.md §2-H note).
    * Each batch is a DELTA of resource rows (key, id, json, deleted):
    * absence means "no change", so the merge's store-only rows are NOT
    * deletes here; deletes come only from explicit tombstone rows
    * (`deleted = true`). Inside each batch the store snapshot → classify
    * → applyActions path is exactly the batch engine's, so streaming
    * and batch reconciliation can never diverge semantically. */
  def cdcUpserts(stream: DataFrame, store: graft.sinks.FhirStore,
      resourceType: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val snap = store.snapshot(spark, resourceType).filter(col("key").isNotNull)
        val live = batch.filter(!coalesce(col("deleted"), lit(false)))
          .select("key", "id", "json")
        val upserts = graft.operators.Merge.classify(live, snap, Seq("key"))
          .filter(col(graft.operators.Merge.ActionCol) =!= "delete") // delta: absence ≠ delete
          .withColumn("id", coalesce(col(graft.operators.Merge.StoreIdCol), col("id")))
          .select("key", "id", "json", graft.operators.Merge.ActionCol)
        val tombstones = batch.filter(coalesce(col("deleted"), lit(false)))
          .select(col("key"), col("id"), lit(null).cast("string").as("json"),
            lit("delete").as(graft.operators.Merge.ActionCol))
        store.applyActions(resourceType, upserts.union(tombstones))
        ()
      }
      .start()

  /** Streaming SCD2 maintainer: fold each micro-batch of events into a
    * parquet-backed dimension-history table via
    * [[graft.operators.Scd2.mergeBatch]] — the standing "current +
    * history" view every lakehouse keeps, maintained incrementally
    * instead of rebuilt. Copy-on-write per batch (the ParquetFhirStore
    * discipline: write the merged table to a fresh versioned dir, then
    * repoint), so readers never see a half-written table and the merge
    * reads the PREVIOUS version while writing the next.
    *
    * Append-only-time caveat inherited from mergeBatch: batches must
    * arrive in event-time order across batches (an in-order replay or
    * a watermark-gated source); closed intervals are immutable. */
  def scd2Maintain(stream: DataFrame, tableDir: String):
      org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val spark = batch.sparkSession
        val cur = new java.io.File(s"$tableDir/CURRENT")
        val ev = batch.select(col("user_id"), col("event_type"),
          expr("ts_ns div 1000").as("tus"), col("event_id"))
        val merged =
          if (cur.exists()) {
            val prev = scala.io.Source.fromFile(cur).mkString.trim
            graft.operators.Scd2.mergeBatch(
              spark.read.parquet(s"$tableDir/$prev"), ev)
          } else graft.operators.Scd2.intervals(ev)
        merged.write.mode("overwrite").parquet(s"$tableDir/v$id")
        val tmp = new java.io.File(s"$tableDir/CURRENT.tmp")
        java.nio.file.Files.write(tmp.toPath,
          s"v$id".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp.toPath, cur.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        ()
      }
      .start()

  /** Streaming exactly-once dedup on `event_id` with bounded state:
    * duplicates whose event times fall within the watermark window are
    * dropped, and key state is evicted once the watermark passes — the
    * streaming twin of batch `dropDuplicates`, viable at scale because
    * state size tracks the watermark window, not the stream history. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Absolute cap on the dimension rows [[asofEnrichStatic]] will
    * collect into its broadcast index — the same absolute-guard
    * discipline as `Dedup.MaxBucket` and the sparse-cosine `MaxDf`: a
    * "static side" that is actually a fact table must never OOM the
    * driver silently. The FINAL index at 2 M rows is ~48 MB of packed
    * long arrays, but building it materializes ~2 M boxed tuples on
    * the driver transiently — budget several× that (a few hundred MB
    * of short-lived driver heap) before raising the cap; above it use
    * [[asofEnrichStaticBatched]] (the shuffle as-of plan per
    * micro-batch, no driver collect). */
  val MaxAsofStaticRows: Int = 2000000

  /** Stream-static AS-OF enrichment: each streaming row gets the
    * LATEST static right row with right.time <= row.time for its key —
    * the streaming twin of [[graft.operators.AsofJoin.asof]], for the
    * "enrich live events with the most recent reference version" case
    * (rates, configs, slowly-changing dims).
    *
    * The right side is a DIMENSION: collected once into per-key sorted
    * arrays and broadcast (dictionary-sized, the `CnicsCsv` code-list
    * precedent), so the stream side is STATELESS — no shuffle, no
    * watermark, no state store; one binary search per row. A
    * stream-stream as-of would need interval-join state; for static
    * reference data this lookup is the scale shape.
    *
    * The collect is GUARDED by `maxIndexRows` (default
    * [[MaxAsofStaticRows]]): an oversized dimension fails fast with a
    * pointer at [[asofEnrichStaticBatched]] instead of OOMing the
    * driver. The check is a `limit(max+1).count()` probe — bounded
    * work even when the "dimension" is a 10⁹-row fact table.
    *
    * Duplicate (key, time) right rows resolve DETERMINISTICALLY to the
    * greatest payload (the index sorts on (time, payload), and the
    * rightmost entry at the match time wins). The batch twin leaves
    * that tie to the caller — pre-deduplicate the dimension when
    * batch/stream parity on tied rows matters.
    *
    * Dimension rows with a NULL key, time or payload are DROPPED before
    * indexing — the same policy as [[asofEnrichStaticBatched]], so the
    * two "parity" paths agree on nulls instead of one throwing an
    * opaque encoder error and the other silently grouping them. */
  def asofEnrichStatic(events: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCol: String,
      maxIndexRows: Int = MaxAsofStaticRows): DataFrame = {
    val spark = right.sparkSession
    import spark.implicits._
    require(maxIndexRows > 0 && maxIndexRows < Int.MaxValue,
      s"asofEnrichStatic: maxIndexRows must be in (0, Int.MaxValue) — got $maxIndexRows")
    val cleaned = right.na.drop(Seq(keyCol, timeCol, payloadCol))
    val probe = cleaned.select(col(keyCol)).limit(maxIndexRows + 1).count()
    require(probe <= maxIndexRows,
      s"asofEnrichStatic: static side exceeds $maxIndexRows rows — too large " +
        "to broadcast-index on the driver; use asofEnrichStaticBatched " +
        "(foreachBatch + the AsofJoin shuffle plan) for large dimensions")
    val idx: Map[Long, (Array[Long], Array[Long])] = cleaned
      .select(col(keyCol).cast("long"), col(timeCol).cast("long"),
        col(payloadCol).cast("long"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3)) // (time, payload): tie order never depends on collect order
        k -> (sorted.map(_._2).toArray, sorted.map(_._3).toArray)
      }
    val b = spark.sparkContext.broadcast(idx)
    events
      .select(col(keyCol).cast("long").as("k"), col(timeCol).cast("long").as("t"))
      .as[(Long, Long)]
      .flatMap { case (k, t) =>
        b.value.get(k).flatMap { case (times, vals) =>
          var pos = java.util.Arrays.binarySearch(times, t)
          if (pos < 0) pos = -pos - 2
          else { // inclusive at equal times: take the rightmost match
            while (pos + 1 < times.length && times(pos + 1) == t) pos += 1
          }
          if (pos >= 0) Some((k, t, vals(pos))) else None
        }
      }
      .toDF(keyCol, timeCol, s"asof_$payloadCol")
  }

  /** Large-dimension fallback for [[asofEnrichStatic]]: the batch
    * as-of SHUFFLE plan ([[graft.operators.AsofJoin.asof]] — union +
    * one key-partitioned window, no driver collect, no broadcast)
    * applied per micro-batch through `foreachBatch`. Same output
    * schema and same inclusive-`<=` semantics as the broadcast-index
    * path (ties on (key, time) resolve to the greatest payload, via a
    * max-payload pre-dedup of the dimension — the tie contract the
    * index path gets from its (time, payload) sort; NULL key/time/
    * payload rows are dropped, same as the index path). Use when the
    * static side exceeds [[MaxAsofStaticRows]]: the dimension is read
    * per batch but only ever shuffled, so a 10⁹-row reference table is
    * fine where the broadcast index is not.
    *
    * The deduped dimension is PERSISTED (memory-and-disk) before the
    * stream starts: every micro-batch joins against it, and without the
    * persist each batch would re-read and re-shuffle the full dimension.
    * Trade-off: the executor cache holds one deduped copy of the
    * dimension for the query's lifetime — unpersisted when the caller
    * stops the query and drops the frame, or evicted under pressure
    * (falling back to recompute, never to wrong results). */
  def asofEnrichStaticBatched(events: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCol: String)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val dim = right.na.drop(Seq(keyCol, timeCol, payloadCol))
      .select(col(keyCol).cast("long").as(keyCol),
        col(timeCol).cast("long").as(timeCol),
        col(payloadCol).cast("long").as(payloadCol))
      .groupBy(keyCol, timeCol).agg(max(payloadCol).as(payloadCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val enriched = graft.operators.AsofJoin.asof(
            batch.select(col(keyCol).cast("long").as(keyCol),
              col(timeCol).cast("long").as(timeCol)),
            dim, keyCol, timeCol, Seq(payloadCol))
          .select(col(keyCol), col(timeCol),
            col(s"asof_match.$payloadCol").as(s"asof_$payloadCol"))
        sink(enriched, id)
        ()
      }
      .start()
  }

  /** One open session per burst: [startNs, lastNs] with an event count.
    * Aggregate state only — raw events are never retained. */
  final case class SessionAgg(startNs: Long, lastNs: Long, n: Long)
  final case class SessionOut(user_id: Long, n_events: Long, start_ts: String, dur_s: Long)

  /** Streaming twin of the batch `window_cume_distinct` query: per
    * user, the running count of DISTINCT event types seen so far,
    * emitted per event. State per user is the set of types already
    * seen — O(|type alphabet|) per key, the canonical bounded
    * "badge/milestone" state shape. Each micro-batch's rows are
    * processed in (ts_ns, event_id) order inside the handler (the
    * runtime hands groups unsorted), so a replay whose batch boundaries
    * respect per-user event-time order — a file replay in one batch, or
    * any in-order source — reproduces the batch query bit-for-bit.
    * Cross-batch OUT-OF-ORDER arrival shifts which event first carries
    * a new type (the set union itself is order-insensitive, so final
    * counts per user still converge to the batch value). */
  def cumeDistinctTypes(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def handle(userId: Long, rows: Iterator[(Long, Long, Long, String)],
        state: GroupState[Set[String]]): Iterator[(Long, Long, Long)] = {
      var seen = state.getOption.getOrElse(Set.empty[String])
      val out = rows.toSeq.sortBy(r => (r._2, r._1)) // (ts_ns, event_id)
        .map { case (eid, _, _, tpe) =>
          seen = seen + tpe
          (userId, eid, seen.size.toLong)
        }
      state.update(seen)
      out.iterator
    }

    events
      .selectExpr("event_id", "ts_ns", "user_id", "event_type")
      .as[(Long, Long, Long, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Set[String], (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(handle)
      .toDF("user_id", "event_id", "types_so_far")
  }

  /** Streaming twin of the `ts_ewma_dyadic` batch query: the dyadic
    * α=½ 8-tap EWMA maintained per user with `flatMapGroupsWithState`.
    * State is the ≤7-element tail of previous x values (most recent
    * first) — O(1) per user, the streaming win over the batch window:
    * a million-event user costs seven longs of state, not a buffered
    * partition. Each event emits the exact rational (ewma_num, wsum)
    * pair in BIGINTs with stream heads renormalized, identical
    * arithmetic to the batch lag() formulation. Rows within a batch
    * are sorted by (tus, event_id), so any in-order replay reproduces
    * the batch query bit-for-bit; cross-batch OUT-OF-ORDER arrival
    * shifts which previous events form a row's taps (an EWMA is
    * inherently order-sensitive — same caveat as [[cumeDistinctTypes]],
    * but here even final values depend on arrival order past the
    * tail depth). */
  def ewmaDyadic(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def handle(userId: Long, rows: Iterator[(Long, Long, Long, Long)],
        state: GroupState[List[Long]]): Iterator[(Long, Long, Long, Long, Long)] = {
      var tail = state.getOption.getOrElse(Nil) // previous xs, most recent first
      val out = rows.toSeq.sortBy(r => (r._2, r._1)) // (tus, event_id)
        .map { case (eid, _, _, x) =>
          val taps = x :: tail // weight 1 << (7 - position)
          val num = taps.zipWithIndex.map { case (v, i) => v * (1L << (7 - i)) }.sum
          val wsum = taps.indices.map(i => 1L << (7 - i)).sum
          tail = (x :: tail).take(7)
          (userId, eid, x, num, wsum)
        }
      state.update(tail)
      out.iterator
    }

    events
      .selectExpr("event_id", "ts_ns div 1000 AS tus", "user_id",
        "CAST(floor(value * 100) AS LONG) AS x")
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[List[Long], (Long, Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(handle)
      .toDF("user_id", "event_id", "x", "ewma_num", "wsum")
  }

  /** Streaming twin of the `anomaly_trailing_z` batch query: sqrt-free
    * 3-sigma anomaly flags over each user's trailing ≤20 events,
    * maintained with `flatMapGroupsWithState`. State is the ≤20-long
    * tail of previous x values — the streaming (n, Σx, Σx²) triple is
    * recomputed from it exactly, all BIGINT, so flags land on
    * precisely the rows the batch window formulation flags (the
    * decision (n·x − s)² > 9·(n·q − s²) has no float boundary to
    * disagree on). Emits ONLY anomalous rows, which is what a
    * monitoring stream wants: state O(20 longs) per user, output
    * proportional to anomalies, not traffic. In-order replay
    * reproduces the batch query bit-for-bit; cross-batch out-of-order
    * arrival shifts which events form a row's baseline (same
    * order-sensitivity caveat as [[ewmaDyadic]]). */
  def anomalyTrailingZ(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def handle(userId: Long, rows: Iterator[(Long, Long, Long, Long)],
        state: GroupState[List[Long]]): Iterator[(Long, Long, Long, Long, Long, Long)] = {
      var tail = state.getOption.getOrElse(Nil) // previous xs, most recent first
      val out = rows.toSeq.sortBy(r => (r._2, r._1)) // (tus, event_id)
        .flatMap { case (eid, _, _, x) =>
          val w = tail.take(20)
          val n = w.size.toLong
          val s = w.sum
          val q = w.map(v => v * v).sum
          tail = (x :: tail).take(20)
          val dev2 = (n * x - s) * (n * x - s)
          val thr = 9L * (n * q - s * s)
          if (n >= 12 && dev2 > thr) Some((userId, eid, x, n, dev2, thr)) else None
        }
      state.update(tail)
      out.iterator
    }

    events
      .selectExpr("event_id", "ts_ns div 1000 AS tus", "user_id",
        "CAST(floor(value * 100) AS LONG) AS x")
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[List[Long], (Long, Long, Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(handle)
      .toDF("user_id", "event_id", "x", "n", "dev2", "thr")
  }

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * arbitrary-state surface (SURVEY §2-H) behind the same semantics as
    * [[sessionStats]]. State per user is a list of open sessions
    * (merged on the gap as events arrive, so out-of-order events within
    * the watermark bridge sessions exactly like the batch cumsum); an
    * event-time timeout fires when the watermark passes an open
    * session's end + gap, emitting it and shrinking state to the still-
    * open tail. Events behind the watermark are dropped by the runtime
    * before the function sees them — the same late-data policy as
    * `session_window`. */
  def sessionStatsCustom(spark: SparkSession, events: DataFrame,
      gapS: Long = 1800L, watermark: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapNs = gapS * 1000000000L

    def fmt(ns: Long): String =
      java.time.Instant.ofEpochSecond(0L, ns / 1000 * 1000)
        .atZone(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

    def mergeAll(ss: List[SessionAgg]): List[SessionAgg] =
      ss.sortBy(_.startNs).foldLeft(List.empty[SessionAgg]) { (acc, s) =>
        acc match {
          case h :: t if s.startNs <= h.lastNs + gapNs =>
            SessionAgg(h.startNs, math.max(h.lastNs, s.lastNs), h.n + s.n) :: t
          case _ => s :: acc
        }
      }.reverse

    def handle(userId: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
        state: GroupState[List[SessionAgg]]): Iterator[SessionOut] = {
      val wmNs = state.getCurrentWatermarkMs() * 1000000L
      val current = state.getOption.getOrElse(Nil)
      val merged = mergeAll(current ++
        rows.map { case (_, ns, _) => SessionAgg(ns, ns, 1L) })
      // closed = the watermark is past end + gap: no in-window event can
      // extend the session any more (matches the batch gap split)
      val (closed, open) = merged.partition(_.lastNs + gapNs <= wmNs)
      if (open.isEmpty) state.remove()
      else {
        state.update(open)
        val nextFire = open.map(_.lastNs).min / 1000000L + gapS * 1000L
        state.setTimeoutTimestamp(math.max(nextFire, state.getCurrentWatermarkMs() + 1L))
      }
      closed.iterator.map(s =>
        SessionOut(userId, s.n, fmt(s.startNs), (s.lastNs - s.startNs) / 1000000000L))
    }

    events
      .withWatermark("ts", watermark)
      .selectExpr("user_id", "ts_ns", "ts") // ts stays: the event-time
      .as[(Long, Long, java.sql.Timestamp)] // column anchors the timeout
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[SessionAgg], SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(handle)
      .toDF()
  }

  /** Watermarked 30-minute-gap sessionization — streaming twin of the
    * batch `ev_sessionize` query, via `session_window` (merge-on-overlap
    * keyed state instead of the batch lag+cumsum windows). Stats are
    * computed on the raw nanosecond timestamps so start/duration agree
    * bit-for-bit with the batch query; only the gap decision uses the
    * µs event time (divergence possible solely for a gap of exactly
    * 30:00.000000 — the batch `>` keeps one session, session_window's
    * half-open windows split). Late events beyond the watermark are
    * dropped by the state store — the late-data policy H requires. */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        date_format(expr("timestamp_micros(min(ts_ns) div 1000)"),
          "yyyy-MM-dd HH:mm:ss").as("start_ts"),
        ((max("ts_ns") - min("ts_ns")) / lit(1000000000L)).cast("long").as("dur_s"))
      .select("user_id", "n_events", "start_ts", "dur_s")
}
