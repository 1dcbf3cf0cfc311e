package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's parquet corpus (TESTDATA.md).
  *
  * All engine queries read through here so that scan-level concerns
  * (schema expectations, pushdown-friendly layout) live in one place.
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * single-file parquet layout of the fixtures is the local stand-in.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every query path starts here: make the graft_* codegen'd
    // functions resolvable before any expression text is analyzed
    graft.functions.GraftFunctions.register(spark)
    // Pin the timestamp contract for EVERY table, not just events:
    // read µs timestamps as TIMESTAMP (micros-since-UTC-epoch), never
    // TIMESTAMP_NTZ. All sessions run UTC, so the raw stored micros ARE
    // unix_micros and the DuckDB oracle's epoch_us agrees exactly —
    // and the loaded type no longer depends on which table was opened
    // first in the session.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if (name == "events") {
      // The events fixture has shipped `ts` under two encodings —
      // TIMESTAMP(NANOS) (readable only as a ns-long via the legacy
      // flag) and TIMESTAMP(MICROS) (a real Spark timestamp). Set the
      // conf that makes the legacy encoding readable, then sniff the
      // loaded type in normalizeEvents instead of assuming either.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEvents(spark.read.parquet(s"$dir/$name.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Canonical events contract every query/stream consumes: `ts` as a
    * µs-precision TIMESTAMP plus `ts_ns` as epoch nanoseconds (long),
    * whatever the on-disk encoding of `ts` was. Branches:
    *   - ns-long (legacy TIMESTAMP(NANOS) via nanosAsLong): keep raw ns,
    *     derive the timestamp by µs truncation;
    *   - TIMESTAMP (micros): derive ts_ns = unix_micros * 1000 — the old
    *     nanos fixture was µs-aligned, so this is bit-identical;
    *   - TIMESTAMP_NTZ: naive == UTC under the engine's UTC-pinned
    *     sessions, so cast and proceed as for TIMESTAMP.
    * Anything else fails fast, naming the drifted column. */
  def normalizeEvents(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case LongType =>
      raw.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
    case TimestampType =>
      raw.withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
    case TimestampNTZType =>
      raw.withColumn("ts", expr("cast(ts as timestamp)"))
        .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
    case other => throw new IllegalArgumentException(
      s"events.ts arrived as $other — expected a ns-long (legacy TIMESTAMP(NANOS)) " +
        "or a TIMESTAMP/TIMESTAMP_NTZ (micros); the fixture encoding has drifted")
  }

  /** Small dimension tables that should always be broadcast in joins. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")
}
