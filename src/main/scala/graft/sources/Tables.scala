package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS): Spark has no nanosecond
      // timestamp type, so read it as a long (ns since epoch) and expose
      // a microsecond-precision `ts` alongside the raw value. DuckDB's
      // TIMESTAMP_NS → epoch_us truncates identically.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts_ns div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Small dimension tables that should always be broadcast in joins. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")
}
