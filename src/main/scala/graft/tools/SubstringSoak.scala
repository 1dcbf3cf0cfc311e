package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the substring-window hot cap (df > 1000) proving the
  * cap engages BEFORE the pair join (round-9 fix; plan-gated in
  * PlansSpec).
  *
  * Corpus: the SparseSoak 48×-replica recipe over sf0.1 (240 000 docs),
  * plus a planted 100-char boilerplate footer on every 20th doc — the
  * "same license header in a million files" shape. 12 000 docs share
  * the footer's ~50 stride-1 windows, so each has df ≈ 12 000 ≫ 1000:
  * exactly the regime where a post-join cap would first materialize
  * df_a × df_b ≈ 1.4×10⁸ pair rows PER WINDOW before deleting them.
  * Measures the pair mass the pre-join anti-join prevents vs what the
  * capped index actually admits, then times the real
  * `dedup_substring_windows` query end-to-end on the soak corpus.
  * Prints one JSON evidence line; recorded in BASELINE.md.
  */
object SubstringSoak {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val dir = if (args.length > 1) args(1) else "/tmp/graft_soak_substr"
    val reps = 48
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val footer = " Shared boilerplate footer: this exact sentence is " +
      "planted on every twentieth soak document to make its windows hot."
    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      graft.sources.Tables(spark, src, "documents")
        .crossJoin(broadcast(spark.range(reps).toDF("rep")))
        .select(
          (col("doc_id") * 64 + col("rep")).as("doc_id"),
          col("source"),
          when(col("doc_id") % 20 === 0, concat(col("text"), lit(footer)))
            .otherwise(col("text")).as("text"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }

    graft.functions.GraftFunctions.register(spark)
    val docs = graft.operators.Dedup.spread(
        graft.sources.Tables(spark, dir, "documents"))
      .select(col("doc_id"), col("text"))
    val wa = docs.select(col("doc_id"),
        expr("graft_char_windows(text, 48, 1)").as(Seq("win_idx", "w")))
      .select(col("doc_id"), xxhash64(col("w")).as("h"), col("w")).distinct()
    val wb = docs.select(col("doc_id"),
        expr("graft_char_windows(text, 48, 8)").as(Seq("win_idx", "w")))
      .select(col("doc_id"), xxhash64(col("w")).as("h"), col("w")).distinct()
    val dfA = wa.groupBy("h", "w").agg(count(lit(1)).as("df_a"))
    val dfB = wb.groupBy("h", "w").agg(count(lit(1)).as("df_b"))
    // Pair mass per window = df_a × df_b (the h-keyed join's output for
    // that key). hot = what the pre-join cap removes from BOTH inputs;
    // cold = what actually reaches the join.
    val ev = dfA.join(dfB, Seq("h", "w"), "left")
      .select(col("df_a"), coalesce(col("df_b"), lit(0L)).as("df_b"),
        (col("df_a") > 1000).as("hot"))
      .agg(
        sum(when(col("hot"), 1L).otherwise(0L)).as("n_hot"),
        sum(when(col("hot"), col("df_a")).otherwise(0L)).as("hot_wa_rows"),
        sum(when(col("hot"), col("df_a") * col("df_b")).otherwise(0L))
          .as("pairs_prevented"),
        sum(when(!col("hot"), col("df_a") * col("df_b")).otherwise(0L))
          .as("pairs_admitted"),
        count(lit(1)).as("n_windows"))
      .collect()(0)

    val t0 = System.nanoTime()
    val rows = graft.SparkEntry.queries("dedup_substring_windows")(spark, dir).collect()
    val wall = (System.nanoTime() - t0) / 1e9

    println(
      s"""{"soak":"substring_hot_cap_prejoin","n_windows":${ev.getLong(4)},""" +
      s""""n_hot":${ev.getLong(0)},"hot_wa_rows":${ev.getLong(1)},""" +
      s""""pairs_prevented_by_prejoin_cap":${ev.getLong(2)},""" +
      s""""pairs_admitted":${ev.getLong(3)},""" +
      s""""result_rows":${rows.length},"query_sec":${math.round(wall * 100) / 100.0}}""")
    spark.stop()
  }
}
