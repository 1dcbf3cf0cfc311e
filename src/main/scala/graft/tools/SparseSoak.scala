package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.TextDedupQueries.SparseCosine

/** Scale soak for the sparse-cosine absolute df cap
  * (`TextDedupQueries.SparseCosine.MaxDf`).
  *
  * Synthesizes a 48× replica corpus from sf0.1 (240 000 docs) — large
  * enough that the PROPORTIONAL df cut |docs|/10 = 24 000 exceeds the
  * absolute cap 10 000, i.e. the regime where the cap is the binding
  * guard (the regime a 100 TB corpus lives in permanently). Replicas
  * keep doc ids distinct (doc_id·64 + rep); even docs get a
  * per-replica unique suffix token (near-dup structure without hot
  * suffix keys); every 1000th doc carries a shared rare marker token
  * so the capped index still produces non-trivial pairs.
  *
  * Measures exactly what the cap buys: the candidate-pair mass the
  * proportional-only cut would have admitted versus the bounded index
  * that actually feeds the self-join, then times the real
  * `txt_sparse_cosine_pairs` query end-to-end on the soak corpus.
  * Prints one JSON evidence line; recorded in BASELINE.md.
  */
object SparseSoak {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val dir = if (args.length > 1) args(1) else "/tmp/graft_soak240k"
    val reps = 48
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      graft.sources.Tables(spark, src, "documents")
        .crossJoin(broadcast(spark.range(reps).toDF("rep")))
        .select(
          (col("doc_id") * 64 + col("rep")).as("doc_id"),
          col("source"),
          when(col("doc_id") % 1000 === 0,
              concat(col("text"), lit(" soakrare")))
            .when(col("doc_id") % 2 === 0,
              concat(col("text"), lit(" s"), col("doc_id"), lit("_"), col("rep")))
            .otherwise(col("text")).as("text"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }

    // Index-side evidence: what does each cut admit?
    val tf = graft.operators.Dedup.stageThenSpread(
        graft.sources.Tables(spark, dir, "documents"),
        "__toks" -> expr(graft.functions.TextFunctions.tokensSql("text")))
      .select(col("doc_id"), explode(col("__toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
    val nd = tf.select("doc_id").distinct().count()
    val propCut = math.max(50L, nd / 10)
    val effCut = math.min(propCut, SparseCosine.MaxDf)
    val dft = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val ev = dft.agg(
        count(lit(1)).as("vocab"),
        sum(when(col("df") <= effCut, 1L).otherwise(0L)).as("admitted"),
        sum(when(col("df") > lit(SparseCosine.MaxDf) && col("df") <= propCut, 1L)
          .otherwise(0L)).as("cap_dropped"),
        sum(when(col("df") > lit(SparseCosine.MaxDf) && col("df") <= propCut,
            expr("df * (df - 1) div 2")).otherwise(0L)).as("cap_dropped_pairs"),
        sum(when(col("df") <= effCut, expr("df * (df - 1) div 2"))
          .otherwise(0L)).as("admitted_pairs"))
      .collect()(0)

    // End-to-end: the real query on the soak corpus.
    val t0 = System.nanoTime()
    val rows = graft.SparkEntry.queries("txt_sparse_cosine_pairs")(spark, dir).collect()
    val wall = (System.nanoTime() - t0) / 1e9

    println(
      s"""{"soak":"sparse_cosine_cap","n_docs":$nd,"proportional_cut":$propCut,""" +
      s""""effective_cut":$effCut,"vocab":${ev.getLong(0)},""" +
      s""""tokens_admitted":${ev.getLong(1)},"tokens_cap_dropped":${ev.getLong(2)},""" +
      s""""pairs_prevented_by_cap":${ev.getLong(3)},"pairs_admitted":${ev.getLong(4)},""" +
      s""""result_rows":${rows.length},"query_sec":${math.round(wall * 100) / 100.0}}""")
    spark.stop()
  }
}
