package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale soak for the Matryoshka (MRL) search family at ~2M vectors
  * (EmbSoak scale, ~330× the sf0.1 fixture) — the round-12 evidence
  * that retiring the prefix-prune `row_number` window for the
  * bounded-heap TopKAgg is a WIN, not just a plan-shape preference.
  *
  * Corpus: deterministic pseudo-floats with per-dimension 1/(1+d/8)
  * decay, emulating the front-loaded information profile MRL-trained
  * embeddings actually have (a flat-variance corpus would make prefix
  * recall meaningless). Probe batch: 32 queries.
  *
  * Measures, over the same corpus and probes:
  *   1. the RETIRED round-11 plan — prefix prune via
  *      `row_number().over(Window.partitionBy(query_id))` on the full
  *      |Q|×N score product (reconstructed inline);
  *   2. the round-12 heap plan ([[graft.operators.Knn.mrlTopK]]);
  *   3. the single-heap serving plan
  *      ([[graft.streaming.VectorStreams.mrlServe]], embedding-carrying
  *      payload + row-local rescore);
  *   4. the standing-store path: one vectorFoldBatch fold of the corpus
  *      + [[graft.streaming.VectorStreams.mrlServeFromStore]];
  * asserts 1 == 2 == 3 == 4 row for row (the tie-contract equivalence
  * at scale), and measures recall@3 vs an exact full-dim heap baseline.
  * Prints one JSON evidence line; recorded in BASELINE.md. */
object MrlSoak {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val nVecs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val (dim, prefixDim, nCand, k) = (64, 16, 16, 3)

    // front-loaded deterministic corpus: component d ~ U[-1,1]·(1+d/8)⁻¹
    val vecs = SoakCorpus.frontLoaded(spark, nVecs)
    val probes = vecs.filter(col("vec_id") < 32).localCheckpoint(true)

    import SoakCorpus.timed
    def rank4(df: DataFrame): Set[(Long, Long, Double, Int)] = df
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rnk").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

    // ── the RETIRED round-11 plan: window prune + window rescore ──
    def windowedMrl(): DataFrame = {
      def prep(df: DataFrame, role: String) = df
        .select(col("vec_id").as(s"${role}_id"), col("embedding").as(s"${role}_emb"))
        .withColumn(s"${role}_p", expr(s"slice(${role}_emb, 1, $prefixDim)"))
        .withColumn(s"${role}_pn", expr(s"sqrt(graft_dot(${role}_p, ${role}_p))"))
        .withColumn(s"${role}_fn", expr(s"sqrt(graft_dot(${role}_emb, ${role}_emb))"))
      val q = prep(probes, "query").localCheckpoint(true)
      val c = prep(vecs, "cand").localCheckpoint(true)
      val pruned = c.select(col("cand_id"), col("cand_p"), col("cand_pn"))
        .crossJoin(broadcast(q.select(col("query_id"), col("query_p"), col("query_pn"))))
        .filter(col("query_id") =!= col("cand_id"))
        .withColumn("pcos", round(
          expr("graft_dot(query_p, cand_p)") / (col("query_pn") * col("cand_pn")), 8))
        .withColumn("prnk", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("pcos").desc, col("cand_id"))))
        .filter(col("prnk") <= nCand)
        .select("query_id", "cand_id")
      pruned
        .join(c.select(col("cand_id"), col("cand_emb"), col("cand_fn")), Seq("cand_id"))
        .join(broadcast(q.select(col("query_id"), col("query_emb"), col("query_fn"))),
          Seq("query_id"))
        .withColumn("cosine", round(
          expr("graft_dot(query_emb, cand_emb)") / (col("query_fn") * col("cand_fn")), 8))
        .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("cand_id"))))
        .filter(col("rnk") <= k)
        .select("query_id", "cand_id", "cosine", "rnk")
    }

    // exact full-dim top-k via the bounded heap (recall denominator) —
    // NOT bruteForceTopK, whose per-query window would itself be the
    // bottleneck under measurement here
    def exactTopK(): DataFrame = {
      val q = probes
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
        .withColumn("q_fn", expr("sqrt(graft_dot(q_emb, q_emb))"))
      val topk = udaf(graft.functions.TopKAgg.longs(k))
      vecs.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
        .withColumn("c_fn", expr("sqrt(graft_dot(c_emb, c_emb))"))
        .crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("cand_id"))
        .withColumn("cosine", round(
          expr("graft_dot(q_emb, c_emb)") / (col("q_fn") * col("c_fn")), 8))
        .groupBy("query_id")
        .agg(topk(col("cosine"), col("cand_id")).as("tk"))
        .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("query_id"), col("e._2").as("cand_id"))
    }

    val (winRows, wWindow) = timed(rank4(windowedMrl()))
    val (heapRows, wHeap) = timed(rank4(
      graft.operators.Knn.mrlTopK(probes, vecs, "vec_id", "embedding",
        prefixDim, nCand, k)))
    val (serveRows, wServe) = timed(rank4(
      graft.streaming.VectorStreams.mrlServe(probes, vecs, prefixDim, nCand, k)))

    // standing store: one fold (narrow band params — MRL reads only
    // the vectors table), then the pinned serve
    val tbl = java.nio.file.Files.createTempDirectory("graft_mrlsoak").toString
    val (_, wFold) = timed(graft.streaming.VectorStreams.vectorFoldBatch(
      vecs, tbl, 0L, dim, nPlanes = 4, nTables = 1))
    val (storeRows, wStore) = timed(rank4(
      graft.streaming.VectorStreams.mrlServeFromStore(spark, tbl, probes,
        prefixDim, nCand, k)))

    val equal = heapRows == winRows && serveRows == winRows && storeRows == winRows

    val exact = exactTopK().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = heapRows.map(t => (t._1, t._2))
    val recall = (exact & got).size.toDouble / exact.size

    println(s"""{"soak":"mrl","n_vecs":$nVecs,"n_queries":32,"prefix_dim":$prefixDim,"n_cand":$nCand,"k":$k,"wall_window_plan":${f"$wWindow%.1f"},"wall_heap_plan":${f"$wHeap%.1f"},"wall_single_heap_serve":${f"$wServe%.1f"},"wall_store_fold":${f"$wFold%.1f"},"wall_store_serve":${f"$wStore%.1f"},"all_plans_equal":$equal,"recall_at_3":${f"$recall%.4f"}}""")
    assert(equal, "plan results diverged at soak scale")
    spark.stop()
  }
}
