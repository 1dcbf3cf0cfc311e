package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for FILTERED ANN (r16 — the AlshSoak discipline applied
  * to the predicate-constrained serve): a ~500k-vector lifted-IVF attr
  * store queried under metadata predicates at ~50% and ~1%
  * selectivity, proving at soak scale what the sf0.01 oracle rows pin
  * at fixture scale:
  *
  *  - the `attrstats` selectivity estimate is EXACT (the histogram is
  *    per-batch exact counts — estimate == true survivor count, both
  *    predicates, asserted);
  *  - ZERO predicate leakage: every served row satisfies the
  *    predicate (asserted by re-joining results to the attrs);
  *  - pre-filter == over-fetch post-filter ROW FOR ROW at both
  *    selectivities (the bounded-retry completeness guarantee holds
  *    at 500k, not just on 500 fixture rows — asserted);
  *  - filtered recall@3 vs the exact brute force over the predicate's
  *    survivors, measured at nprobe 8 and 16 over 64 lifted cells —
  *    the probe-widening lever priced at scale (printed, and the
  *    widened probe must not lose recall: supersets are monotone).
  *
  * Walls for the two strategies at the two selectivities are printed
  * (never asserted — the strategy-choice guidance in COVERAGE.md
  * reads from them): pre-filter pays the postings semi-join but its
  * candidate stream shrinks with selectivity; over-fetch serves
  * unfiltered with k′ = k/sel, so its cost EXPLODES as selectivity
  * drops (k′ ≈ 600 at 1%) — the crossover the guidance names.
  *
  * Prints one JSON evidence line; recorded in BASELINE.md. */
object FilteredSoak {
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
    import SoakCorpus.timed

    val nVecs = args.headOption.map(_.toLong).getOrElse(500000L)
    val (ivfK, iters, nAssign, k, nprobe) = (64, 3, 2, 3, 8)
    val attrs = Seq("lab", "b100")
    val pred50 = "lab < 5"   // ~50% of vec_ids
    val pred1 = "b100 = 0"   // ~1%

    val corpus = SoakCorpus.flat(spark, nVecs)
      .select(col("vec_id"), col("embedding"),
        pmod(col("vec_id"), lit(10)).cast("int").as("lab"),
        pmod(col("vec_id"), lit(100)).cast("int").as("b100"))
      .localCheckpoint(true)
    val probes = corpus.filter(col("vec_id") < 32)
      .select("vec_id", "embedding").localCheckpoint(true)
    val m = corpus.agg(max(graft.functions.VectorFunctions.norm("embedding")))
      .head().getDouble(0)
    val lifted = corpus
      .select(col("vec_id"),
        expr(s"transform(embedding, v -> CAST(v AS DOUBLE) / ${m}D)").as("sc"))
      .withColumn("s2", expr("graft_dot_d(sc, sc)"))
      .withColumn("ea", expr(
        "array_append(sc, CASE WHEN s2 >= 1.0D THEN CAST(0.0 AS DOUBLE) ELSE sqrt(1.0D - s2) END)"))
      .select("vec_id", "ea")
    val (cent, wTrain) = timed {
      graft.operators.Knn.ivfTrain(lifted, "vec_id", "ea", ivfK, iters)
        .localCheckpoint(true)
    }
    val tbl = java.nio.file.Files.createTempDirectory("graft_filtered_soak").toString
    val (_, wFold) = timed {
      graft.streaming.VectorStreams.mipsIvfFoldBatch(
        corpus.select(("vec_id" +: "embedding" +: attrs).map(col): _*),
        tbl, 0L, cent, m, nAssign = nAssign, attrCols = attrs)
    }

    // ── attrstats selectivity estimate vs truth (exact by design) ──
    val stats = spark.read.parquet(s"$tbl/attrstats")
    def estOf(p: String): Long = stats.filter(expr(p))
      .agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)
    val (est50, est1) = (estOf(pred50), estOf(pred1))
    val (true50, true1) = (corpus.filter(expr(pred50)).count(),
      corpus.filter(expr(pred1)).count())

    // ── serves: pre-filter vs over-fetch, both selectivities ──
    def rank4(df: DataFrame) = df
      .select(col("query_id"), col("cand_id"), col("ip_e6"),
        col("rnk").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    def pre(p: String, np: Int = nprobe) =
      graft.streaming.VectorStreams.mipsIvfServeFromStore(
        spark, tbl, probes, k, np, predicate = Some(p))
    def post(p: String) =
      graft.streaming.VectorStreams.mipsIvfServeOverfetch(
        spark, tbl, probes, k, nprobe, predicate = p)
    val (pre50r, wPre50) = timed(rank4(pre(pred50)))
    val (post50r, wPost50) = timed(rank4(post(pred50)))
    val (pre1r, wPre1) = timed(rank4(pre(pred1)))
    val (post1r, wPost1) = timed(rank4(post(pred1)))

    // zero predicate leakage: every served candidate satisfies it
    import spark.implicits._
    def leakage(res: Set[(Long, Long, Long, Int)], p: String): Long =
      res.map(_._2).toSeq.toDF("vec_id")
        .join(corpus.select(("vec_id" +: attrs).map(col): _*), Seq("vec_id"))
        .filter(!expr(p)).count()

    // ── exact filtered ground truth + recall (nprobe and 2×nprobe) ──
    def exactTop(p: String): DataFrame = {
      val cands = corpus.filter(expr(p))
        .select(col("vec_id").as("cand_id"),
          expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("c_emb"))
      val topk = udaf(graft.functions.TopKDistinctAgg.longs(k))
      cands.crossJoin(broadcast(probes
          .select(col("vec_id").as("query_id"),
            expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("q_emb"))))
        .filter(col("query_id") =!= col("cand_id"))
        .withColumn("ip_e6",
          expr("CAST(floor(graft_dot_d(q_emb, c_emb) * 1000000.0D) AS BIGINT)"))
        .groupBy("query_id")
        .agg(topk(col("ip_e6").cast("double"), col("cand_id")).as("tk"))
        .select(col("query_id"),
          explode(expr("transform(tk, e -> e._2)")).as("cand_id"))
    }
    def recallOf(served: Set[(Long, Long, Long, Int)], p: String): (Long, Long) = {
      val hits = served.map(t => (t._1, t._2))
      val exact = exactTop(p).collect().map(r => (r.getLong(0), r.getLong(1)))
      (exact.count(hits.contains).toLong, exact.length.toLong)
    }
    val (h50, k50) = recallOf(pre50r, pred50)
    val (h1, k1) = recallOf(pre1r, pred1)
    val wide1 = rank4(pre(pred1, 2 * nprobe))
    val (h1w, k1w) = recallOf(wide1, pred1)

    println(s"""{"soak":"filtered","n_vecs":$nVecs,"ivf_k":$ivfK,"nprobe":$nprobe,""" +
      s""""est50":$est50,"true50":$true50,"est1":$est1,"true1":$true1,""" +
      s""""pre_eq_post_50":${pre50r == post50r},"pre_eq_post_1":${pre1r == post1r},""" +
      s""""leak50":${leakage(pre50r, pred50)},"leak1":${leakage(pre1r, pred1)},""" +
      s""""recall50":"$h50/$k50","recall1":"$h1/$k1","recall1_wide":"$h1w/$k1w",""" +
      s""""wall_train":${f"$wTrain%.1f"},"wall_fold":${f"$wFold%.1f"},""" +
      s""""wall_pre50":${f"$wPre50%.1f"},"wall_post50":${f"$wPost50%.1f"},""" +
      s""""wall_pre1":${f"$wPre1%.1f"},"wall_post1":${f"$wPost1%.1f"}}""")

    assert(est50 == true50 && est1 == true1,
      s"attrstats selectivity estimate is not exact: $est50/$true50 $est1/$true1")
    assert(pre50r.nonEmpty && pre1r.nonEmpty, "empty filtered serve at soak scale")
    assert(pre50r == post50r && pre1r == post1r,
      "pre-filter and over-fetch diverged at soak scale — the bounded-retry " +
        "completeness guarantee is broken")
    assert(leakage(pre50r, pred50) == 0L && leakage(pre1r, pred1) == 0L,
      "predicate leakage: a served candidate violates the predicate")
    // candidate supersets ⇒ widening the probe can never lose recall
    assert(h1w >= h1, s"probe widening lost recall: $h1w < $h1")
    spark.stop()
  }
}
