package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the RESIDUAL IVF×PQ standing store (IVFADC): at a
  * ~250×-sf0.1 corpus, folds the same vectors into a residual store
  * and a raw IVF×PQ store (same coarse quantizer, same m×ks code
  * budget, codebooks each trained on their own target distribution),
  * then measures
  *
  *   - serve wall both ways — the residual serve's extra work is the
  *     per-(query, home-cell) LUT build (bounded by min(K, |cand|)
  *     pairs per query), so it should track the raw packed serve;
  *   - DISTORTION both ways — Σ |ADC estimate − true L2²·e6| over
  *     each serve's own coarse-pruned pair set (identical sets: same
  *     quantizer, same posts), the number the `pq_ivfres_distortion`
  *     oracle row pins at fixture scale. Residual codes must
  *     reconstruct at least as tightly as raw codes.
  *
  * Prints one JSON evidence line; recorded in BASELINE.md. */
object IvfResSoak {
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
    import graft.operators.{Knn, Pq}

    val nVecs = args.headOption.map(_.toLong).getOrElse(500000L)
    val (ivfK, nprobe, nAssign, pqM, pqSub, pqKs) = (64, 4, 2, 8, 8, 16)
    // front-loaded deterministic corpus (the IvfPqSoak generator)
    val vecs = SoakCorpus.frontLoaded(spark, nVecs)
    val probes = vecs.filter(col("vec_id") < 32).localCheckpoint(true)

    import SoakCorpus.timed
    def rank4(df: DataFrame) = SoakCorpus.rank4Long(df)

    // one coarse quantizer for both stores; codebooks per target
    val cent = Knn.ivfTrain(vecs.filter(col("vec_id") < 65536),
      "vec_id", "embedding", ivfK, 2).localCheckpoint(true)
    val resid = "zip_with(embedding, cw, (a, b) -> CAST(a AS DOUBLE) - b / 1048576.0D)"
    val trainHead = vecs.filter(col("vec_id") < 16384)
    val rawBooks = Pq.train(
      Pq.subviews(trainHead, "vec_id", "embedding", pqM, pqSub),
      "vec_id", pqKs, 2).localCheckpoint(true)
    val resHead = Knn.ivfRank(trainHead, cent, "vec_id", "embedding")
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("embedding"))
      .join(broadcast(cent.select(col("cell"), col("cw"))), Seq("cell"))
      .select(col("vec_id"), col("cell"), expr(resid).as("rvec"))
      .localCheckpoint(true)
    val resBooks = Pq.train(
      Pq.subviews(resHead, "vec_id", "rvec", pqM, pqSub),
      "vec_id", pqKs, 2).localCheckpoint(true)

    // fold both stores, two batches each
    val rawStore = java.nio.file.Files.createTempDirectory("graft_ivfressoak_raw").toString
    val resStore = java.nio.file.Files.createTempDirectory("graft_ivfressoak_res").toString
    val (_, wFoldRaw) = timed {
      Seq(0L, 1L).foreach(b =>
        graft.streaming.VectorStreams.ivfPqFoldBatch(
          vecs.filter(pmod(col("vec_id"), lit(2)) === b), rawStore, b, cent, rawBooks,
          nAssign = nAssign, pqM = pqM, pqSub = pqSub))
    }
    val (_, wFoldRes) = timed {
      Seq(0L, 1L).foreach(b =>
        graft.streaming.VectorStreams.ivfPqResFoldBatch(
          vecs.filter(pmod(col("vec_id"), lit(2)) === b), resStore, b, cent, resBooks,
          nAssign = nAssign, pqM = pqM, pqSub = pqSub))
    }

    // serves (raw first: shared first-job costs land on the incumbent)
    val (rawTop, wRawServe) = timed(rank4(
      graft.streaming.VectorStreams.ivfPqServeFromStore(
          spark, rawStore, probes, k = 3, nprobe = nprobe)
        .select("query_id", "cand_id", "adist_e6", "rnk")))
    val (resTop, wResServe) = timed(rank4(
      graft.streaming.VectorStreams.ivfPqResServeFromStore(
          spark, resStore, probes, k = 3, nprobe = nprobe)
        .select("query_id", "cand_id", "adist_e6", "rnk")))

    // distortion over the shared coarse-pruned pair set: join each
    // store's scored pairs against exact per-pair distances
    val ranked = Knn.ivfRank(vecs, cent, "vec_id", "embedding").localCheckpoint(true)
    val probeCells = ranked.filter(col("vec_id") < 32 && col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cell"))
    val cand = probeCells
      .join(ranked.filter(col("rn") <= nAssign)
        .select(col("vec_id").as("cand_id"), col("cell")), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id").distinct()
      .localCheckpoint(true)
    val dv = expr("transform(embedding, v -> CAST(v AS DOUBLE))")
    val qv = probes.select(col("vec_id").as("query_id"), dv.as("qv"))
    val trueD = cand
      .join(broadcast(qv), Seq("query_id"))
      .join(vecs.select(col("vec_id").as("cand_id"), dv.as("cv")), Seq("cand_id"))
      .select(col("query_id"), col("cand_id"),
        expr("CAST(floor(graft_l2sq(qv, cv) * 1000000.0D) AS BIGINT)").as("true_e6"))
      .localCheckpoint(true)

    def scoredRaw: DataFrame = {
      val books = spark.read.parquet(s"$rawStore/codebooks")
      val lut = Pq.adcLut(Pq.subviews(probes, "vec_id", "embedding", pqM, pqSub),
          "vec_id", books)
        .withColumnRenamed("vec_id", "query_id")
      spark.read.parquet(s"$rawStore/codes")
        .select(col("vec_id").as("cand_id"), posexplode(col("codes")).as(Seq("m", "code")))
        .join(cand, Seq("cand_id"))
        .join(broadcast(lut), Seq("query_id", "m", "code"))
        .groupBy("query_id", "cand_id").agg(sum("dq_e6").as("adist_e6"))
    }
    def scoredRes: DataFrame = {
      val books = spark.read.parquet(s"$resStore/codebooks")
      val qres = probes.select(col("vec_id").as("query_id"), col("embedding"))
        .crossJoin(broadcast(cent.select(col("cell"), col("cw"))))
        .select((col("query_id") * lit(ivfK.toLong) + col("cell")).as("qc"),
          expr(resid).as("rvec"))
      val lut = Pq.adcLut(Pq.subviews(qres, "qc", "rvec", pqM, pqSub), "qc", books)
        .select(expr(s"qc div $ivfK").as("query_id"), expr(s"pmod(qc, $ivfK)").as("cell"),
          col("m"), col("code"), col("dq_e6"))
      spark.read.parquet(s"$resStore/codes")
        .select(col("vec_id").as("cand_id"), col("cell"),
          posexplode(col("codes")).as(Seq("m", "code")))
        .join(cand, Seq("cand_id"))
        .join(broadcast(lut), Seq("query_id", "cell", "m", "code"))
        .groupBy("query_id", "cand_id").agg(sum("dq_e6").as("adist_e6"))
    }
    def sae(scored: DataFrame): (Long, Long) = {
      val r = scored.join(trueD, Seq("query_id", "cand_id"))
        .agg(count(lit(1)).as("n"),
          sum(abs(col("adist_e6") - col("true_e6"))).as("sae")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (nRaw, saeRaw) = sae(scoredRaw)
    val (nRes, saeRes) = sae(scoredRes)

    println(s"""{"soak":"ivfres_store","n_vecs":$nVecs,"n_queries":32,"dim":64,"ivf_k":$ivfK,"nprobe":$nprobe,"n_assign":$nAssign,"pq_m":$pqM,"wall_fold_raw":${f"$wFoldRaw%.1f"},"wall_fold_res":${f"$wFoldRes%.1f"},"wall_serve_raw":${f"$wRawServe%.1f"},"wall_serve_res":${f"$wResServe%.1f"},"n_pairs_raw":$nRaw,"n_pairs_res":$nRes,"sae_raw_e6":$saeRaw,"sae_res_e6":$saeRes,"res_tighter":${saeRes <= saeRaw},"top3_raw":${rawTop.size},"top3_res":${resTop.size}}""")
    assert(nRaw == nRes, "pair sets diverged: same quantizer must prune identically")
    assert(saeRes <= saeRaw,
      s"residual SAE $saeRes > raw SAE $saeRaw at soak scale")
    spark.stop()
  }
}
