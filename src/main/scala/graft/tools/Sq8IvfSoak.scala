package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the round-14 store compositions — the IVF×SQ8
  * standing store and refine-at-serve off pinned stores — at a
  * ~250×-sf0.1 corpus:
  *
  *   - IVF×SQ8: fold the corpus into a coarse-pruned SQ8 store, then
  *     serve the same probe batch BOTH ways over the same pinned
  *     bytes — the FLAT full-scan packed serve (every vector pays one
  *     `graft_sq8_adc` call per probe; legal because the IVF store's
  *     layout is a superset of the flat one) vs the COARSE-PRUNED
  *     serve (only the ≈ nprobe·nAssign/K posted survivors scan).
  *     The prune's value claim is the wall ratio; its cost claim is
  *     recall@3 of the pruned answer against the flat full-scan
  *     answer. Invariant asserted: the flat top-1 distance is ≤ the
  *     pruned top-1 per query (the pruned scan is a subset — it can
  *     miss neighbors, never invent closer ones).
  *
  *   - REFINE-AT-SERVE: fold the same corpus into a residual IVFADC
  *     store + a flat SQ8 store, run
  *     [[graft.streaming.VectorStreams.ivfResRefineServeFromStore]]
  *     (shortlist-20 off the residual store, SQ8-store packed rerank),
  *     and assert it row-identical to the inline composition (the
  *     store shortlist joined to an exploded SQ8 rerank — 32·20 pairs,
  *     comparator-cheap at any corpus size).
  *
  * Prints one JSON evidence line; recorded in BASELINE.md. */
object Sq8IvfSoak {
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
    import graft.operators.{Knn, Pq, Sq}

    val nVecs = args.headOption.map(_.toLong).getOrElse(500000L)
    val (ivfK, nprobe, nAssign, pqM, pqSub, pqKs) = (64, 4, 2, 8, 8, 16)
    // arg 2 picks the corpus shape: "front" (default — the clustered
    // regime real embeddings live in) or "flat" (near-isotropic, the
    // ADVERSARIAL case for a coarse prune: cells explain little
    // variance, so this is where the recall cost of pruning shows)
    val shape = args.drop(1).headOption.getOrElse("front")
    val vecs = shape match {
      case "front" => SoakCorpus.frontLoaded(spark, nVecs)
      case "flat" => SoakCorpus.flat(spark, nVecs).select("vec_id", "embedding")
        .localCheckpoint(true)
      case other => sys.error(s"unknown corpus shape '$other' (front|flat)")
    }
    val probes = vecs.filter(col("vec_id") < 32).localCheckpoint(true)

    import SoakCorpus.timed
    def rank4(df: DataFrame) = SoakCorpus.rank4Long(df)

    // pinned models: one coarse quantizer + one set of SQ8 bounds for
    // the whole soak (the standing-store pinning contract)
    val cent = Knn.ivfTrain(vecs.filter(col("vec_id") < 65536),
      "vec_id", "embedding", ivfK, 2).localCheckpoint(true)
    val bounds = Sq.train(vecs, "embedding").localCheckpoint(true)

    // ── IVF×SQ8 store: fold + both serves ──
    val store = java.nio.file.Files.createTempDirectory("graft_sq8ivfsoak").toString
    val (_, wFold) = timed {
      Seq(0L, 1L).foreach(b =>
        graft.streaming.VectorStreams.sq8IvfFoldBatch(
          vecs.filter(pmod(col("vec_id"), lit(2)) === b), store, b, cent, bounds,
          nAssign = nAssign))
    }
    // flat full-scan serve FIRST (shared first-job costs — codegen,
    // classloading, parquet footers — land on the incumbent)
    val (flatTop, wFlat) = timed(rank4(
      graft.streaming.VectorStreams.sq8ServeFromStore(spark, store, probes, k = 3)
        .select("query_id", "cand_id", "adist_e6", "rnk")))
    val (prunedTop, wPruned) = timed(rank4(
      graft.streaming.VectorStreams.sq8IvfServeFromStore(
          spark, store, probes, k = 3, nprobe = nprobe)
        .select("query_id", "cand_id", "adist_e6", "rnk")))
    // subset invariant: the full scan's best distance per query can
    // only be ≤ the pruned scan's
    val flatBest = flatTop.filter(_._4 == 1).map(r => r._1 -> r._3).toMap
    val prunedBest = prunedTop.filter(_._4 == 1).map(r => r._1 -> r._3).toMap
    val subsetOk = prunedBest.forall { case (q, d) => flatBest(q) <= d }
    // recall@3 of the pruned answer vs the flat full scan
    val flatIds = flatTop.map(r => (r._1, r._2))
    val prunedIds = prunedTop.map(r => (r._1, r._2))
    val recall = (prunedIds & flatIds).size.toDouble / flatIds.size

    // ── refine-at-serve: residual + SQ8 stores, store-composed vs inline ──
    val resid = "zip_with(embedding, cw, (a, b) -> CAST(a AS DOUBLE) - b / 1048576.0D)"
    val trainHead = vecs.filter(col("vec_id") < 16384)
    val resHead = Knn.ivfRank(trainHead, cent, "vec_id", "embedding")
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("embedding"))
      .join(broadcast(cent.select(col("cell"), col("cw"))), Seq("cell"))
      .select(col("vec_id"), col("cell"), expr(resid).as("rvec"))
      .localCheckpoint(true)
    val resBooks = Pq.train(
      Pq.subviews(resHead, "vec_id", "rvec", pqM, pqSub),
      "vec_id", pqKs, 2).localCheckpoint(true)
    val resStore = java.nio.file.Files.createTempDirectory("graft_sq8ivfsoak_res").toString
    val sqStore = java.nio.file.Files.createTempDirectory("graft_sq8ivfsoak_sq").toString
    val (_, wFoldRef) = timed {
      Seq(0L, 1L).foreach { b =>
        graft.streaming.VectorStreams.ivfPqResFoldBatch(
          vecs.filter(pmod(col("vec_id"), lit(2)) === b), resStore, b, cent, resBooks,
          nAssign = nAssign, pqM = pqM, pqSub = pqSub)
        graft.streaming.VectorStreams.sqFoldBatch(
          vecs.filter(pmod(col("vec_id"), lit(2)) === b), sqStore, b, bounds)
      }
    }
    val (refined, wRefine) = timed(rank4(
      graft.streaming.VectorStreams.ivfResRefineServeFromStore(
          spark, resStore, sqStore, probes, shortlist = 20, k = 3, nprobe = nprobe)
        .select("query_id", "cand_id", "sq_e6", "rnk")))
    // inline comparator: store shortlist + EXPLODED SQ8 rerank of the
    // 32·20 shortlisted pairs (comparator-cheap at any corpus size)
    val topk = udaf(graft.functions.TopKAgg.longs(3))
    val (inline, wInline) = timed {
      val short = graft.streaming.VectorStreams.ivfPqResServeFromStore(
          spark, resStore, probes, k = 20, nprobe = nprobe)
        .select("query_id", "cand_id")
        .localCheckpoint(true)
      val lut = Sq.adcLut(probes, "vec_id", "embedding",
        spark.read.parquet(s"$sqStore/bounds"))
      rank4(Sq.encode(
          spark.read.parquet(s"$sqStore/vectors").select("vec_id", "embedding"),
          "vec_id", "embedding", spark.read.parquet(s"$sqStore/bounds"))
        .select(col("vec_id").as("cand_id"), col("dim"), col("code"))
        .join(broadcast(short), Seq("cand_id"))
        .join(broadcast(lut), Seq("query_id", "dim", "code"))
        .groupBy("query_id", "cand_id").agg(sum("dq_e6").as("sq_e6"))
        .groupBy("query_id")
        .agg(topk((-col("sq_e6")).cast("double"), col("cand_id")).as("tk"))
        .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("query_id"), col("e._2").as("cand_id"),
          (-col("e._1")).cast("long").as("sq_e6"),
          (col("pos") + 1).cast("int").as("rnk")))
    }
    val refineEqual = refined == inline

    println(s"""{"soak":"sq8ivf_store","corpus":"$shape","n_vecs":$nVecs,"n_queries":32,"dim":64,"ivf_k":$ivfK,"nprobe":$nprobe,"n_assign":$nAssign,"wall_fold":${f"$wFold%.1f"},"wall_flat_serve":${f"$wFlat%.1f"},"wall_pruned_serve":${f"$wPruned%.1f"},"pruned_vs_flat_recall3":${f"$recall%.3f"},"subset_invariant":$subsetOk,"wall_fold_refine_stores":${f"$wFoldRef%.1f"},"wall_refine_serve":${f"$wRefine%.1f"},"wall_refine_inline":${f"$wInline%.1f"},"refine_equal":$refineEqual}""")
    assert(subsetOk, "pruned serve found a closer neighbor than the full scan — impossible for a subset scan")
    assert(refineEqual, "store-composed refine diverged from the inline composition at soak scale")
    spark.stop()
  }
}
