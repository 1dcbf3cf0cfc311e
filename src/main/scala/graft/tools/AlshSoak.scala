package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the MIPS/ALSH family (r14 verdict #5 — the
  * Sq8IvfSoak discipline applied to the lift): a ~500k-vector corpus
  * with PLANTED huge-norm/far-direction winners that a cosine prune
  * provably misses, closed-form MIPS answers, evidence the hot-bucket
  * cap engages on the LIFTED space, and the standing ALSH store
  * serving bit-exact against the one-shot in-session chain.
  *
  * Construction: base corpus = SoakCorpus.flat (near-isotropic, norms
  * ≈ 4–5.3); for each of the 32 queries one planted vector
  * w_q = 1000 · (0.45·q̂ + √(1−0.45²)·r̂⊥) with r̂⊥ a deterministic
  * direction Gram-Schmidt-orthogonalized against q̂ — so EXACTLY (up
  * to float rounding):
  *
  *   - cos(q, w_q) ≈ 0.45, hundreds of base vectors rank cosine-above
  *     it (measured and asserted — ANY cosine shortlist of that depth
  *     misses the MIPS winner; the structural hole the lift closes);
  *   - ⟨q, w_q⟩ ≈ 450·‖q‖ vs ≤ ~5.3·‖q‖ for every base vector — the
  *     MIPS top-1 is w_q by closed form (verified by exact scan).
  *
  * The degenerate-lift regime is deliberate: with M pinned at ~1000,
  * every base vector lifts to s2 ≈ 0 and lands almost parallel to the
  * augmented axis, so base postings concentrate into a handful of
  * buckets per table — exactly the mass the MaxBucket cap must drop
  * (asserted >0 dropped postings, with the planted winners surviving
  * in their sparse buckets). Multi-probe vs single-probe found-counts
  * are printed side by side — the recall lever at soak scale.
  *
  * Prints one JSON evidence line; recorded in BASELINE.md. */
object AlshSoak {
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
    val (dim, tp, nt, k) = (64, 7, 16, 3)
    val cosPlant = 0.45

    val base = SoakCorpus.flat(spark, nVecs).select("vec_id", "embedding")
    // planted winners: deterministic r-direction from the flat
    // generator at offset ids, orthogonalized against the query, mixed
    // at cosine exactly cosPlant, scaled to norm 1000
    val qd = base.filter(col("vec_id") < 32)
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("q_d"))
      .withColumn("q_hat", expr("transform(q_d, v -> v / sqrt(graft_dot_d(q_d, q_d)))"))
    val rd = SoakCorpus.flat(spark, 64).select(
        (col("vec_id") - 32).as("vec_id"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("r_d"))
      .filter(col("vec_id") >= 0)
    val planted = qd.join(rd, Seq("vec_id"))
      .withColumn("rq", expr("graft_dot_d(r_d, q_hat)"))
      .withColumn("r_perp", expr("zip_with(r_d, q_hat, (r, q) -> r - rq * q)"))
      .withColumn("r_hat", expr(
        "transform(r_perp, v -> v / sqrt(graft_dot_d(r_perp, r_perp)))"))
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr(s"zip_with(q_hat, r_hat, (q, r) -> CAST(1000.0D * ($cosPlant * q + sqrt(1.0D - $cosPlant * $cosPlant) * r) AS FLOAT))")
          .as("embedding"))
    val corpus = base.unionByName(planted).localCheckpoint(true)
    val probes = base.filter(col("vec_id") < 32).localCheckpoint(true)

    // ── closed-form checks by exact scan ──
    // NOTE the corpus's own adversarial twist: SoakCorpus.flat's
    // lattice has period 2001, so the base holds ~n/2001 EXACT copies
    // of every direction and the 32 queries are mutually correlated —
    // a query's exact MIPS winner is therefore SOME planted vector
    // (norm 1000 dominates: any planted ip ≥ ~2000 vs ≤ ~25 for every
    // base vector — that part IS closed-form), usually but not always
    // its own. The winner's cosine rank is still in the hundreds: the
    // duplicate classes of the query itself (cosine 1.0) outrank any
    // planted vector in a cosine shortlist.
    val ed = corpus.select(col("vec_id").as("cand_id"),
      expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("c_emb"))
    val qb = probes.select(col("vec_id").as("query_id"),
      expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("q_emb"))
    val scored = ed.crossJoin(broadcast(qb))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("ip", expr("graft_dot_d(q_emb, c_emb)"))
      .withColumn("cosine", expr(
        "ip / (sqrt(graft_dot_d(q_emb, q_emb)) * sqrt(graft_dot_d(c_emb, c_emb)))"))
    val top = scored.groupBy("query_id")
      .agg(max(struct(col("ip"), col("cand_id"), col("cosine"))).as("t"))
      .localCheckpoint(true) // 32 rows
    val mipsTop1Planted = top.filter(col("t.cand_id") >= 1000000L).count()
    // how deep a cosine shortlist must go before the MIPS winner even
    // becomes a candidate (second pass over the same lazy scan plan)
    val minCosRank = scored
      .join(broadcast(top.select(col("query_id"), col("t.cosine").as("w_cos"))),
        Seq("query_id"))
      .groupBy("query_id")
      .agg(sum(when(col("cosine") > col("w_cos"), 1L).otherwise(0L)).as("cos_above"))
      .agg(min(col("cos_above"))).head().getLong(0)
    val exactTop1: Map[Long, Long] = top.collect()
      .map(r => r.getLong(0) -> r.getStruct(1).getLong(1)).toMap

    // ── standing ALSH store: fold (pinned M = corpus max), serve ──
    val m = corpus.agg(max(graft.functions.VectorFunctions.norm("embedding")))
      .head().getDouble(0)
    val store = java.nio.file.Files.createTempDirectory("graft_alshsoak").toString
    val (_, wFold) = timed {
      Seq(0L, 1L).foreach(b =>
        graft.streaming.VectorStreams.mipsAlshFoldBatch(
          corpus.filter(pmod(col("vec_id"), lit(2)) === b), store, b, m, dim, tp, nt))
    }
    // hot-bucket-cap evidence on the LIFTED postings: the near-axis
    // base mass concentrates per table and MUST exceed MaxBucket
    val hotStats = spark.read.parquet(s"$store/buckets")
      .groupBy("tbl", "bucket").count()
      .agg(sum(when(col("count") > graft.operators.Dedup.MaxBucket, col("count"))
          .otherwise(0L)).as("dropped"),
        max("count").as("max_bucket"))
      .head()
    val (droppedPostings, maxBucketSeen) = (hotStats.getLong(0), hotStats.getLong(1))

    def serve(multiProbe: Boolean, kk: Int): Set[(Long, Long, Long, Int)] =
      SoakCorpus.rank4Long(
        graft.streaming.VectorStreams.mipsAlshServeFromStore(
            spark, store, probes, dim, tp, nt, kk, multiProbe = multiProbe)
          .select("query_id", "cand_id", "ip_e6", "rnk"))
    // exact-top-1 recall of the k=3 serves: did the TRUE MIPS winner
    // land at rank 1 (the exact rescore guarantees it does whenever
    // the winner is a candidate)
    def topHits(rows: Set[(Long, Long, Long, Int)]): Long =
      rows.count(r => r._4 == 1 && exactTop1(r._1) == r._2).toLong
    val (multiRows, wMulti) = timed(serve(multiProbe = true, k))
    val (singleRows, wSingle) = timed(serve(multiProbe = false, k))
    val (foundMulti, foundSingle) = (topHits(multiRows), topHits(singleRows))
    // the probe LEVER measured at exactly the designed lifted cosine:
    // is the query's OWN planted vector (lifted cosine = cosPlant, the
    // hard case — winners from correlated queries sit higher) among
    // the candidates? Every planted candidate outranks every base
    // candidate by ip, and there are only 32 planted vectors, so a
    // k=40 serve surfaces ALL planted candidates — presence in the
    // k=40 answer == candidate-set membership.
    def ownPlanted(rows: Set[(Long, Long, Long, Int)]): Long =
      rows.count(r => r._2 == r._1 + 1000000L).toLong
    val ownMulti = ownPlanted(serve(multiProbe = true, 40))
    val ownSingle = ownPlanted(serve(multiProbe = false, 40))
    // the standing store serves EXACTLY the one-shot in-session chain
    val oneShot = SoakCorpus.rank4Long(
      graft.streaming.VectorStreams.mipsAlshServe(probes, corpus, dim, tp, nt, k)
        .select("query_id", "cand_id", "ip_e6", "rnk"))
    val storeExact = singleRows == oneShot

    // ── lifted-IVF MIPS store on the SAME planted corpus: the
    // partition prune vs the hash prune head to head, plus the
    // fold ≡ rebuild contract at this scale (2-batch fold == 1-batch
    // fold, both under the same pinned quantizer + M) ──
    val corpusLift = corpus
      .select(col("vec_id"),
        expr(s"transform(embedding, v -> CAST(v AS DOUBLE) / ${m}D)").as("sc"))
      .withColumn("s2", expr("graft_dot_d(sc, sc)"))
      .withColumn("ea", expr(
        "array_append(sc, CASE WHEN s2 >= 1.0D THEN CAST(0.0 AS DOUBLE) ELSE sqrt(1.0D - s2) END)"))
      .select("vec_id", "ea")
    val liftedCent = graft.operators.Knn.ivfTrain(
      corpusLift.filter(col("vec_id") < 65536 || col("vec_id") >= 1000000L),
      "vec_id", "ea", 64, 2).localCheckpoint(true)
    val ivfStore = java.nio.file.Files.createTempDirectory("graft_alshsoak_ivf").toString
    val (_, wIvfFold) = timed {
      Seq(0L, 1L).foreach(b =>
        graft.streaming.VectorStreams.mipsIvfFoldBatch(
          corpus.filter(pmod(col("vec_id"), lit(2)) === b), ivfStore, b,
          liftedCent, m, nAssign = 2))
    }
    def serveIvf(store: String, kk: Int): Set[(Long, Long, Long, Int)] =
      SoakCorpus.rank4Long(
        graft.streaming.VectorStreams.mipsIvfServeFromStore(
            spark, store, probes, k = kk, nprobe = 4)
          .select("query_id", "cand_id", "ip_e6", "rnk"))
    val (ivfRows, wIvfServe) = timed(serveIvf(ivfStore, k))
    val (ivfTop1, ivfOwn) = (topHits(ivfRows), ownPlanted(serveIvf(ivfStore, 40)))
    // fold ≡ rebuild: a one-batch store under the same pins serves equal
    val ivfStore1 = java.nio.file.Files.createTempDirectory("graft_alshsoak_ivf1").toString
    graft.streaming.VectorStreams.mipsIvfFoldBatch(
      corpus, ivfStore1, 0L, liftedCent, m, nAssign = 2)
    val ivfFoldExact = serveIvf(ivfStore1, k) == ivfRows

    println(s"""{"soak":"alsh_mips","n_vecs":${nVecs + 32},"n_queries":32,"dim":$dim,"planes":$tp,"tables":$nt,"planted_cos":$cosPlant,"pinned_m":${f"$m%.1f"},"mips_top1_planted":$mipsTop1Planted,"min_cosine_rank_of_winner":$minCosRank,"dropped_postings":$droppedPostings,"max_bucket_seen":$maxBucketSeen,"top1_found_multiprobe":$foundMulti,"top1_found_singleprobe":$foundSingle,"own_planted_cand_multiprobe":$ownMulti,"own_planted_cand_singleprobe":$ownSingle,"store_serve_exact":$storeExact,"ivf_top1_found":$ivfTop1,"ivf_own_planted_cand":$ivfOwn,"ivf_fold_eq_rebuild":$ivfFoldExact,"wall_fold":${f"$wFold%.1f"},"wall_serve_multi":${f"$wMulti%.1f"},"wall_serve_single":${f"$wSingle%.1f"},"wall_ivf_fold":${f"$wIvfFold%.1f"},"wall_ivf_serve":${f"$wIvfServe%.1f"}}""")
    assert(ivfFoldExact,
      "lifted-IVF store fold != rebuild at soak scale")
    // the partition prune's claim on this corpus, pinned after
    // measurement (32/32 exact winners found at nprobe=4 over 64
    // lifted cells — the planted winners' equatorial cells are exactly
    // what the lifted quantizer separates from the near-axis base mass)
    assert(ivfTop1 >= 30L && ivfOwn >= 30L,
      s"lifted-IVF recall collapsed on the planted corpus: top1=$ivfTop1 own=$ivfOwn")
    assert(mipsTop1Planted == 32L,
      "closed form violated: a huge-norm planted vector lost exact MIPS top-1 to a base vector")
    assert(minCosRank > 100L,
      s"MIPS winners are not cosine-hidden enough (min rank $minCosRank) — the cosine-prune-misses claim is void")
    assert(droppedPostings > 0L,
      "hot-bucket cap never engaged on the lifted postings — the degenerate-lift regime did not materialize")
    assert(storeExact,
      "standing ALSH store serve diverged from the one-shot in-session chain")
    // multi-probe candidates are a SUPERSET of single-probe's and the
    // rescore is exact, so top-1 recall is monotone in probing — an
    // inversion would mean the probe expansion corrupted the chain.
    // (No absolute floor on top-1 recall: the lattice corpus's
    // deterministic hyperplane/vector correlations make the random-
    // collision model inapplicable — the printed counts ARE the
    // fixture's truth, recorded in BASELINE.md.)
    assert(foundMulti >= foundSingle,
      s"probe superset inverted top-1 recall: multi=$foundMulti single=$foundSingle")
    assert(ownMulti >= 28L && ownMulti > ownSingle,
      s"multi-probe recall lever missing at the designed cosine: multi=$ownMulti single=$ownSingle")
    spark.stop()
  }
}
