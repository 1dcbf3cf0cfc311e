package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.SimilarityStreamQueries

/** Structural invariants of the product-quantization ANN family that
  * the hash-exact oracles do not express: index shape (a complete
  * PqM-code row set per vector — the compression contract), ADC
  * ranking sanity, shortlist containment of the rerank stage, and a
  * hard recall floor for the shortlist+rerank pipeline. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("pq_codes is a complete rectangular index: PqM codes per vector, all in range") {
    val codes = q("pq_codes").collect()
    val perVec = codes.groupBy(_.getLong(0))
    assert(perVec.nonEmpty)
    assert(perVec.values.forall(_.length == SimilarityStreamQueries.PqM))
    assert(perVec.values.forall(_.map(_.getInt(1)).sorted.toSeq ==
      (0 until SimilarityStreamQueries.PqM)))
    assert(codes.forall { r =>
      val c = r.getLong(2); c >= 0 && c < SimilarityStreamQueries.PqKs })
  }

  test("ADC ranking is monotone in approximate distance and exactly top-3 per query") {
    val rows = q("pq_adc_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.length == 3)
      assert(g.sortBy(_._4).map(_._3).sliding(2).forall(p => p.head <= p.last))
    }
  }

  test("every reranked answer came from the 20-candidate ADC shortlist") {
    val shortlist = SimilarityStreamQueries.pqAdcRanked(spark, dir, 20)
      .select("query_id", "cand_id")
    val rr = q("pq_rerank_topk").select("query_id", "cand_id")
    assert(rr.join(shortlist, Seq("query_id", "cand_id"), "left_anti").count() == 0)
    val perQ = rr.groupBy("query_id").count().collect()
    assert(perQ.nonEmpty && perQ.forall(_.getLong(1) == 3))
  }

  test("shortlist+rerank recall clears a hard floor and beats pure ADC") {
    // pq_recall measures the reranked pipeline against the exact top-3
    val rerank = q("pq_recall").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rerankHits = rerank.values.sum
    // pure-ADC hits against the same exact baseline: rerank answers
    // that ADC already ranked in its own top-3 AND that are exact hits
    // form a subset, so comparing total hit counts is sufficient.
    val exactHitPairs = q("pq_rerank_topk").select("query_id", "cand_id")
    val adcHits = q("pq_adc_topk").select("query_id", "cand_id")
      .join(exactHitPairs, Seq("query_id", "cand_id"), "left_semi").count()
    assert(rerankHits >= 1, "rerank pipeline found no exact neighbors at all")
    // the rerank stage re-scores a superset of the ADC answers exactly,
    // so its hit count cannot be lower than what pure ADC got right
    assert(rerankHits * 3 >= adcHits, s"rerank=$rerankHits adcOverlap=$adcHits")
    val totalQueries = rerank.size
    assert(rerankHits.toDouble / (3 * totalQueries) >= 0.25,
      s"recall@3 collapsed: $rerankHits hits over $totalQueries queries")
  }

  test("IVF-ADC composition: scores agree with full-scan ADC on shared pairs, " +
      "candidates are a strict subset, and the coarse prune sits below the agg") {
    // the composed path must never invent a score: for every
    // (query, cand) it returns, the full ADC scan computes the same
    // adist_e6 (both sum the same PqM LUT entries)
    val ivf = q("pq_ivf_adc_topk").select("query_id", "cand_id", "adist_e6")
    val full = SimilarityStreamQueries.pqAdcRanked(spark, dir, Int.MaxValue)
      .select(col("query_id"), col("cand_id"), col("adist_e6").as("full_e6"))
    val joined = ivf.join(full, Seq("query_id", "cand_id"), "left").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(!r.isNullAt(3) && r.getLong(2) == r.getLong(3),
        s"composed ADC diverges from full scan on ${r.getLong(0)}->${r.getLong(1)}") }
    // the point of the composition: the code scan is bounded by the
    // candidate set, a strict subset of all queriesx(n-1) pairs
    val emb = graft.sources.Tables(spark, dir, "embeddings")
    val n = emb.count()
    val nQueries = emb.filter(col("vec_id") < 32).count()
    val candPairs = SimilarityStreamQueries.pqIvfAdcRanked(spark, dir, Int.MaxValue).count()
    assert(candPairs < nQueries * (n - 1),
      s"IVF prune admitted every pair ($candPairs of ${nQueries * (n - 1)})")
    // plan gate: the candidate restriction is a broadcast join BELOW
    // the ADC aggregate — the full code scan never reaches the LUT join
    val plan = q("pq_ivf_adc_topk").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.linesIterator.take(30).mkString("\n"))
  }

  test("PQ rankers are bounded-heap aggregates, not per-query window sorts") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    // the annServe discipline: top-k per query must be map-side-combining
    // ObjectHashAggregate state (shuffle carries O(k) per query per
    // mapper), never row_number over a full-shuffle window sort
    Seq("pq_adc_topk", "pq_rerank_topk").foreach { n =>
      val p = q(n).queryExecution.sparkPlan
      assert(p.collect { case w: WindowExec => w }.isEmpty,
        s"$n still plans a Window sort:\n$p")
      assert(p.collect { case a: ObjectHashAggregateExec => a }.nonEmpty, s"$n:\n$p")
    }
    // the composed path keeps the (K=16-cell, per-vector) ivf ranking
    // window, but its ADC ranking must be heap-aggregated too
    val p = q("pq_ivf_adc_topk").queryExecution.sparkPlan
    assert(p.collect { case a: ObjectHashAggregateExec => a }.nonEmpty, p.toString)
  }

  test("SQ8: complete code index, in-range codes, heap-ranked broadcast-LUT ADC scan") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    // index shape: one code per (vector, dimension), all in 0..255
    val codes = graft.operators.Sq.encode(
      graft.sources.Tables(spark, dir, "embeddings"), "vec_id", "embedding",
      graft.operators.Sq.train(graft.sources.Tables(spark, dir, "embeddings"),
        "embedding")).collect()
    val perVec = codes.groupBy(_.getLong(0))
    assert(perVec.nonEmpty)
    assert(perVec.values.forall(_.length == SimilarityStreamQueries.Dim))
    assert(codes.forall { r => val c = r.getInt(2); c >= 0 && c <= 255 })
    // plan: ranking rides the bounded heap (no window), the per-query
    // LUT broadcasts against the code scan (no shuffle of the index on
    // a non-key), and nothing goes cartesian
    val p = q("sq8_adc_topk").queryExecution.sparkPlan
    assert(p.collect { case w: WindowExec => w }.isEmpty,
      s"sq8_adc_topk still plans a Window sort:\n$p")
    assert(p.collect { case a: ObjectHashAggregateExec => a }.nonEmpty, p.toString)
    assert(p.toString.contains("BroadcastHashJoin"), p.toString)
    assert(!p.toString.contains("CartesianProduct"), p.toString)
    // the PACKED plan: the corpus side is one row per vector scored by
    // the codegen'd kernel against the broadcast flat LUT — no ×dim
    // Generate on the candidate side (the only Generate allowed is the
    // bounded LUT build under its BroadcastExchange), heap-ranked
    val pp = q("sq8_adc_packed_topk").queryExecution.sparkPlan
    assert(pp.toString.contains("graft_sq8_adc"), pp.toString)
    assert(pp.collect { case w: WindowExec => w }.isEmpty, pp.toString)
    assert(pp.collect { case a: ObjectHashAggregateExec => a }.nonEmpty, pp.toString)
    // exploded == packed, row for row (integer sums are order-insensitive)
    val exploded = q("sq8_adc_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val packed = q("sq8_adc_packed_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(packed === exploded)
    assert(packed.nonEmpty)
  }

  test("SQ8 constant dimension: encodes to 0, reconstructs to mn, no div-by-zero under ANSI") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // dim 0 constant (mx == mn), dim 1 varying — the CASE guard must
    // short-circuit the (v - mn) / 0 branch in BOTH encode paths and
    // the LUT reconstruction (Spark 4 runs ANSI; Infinity→INT casts throw)
    val vecs = Seq((0L, Seq(0.5f, -1.0f)), (1L, Seq(0.5f, 1.0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val bounds = graft.operators.Sq.train(vecs, "embedding")
    assert(bounds.filter(col("dim") === 0)
      .head().getDouble(1) === bounds.filter(col("dim") === 0).head().getDouble(2))
    val longCodes = graft.operators.Sq.encode(vecs, "vec_id", "embedding", bounds)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    assert(longCodes((0L, 0)) === 0 && longCodes((1L, 0)) === 0) // constant dim → 0
    assert(longCodes((0L, 1)) === 0 && longCodes((1L, 1)) === 255) // varying dim spans
    val packed = graft.operators.Sq.encodePacked(vecs, "vec_id", "embedding", bounds)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(packed(0L) === Seq(0, 0) && packed(1L) === Seq(0, 255))
    // LUT on the constant dim: recon = mn for every code → dq_e6 = 0
    // for a query equal to mn
    val lut = graft.operators.Sq.adcLut(vecs.filter(col("vec_id") === 0),
        "vec_id", "embedding", bounds)
      .filter(col("dim") === 0).collect()
    assert(lut.length === 256)
    assert(lut.forall(_.getLong(3) === 0L))
  }

  test("ADC kernels fail loudly on LUT-shape mismatches and out-of-range codes") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    def chainHas(t: Throwable, s: String): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .exists(e => Option(e.getMessage).exists(_.contains(s)))
    // graft_sq8_adc: 2 codes need a 512-entry LUT, not 4
    val short8 = Seq((Seq(0, 1), Seq(0L, 1L, 2L, 3L))).toDF("codes", "lut")
    val e1 = intercept[Throwable] {
      short8.select(expr("graft_sq8_adc(codes, lut)")).collect()
    }
    assert(chainHas(e1, "graft_sq8_adc"), e1.toString)
    // graft_adc_sum with ks=4: LUT must be m*ks = 8 entries
    val short4 = Seq((Seq(0, 1), Seq(0L, 1L, 2L, 3L))).toDF("codes", "lut")
    val e2 = intercept[Throwable] {
      short4.select(expr("graft_adc_sum(codes, lut, 4)")).collect()
    }
    assert(chainHas(e2, "graft_adc_sum"), e2.toString)
    // right-sized LUT but a code outside [0, ks): loud, not a garbage read
    val oob = Seq((Seq(0, 5), Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L))).toDF("codes", "lut")
    val e3 = intercept[Throwable] {
      oob.select(expr("graft_adc_sum(codes, lut, 4)")).collect()
    }
    assert(chainHas(e3, "outside [0, 4)"), e3.toString)
  }

  test("packed IVF-ADC: graft_adc_sum kernel in plan, coarse prune below it, == exploded row for row") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    val pp = q("pq_ivf_adc_packed_topk").queryExecution.sparkPlan
    assert(pp.toString.contains("graft_adc_sum"), pp.toString)
    assert(pp.toString.contains("BroadcastHashJoin"), pp.toString)
    // the candidate-ranking stage is the bounded heap; the only windows
    // allowed are the probe/posting-side ivfRank cell rankings (K=16
    // broadcast rows per vector — bounded by construction)
    assert(pp.collect { case a: ObjectHashAggregateExec => a }.nonEmpty, pp.toString)
    val exploded = q("pq_ivf_adc_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val packed = q("pq_ivf_adc_packed_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(packed === exploded)
    assert(packed.nonEmpty)
  }

  test("residual IVFADC: packed kernel plan == exploded row for row; residual SAE <= raw SAE") {
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    val pp = q("pq_ivfres_packed_topk").queryExecution.sparkPlan
    assert(pp.toString.contains("graft_adc_sum"), pp.toString)
    assert(pp.collect { case a: ObjectHashAggregateExec => a }.nonEmpty, pp.toString)
    val exploded = q("pq_ivfres_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val packed = q("pq_ivfres_packed_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(packed === exploded)
    assert(packed.nonEmpty)
    // the residual claim as an invariant: over the identical pair set,
    // residual codes reconstruct distances at least as tightly as raw
    // codes (the margin is ~6% on this isotropic corpus — see the
    // pq_ivfres_distortion oracle row; real clustered embeddings widen it)
    val d = q("pq_ivfres_distortion").collect().head
    val (n, saeRes, saeRaw) = (d.getLong(0), d.getLong(1), d.getLong(2))
    assert(n > 0)
    assert(saeRes <= saeRaw, s"residual SAE $saeRes > raw SAE $saeRaw")
  }

  test("IVF-SQ8 composition: packed kernel plan == exploded row for row, coarse prune below it") {
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    val pp = q("sq8_ivf_adc_packed_topk").queryExecution.sparkPlan
    assert(pp.toString.contains("graft_sq8_adc"), pp.toString)
    assert(pp.toString.contains("BroadcastHashJoin"), pp.toString)
    assert(pp.collect { case a: ObjectHashAggregateExec => a }.nonEmpty, pp.toString)
    val exploded = q("sq8_ivf_adc_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val packed = q("sq8_ivf_adc_packed_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(packed === exploded)
    assert(packed.nonEmpty)
  }

  test("every SQ8-refined answer came from the residual-ADC 20-candidate shortlist") {
    val short = SimilarityStreamQueries.pqIvfResRanked(spark, dir, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = q("pq_ivfres_refine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(refined.nonEmpty)
    refined.foreach(p => assert(short.contains(p),
      s"refined answer $p not in the residual shortlist"))
  }

  test("residual estimator genuinely diverges from the raw one on the shared pair set") {
    // if the residual path accidentally fed raw vectors (e.g. the 2^20
    // centroid-scale bug this round's build caught), the two estimators
    // would be near-identical pairwise; require a majority of pairs to
    // carry different estimates
    val res = SimilarityStreamQueries.pqIvfResScored(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val raw = SimilarityStreamQueries.pqIvfAdcScored(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(res.keySet === raw.keySet) // identical coarse prune
    val differing = res.count { case (k, v) => raw(k) != v }
    assert(differing * 2 > res.size, s"only $differing of ${res.size} pairs differ")
  }

  test("SQ8 encode clamps out-of-range values to [0, 255] in both layouts (pinned-bounds store case)") {
    import spark.implicits._
    // bounds trained on a NARROW first batch; a later batch carries
    // values outside [mn, mx] — the standing-store contract (sqFoldBatch
    // pins bounds from the first fold). Unclamped, these would encode to
    // codes < 0 / > 255: raw out-of-bounds indices for the packed kernel.
    val trainBatch = Seq((0L, Seq(0.0f, -1.0f)), (1L, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val bounds = graft.operators.Sq.train(trainBatch, "embedding")
    val laterBatch = Seq((2L, Seq(-5.0f, 9.0f)), (3L, Seq(7.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val long = graft.operators.Sq.encode(laterBatch, "vec_id", "embedding", bounds)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    assert(long((2L, 0)) === 0 && long((2L, 1)) === 255) // saturated, not -1275 / 1275
    assert(long((3L, 0)) === 255 && long((3L, 1)) === 128) // in-range dim stays exact
    val packed = graft.operators.Sq.encodePacked(laterBatch, "vec_id", "embedding", bounds)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(packed(2L) === Seq(0, 255) && packed(3L) === Seq(255, 128))
    // the packed kernel accepts the clamped codes (all LUT reads in
    // bounds) and equals the exploded join's sum per pair
    graft.functions.GraftFunctions.register(spark)
    val lut = graft.operators.Sq.adcLutPacked(trainBatch, "vec_id", "embedding", bounds)
    val packedScores = graft.operators.Sq
      .encodePacked(laterBatch, "vec_id", "embedding", bounds)
      .select(col("vec_id").as("cand_id"), col("codes"))
      .crossJoin(broadcast(lut))
      .select(col("query_id"), col("cand_id"),
        expr("graft_sq8_adc(codes, lut)").as("adist_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val explodedScores = graft.operators.Sq
      .encode(laterBatch, "vec_id", "embedding", bounds)
      .select(col("vec_id").as("cand_id"), col("dim"), col("code"))
      .join(graft.operators.Sq.adcLut(trainBatch, "vec_id", "embedding", bounds),
        Seq("dim", "code"))
      .groupBy("query_id", "cand_id").agg(sum("dq_e6").as("adist_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(packedScores === explodedScores)
    assert(packedScores.nonEmpty)
  }

  test("adcLutFlat stays aligned under dead codebook cells (sentinel-densified to m·ks)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // hand-built codebooks with HOLES: ks = 4 but cell 1 dead in m=0 and
    // cells 0,3 dead in m=1 — the shape Lloyd's members-only update
    // produces. Survivor cells keep their original ids, so a naive
    // collect would misalign every entry after a hole (ADVICE r12).
    val ks = 4
    val books = Seq(
      (0, 0L, Seq(0.0, 0.0)), (0, 2L, Seq(1.0, 1.0)), (0, 3L, Seq(2.0, 2.0)),
      (1, 1L, Seq(0.5, 0.5)), (1, 2L, Seq(1.5, 1.5)))
      .toDF("m", "cell", "cw")
    val vecs = Seq((0L, Seq(0.1f, 0.1f, 0.6f, 0.6f)), (1L, Seq(2.0f, 2.0f, 1.4f, 1.4f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val subs = graft.operators.Pq.subviews(vecs, "vec_id", "embedding", 2, 2)
    val lutRows = graft.operators.Pq.adcLutFlat(subs, "vec_id", books, ks)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(lutRows.values.forall(_.length == 2 * ks), "LUT not densified to m*ks")
    // dead slots carry the sentinel; live slots carry real e6 distances
    assert(lutRows(0L)(1) === graft.operators.Pq.DeadCellSentinel)       // m=0 cell 1
    assert(lutRows(0L)(ks + 0) === graft.operators.Pq.DeadCellSentinel)  // m=1 cell 0
    assert(lutRows(0L)(ks + 3) === graft.operators.Pq.DeadCellSentinel)  // m=1 cell 3
    assert(lutRows(0L)(2) < graft.operators.Pq.DeadCellSentinel)
    // packed kernel over codes encoded against the SAME holey codebooks
    // == the exploded (m, code) ⋈ LUT join, per pair
    val lut = graft.operators.Pq.adcLutFlat(subs, "vec_id", books, ks)
      .withColumnRenamed("vec_id", "query_id")
    val packed = graft.operators.Pq.encodePacked(subs, "vec_id", books)
      .select(col("vec_id").as("cand_id"), col("codes"))
      .crossJoin(broadcast(lut))
      .select(col("query_id"), col("cand_id"),
        expr(s"graft_adc_sum(codes, lut, $ks)").as("adist_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exploded = graft.operators.Pq.encode(subs, "vec_id", books)
      .select(col("vec_id").as("cand_id"), col("m"), col("code"))
      .join(graft.operators.Pq.adcLut(subs, "vec_id", books)
        .select(col("vec_id").as("query_id"), col("m"), col("code"), col("dq_e6")),
        Seq("m", "code"))
      .groupBy("query_id", "cand_id").agg(sum("dq_e6").as("adist_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(packed === exploded)
    assert(packed.nonEmpty)
  }

  test("MIPS ADC: packed kernel plan == exploded row for row; exact MIPS order genuinely differs from L2") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    val pp = q("pq_ip_adc_packed_topk").queryExecution.sparkPlan
    assert(pp.toString.contains("graft_adc_sum"), pp.toString)
    assert(pp.collect { case w: WindowExec => w }.isEmpty, pp.toString)
    assert(pp.collect { case a: ObjectHashAggregateExec => a }.nonEmpty, pp.toString)
    val exploded = q("pq_ip_adc_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val packed = q("pq_ip_adc_packed_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(packed === exploded)
    assert(packed.nonEmpty)
    // every estimate is a sum of m LIVE LUT entries — the −2⁵⁰ dead
    // sentinel can never leak into a ranking built against the same
    // codebooks the codes were encoded with
    assert(packed.forall(_._3 > -(1L << 49)), "dead-slot sentinel leaked into a MIPS sum")
    // the metric is genuinely different: MIPS top-3 ids diverge from
    // the L2-ADC top-3 for at least one query on this corpus (norms
    // vary, so the dot and the distance order can't coincide everywhere)
    val l2 = q("pq_adc_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(packed.map(r => (r._1, r._2)) != l2,
      "MIPS ranking coincides with L2 everywhere — metric plumbing suspect")
  }

  test("ipLutFlat buries dead codebook cells under DESC ranking (sentinel = −2⁵⁰)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val ks = 4
    val books = Seq(
      (0, 0L, Seq(0.0, 0.0)), (0, 2L, Seq(1.0, 1.0)), (0, 3L, Seq(2.0, 2.0)),
      (1, 1L, Seq(0.5, 0.5)), (1, 2L, Seq(1.5, 1.5)))
      .toDF("m", "cell", "cw")
    val vecs = Seq((0L, Seq(0.1f, 0.1f, 0.6f, 0.6f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val subs = graft.operators.Pq.subviews(vecs, "vec_id", "embedding", 2, 2)
    val lutRows = graft.operators.Pq.ipLutFlat(subs, "vec_id", books, ks)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(lutRows(0L).length === 2 * ks)
    // dead slots carry the NEGATED sentinel (must LOSE under desc);
    // live slots carry real e6 dots
    assert(lutRows(0L)(1) === -graft.operators.Pq.DeadCellSentinel)
    assert(lutRows(0L)(ks + 0) === -graft.operators.Pq.DeadCellSentinel)
    assert(lutRows(0L)(ks + 3) === -graft.operators.Pq.DeadCellSentinel)
    assert(lutRows(0L)(2) > -graft.operators.Pq.DeadCellSentinel)
  }

  test("ALSH lift: unit-norm items, scale-invariant query buckets, lifted-cosine order == dot order") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.sources.Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding").localCheckpoint(true)
    // double-array buckets == float-array buckets on exactly-
    // representable components (the bucketD contract)
    val vf = Seq((0L, Seq(0.5f, -0.25f, 0.125f, 1.0f))).toDF("vec_id", "e")
      .select(col("vec_id"), col("e").cast("array<float>").as("ef"),
        expr("transform(e, v -> CAST(v AS DOUBLE))").as("ed"))
    val bb = vf.select(
      expr("graft_lsh_bucket(ef, 3L, 4, 7)").as("bf"),
      expr("graft_lsh_bucket(ed, 3L, 4, 7)").as("bd")).head()
    assert(bb.getLong(0) === bb.getLong(1))
    // the lift puts every item ON the unit sphere (up to fp rounding)
    val m = emb.agg(max(graft.functions.VectorFunctions.norm("embedding")))
      .head().getDouble(0)
    val lifted = emb.select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          v => v.cast("double") / lit(m)).as("sc"))
      .withColumn("s2", expr("graft_dot_d(sc, sc)"))
      .withColumn("ea", expr(
        "array_append(sc, CASE WHEN s2 >= 1.0D THEN CAST(0.0 AS DOUBLE) ELSE sqrt(1.0D - s2) END)"))
      .withColumn("anorm", expr("sqrt(graft_dot_d(ea, ea))"))
    val norms = lifted.select("anorm").collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9),
      s"lifted norms stray from 1: ${norms.filter(n => math.abs(n - 1.0) >= 1e-9).take(3).mkString(",")}")
    // monotonicity (the reduction's theorem, checked on data): for one
    // query, ordering candidates by lifted cosine == ordering by raw
    // inner product
    val qv = emb.filter(col("vec_id") === 0)
      .select(expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("qd"))
      .head().getSeq[Double](0).toArray
    val rows = lifted.filter(col("vec_id") > 0).limit(20)
      .join(emb.withColumnRenamed("embedding", "raw"), Seq("vec_id"))
      .select(col("vec_id"), col("ea"),
        expr("transform(raw, v -> CAST(v AS DOUBLE))").as("rd"))
      .collect()
    val qn = math.sqrt(qv.map(x => x * x).sum)
    val scored = rows.map { r =>
      val ea = r.getSeq[Double](1).toArray
      val rd = r.getSeq[Double](2).toArray
      val dot = qv.indices.map(i => qv(i) * rd(i)).sum
      // lifted cosine: ⟨[q;0], x'⟩ / ‖q‖ (x' is unit)
      val lcos = qv.indices.map(i => qv(i) * ea(i)).sum / qn
      (dot, lcos)
    }
    val byDot = scored.sortBy(-_._1).map(_._2).toSeq
    assert(byDot === byDot.sorted.reverse, "lifted cosine is not monotone in the inner product")
    // the registered rows agree end to end (nonempty, bounded ranks)
    val alsh = q("mips_alsh_topk").collect()
    assert(alsh.nonEmpty && alsh.forall(_.getInt(3) <= 3))
  }

  test("packed PQ scan: graft_adc_sum kernel, no window, == exploded ADC row for row") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    val pp = q("pq_adc_packed_topk").queryExecution.sparkPlan
    assert(pp.toString.contains("graft_adc_sum"), pp.toString)
    assert(pp.collect { case w: WindowExec => w }.isEmpty, pp.toString)
    assert(pp.collect { case a: ObjectHashAggregateExec => a }.nonEmpty, pp.toString)
    val exploded = q("pq_adc_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val packed = q("pq_adc_packed_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(packed === exploded)
    assert(packed.nonEmpty)
  }
}
