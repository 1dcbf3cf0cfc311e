package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization as reusable operators (SURVEY.md §7.5
  * similarity search — the compressed-index family): subspace views,
  * deterministic Lloyd codebook training, encoding, and the ADC
  * lookup table. Generalized out of the query layer (which keeps its
  * memoized corpus-specific wrappers) so standing stores can train
  * codebooks once, PIN them, and encode every later batch against the
  * pinned model — the fold ≡ rebuild property all the engine's stores
  * share, exact here because encoding is per-vector.
  *
  * Determinism contract (what makes PQ exactly oracle-able):
  * assignments tie-break on (rounded L2² asc, cell), centroid means
  * divide order-insensitive BIGINT sums of integer-quantized
  * components (q = floor(v·2²⁰ + 0.5)) rescaled by 2⁻²⁰ (L2 is not
  * scale-invariant, unlike IVF's cosine), and ADC distances quantize
  * to e6-scaled BIGINTs — no float summation order anywhere.
  */
object Pq {

  /** Sequential-fold squared L2 of two double arrays (the codegen'd
    * SquaredL2 expression — same accumulation order as the DuckDB
    * list_reduce twin). */
  private def d2Sql(a: String, b: String) = s"graft_l2sq($a, $b)"

  /** Per-subspace views: (idCol, m, sub: array<double>, qsub:
    * array<bigint>) — one row per (vector, subspace). */
  def subviews(vecs: DataFrame, idCol: String, embCol: String,
      m: Int, subDim: Int): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    Dedup.spread(vecs)
      .select(col(idCol), col(embCol))
      .withColumn("m", explode(expr(s"sequence(0, ${m - 1})")))
      .withColumn("subf", expr(s"slice($embCol, CAST(m * $subDim + 1 AS INT), $subDim)"))
      .select(col(idCol), col("m"),
        expr("transform(subf, v -> CAST(v AS DOUBLE))").as("sub"),
        expr("transform(subf, v -> CAST(floor(" +
          "CAST(v AS DOUBLE) * 1048576.0D + 0.5D) AS BIGINT))").as("qsub"))
  }

  /** Train per-subspace codebooks (m, cell, cw: array<double>) with
    * `iters` Lloyd rounds from the first-`ks` seed (rows with
    * id < ks), all subspaces in ONE frame. `subs` is a [[subviews]]
    * output. Only the m×ks codebook checkpoints between rounds. */
  def train(subs: DataFrame, idCol: String, ks: Int, iters: Int): DataFrame = {
    graft.functions.GraftFunctions.register(subs.sparkSession)
    // Argmin as a map-side-combinable MIN aggregate, not a row_number
    // window (r17 optimization, guide §2.3 "aggregate before you
    // shuffle"): cells are distinct within a (vector, subspace) group,
    // so min(struct(dist, cell)) picks exactly the window's
    // (dist asc, cell asc) head — same Catalyst double ordering the
    // window sort used — while the partial aggregate completes on the
    // broadcast-join side (every cell of a vector is co-located), so
    // the exchange carries ONE row per (vector, subspace) and the
    // per-round sort disappears. `qsub` is constant per group (it is
    // a property of the vector, not the cell), so first() is exact.
    def assign(cent: DataFrame): DataFrame =
      subs.join(broadcast(cent), Seq("m"))
        .withColumn("dist", round(expr(d2Sql("sub", "cw")), 8))
        .groupBy(col(idCol), col("m"))
        .agg(min(struct(col("dist"), col("cell"))).as("__mn"),
          first(col("qsub")).as("qsub"))
        .select(col(idCol), col("m"), col("qsub"), col("__mn.cell").as("cell"))
    def update(a: DataFrame): DataFrame =
      a.select(col("m"), col("cell"), posexplode(col("qsub")).as(Seq("i", "qv")))
        .groupBy("m", "cell", "i")
        .agg(sum("qv").as("sv"), count(lit(1)).as("n"))
        .groupBy("m", "cell")
        .agg(collect_list(struct(col("i"),
          ((col("sv").cast("double") / col("n").cast("double")) / 1048576.0d).as("w"))).as("ws"))
        .select(col("m"), col("cell"), expr("transform(array_sort(ws), x -> x.w)").as("cw"))
    // Rounds chain LAZILY (r18): each round references the previous
    // codebook exactly once (the broadcast side of assign), so the
    // whole training is ONE job materialized by the final eager
    // checkpoint instead of one job barrier per round + one for the
    // seed. The final cut stays eager so every downstream reference
    // (encode, LUT build — often materialized concurrently by AQE
    // broadcast builds) reads the m×ks result instead of racing to
    // re-execute the training chain.
    var cent = subs.filter(col(idCol) < ks)
      .select(col("m"), col(idCol).as("cell"), col("sub").as("cw"))
    for (_ <- 1 to iters)
      cent = update(assign(cent))
    cent.localCheckpoint(true) // m×ks rows
  }

  /** Encode each (vector, subspace) to its nearest codebook cell:
    * (idCol, m, code) — the PQ index, all a code scan ever reads. */
  def encode(subs: DataFrame, idCol: String, codebooks: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(subs.sparkSession)
    // Same argmin-as-aggregate shape as [[train]]'s assign (r17): the
    // min(struct) is bit-equal to the retired (dist asc, cell asc)
    // row_number head, and the encode exchange shrinks from ks rows to
    // one row per (vector, subspace) with no sort.
    subs.join(broadcast(codebooks), Seq("m"))
      .withColumn("dist", round(expr(d2Sql("sub", "cw")), 8))
      .groupBy(col(idCol), col("m"))
      .agg(min(struct(col("dist"), col("cell"))).as("__mn"))
      .select(col(idCol), col("m"), col("__mn.cell").as("code"))
  }

  /** ADC lookup table for a query batch: (idCol, m, code, dq_e6) —
    * the exact e6-quantized subvector→cell distances a code scan sums
    * per candidate. nq×m×ks rows; broadcast it. */
  def adcLut(querySubs: DataFrame, idCol: String, codebooks: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(querySubs.sparkSession)
    querySubs.join(broadcast(codebooks), Seq("m"))
      .select(col(idCol), col("m"), col("cell").as("code"),
        expr(s"CAST(floor(${d2Sql("sub", "cw")} * 1000000.0D) AS BIGINT)").as("dq_e6"))
  }

  /** PACKED PQ codes: (id, codes array<int>) with codes[m] the m-th
    * subspace's code — one row per vector (the [[encode]] long form is
    * the oracle-replayable view; this is the scan layout: m small
    * integers per vector, no ×m row blow-up). */
  def encodePacked(subs: DataFrame, idCol: String,
      codebooks: DataFrame): DataFrame =
    encode(subs, idCol, codebooks)
      .groupBy(idCol)
      .agg(expr("transform(array_sort(collect_list(struct(m, code))), x -> CAST(x.code AS INT))")
        .as("codes"))

  /** Sentinel for a dead-cell LUT slot: a code id Lloyd's update
    * dropped from the codebook (no assigned members) can never be
    * emitted by [[encode]] against the same codebooks, so the slot is
    * never read — but it must EXIST for the flat m·ks+code indexing to
    * stay aligned (ADVICE r12), and if a foreign code ever reaches it
    * the ~1.1e15 value dominates any e6 distance sum unmissably. */
  val DeadCellSentinel: Long = 1L << 50

  /** Per-query FLAT ADC LUT: (id, lut array<bigint>) with entry
    * m·ks + code = [[adcLut]]'s dq_e6 — the broadcast side of the
    * packed scan (`graft_adc_sum(codes, lut, ks)` indexes it
    * directly). m×ks longs per query: probe-batch bounded.
    *
    * DENSE by construction: [[train]]'s Lloyd update only emits cells
    * with assigned members, so a dead cell vanishes from the codebook
    * and a naive collect would produce a LUT shorter than m·ks with
    * surviving cells keeping their original ids — misaligning every
    * entry after the hole. The grid join below materializes all ks
    * slots per subspace ([[DeadCellSentinel]] where dead); the kernel
    * additionally asserts numElements == m·ks. `ks` is the codebook
    * width the index was TRAINED with (a property of the model, which
    * is why it's a parameter and not inferred from surviving cells).
    *
    * `sentinel` is metric-directional: for MIN-distance ranking (L2
    * ADC) the default +2⁵⁰ makes a foreign code DOMINATE the sum so it
    * can never silently win; a MAX-score ranking (inner-product ADC)
    * must pass −[[DeadCellSentinel]] instead — there the failure mode
    * is a dead slot WINNING, so the sentinel has to bury it. */
  def adcLutFlat(querySubs: DataFrame, idCol: String,
      codebooks: DataFrame, ks: Int,
      sentinel: Long = DeadCellSentinel): DataFrame =
    flatten(adcLut(querySubs, idCol, codebooks), idCol, ks, sentinel)

  /** [[adcLutFlat]]'s densify+pack tail over an ALREADY-BUILT long-form
    * LUT (idCol, m, code, dq_e6) — shared by the L2 and inner-product
    * LUT builders so the slot alignment discipline has one spelling. */
  def flatten(base: DataFrame, idCol: String, ks: Int,
      sentinel: Long): DataFrame =
    base.select(col(idCol), col("m")).distinct()
      .withColumn("code", explode(expr(s"sequence(0, ${ks - 1})")))
      .join(base, Seq(idCol, "m", "code"), "left")
      .select(col(idCol), col("m"), col("code"),
        coalesce(col("dq_e6"), lit(sentinel)).as("dq_e6"))
      .groupBy(idCol)
      .agg(expr(
        "transform(array_sort(collect_list(struct(m, code, dq_e6))), x -> x.dq_e6)")
        .as("lut"))

  /** INNER-PRODUCT ADC lookup table (the METRIC_INNER_PRODUCT face of
    * [[adcLut]], for maximum-inner-product search): (idCol, m, code,
    * dq_e6) where dq_e6 = floor(dot(sub, cw)·1e6) — the e6-floored
    * exact sequential-fold dot of the query's m-th subvector to each
    * codeword. The candidate's ADC estimate Σ_m dq_e6 approximates
    * dot(q, recon(c)) and ranks DESC (ties cand_id asc): same
    * order-insensitive BIGINT-sum discipline as the distance LUT, so
    * the oracle replays bit-exact. */
  def ipLut(querySubs: DataFrame, idCol: String, codebooks: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(querySubs.sparkSession)
    querySubs.join(broadcast(codebooks), Seq("m"))
      .select(col(idCol), col("m"), col("cell").as("code"),
        expr("CAST(floor(graft_dot_d(sub, cw) * 1000000.0D) AS BIGINT)").as("dq_e6"))
  }

  /** Per-query FLAT inner-product LUT — [[ipLut]] densified and packed
    * for the `graft_adc_sum` kernel scan. Dead slots carry
    * −[[DeadCellSentinel]]: under DESC ranking a foreign code must
    * LOSE unmissably, the mirror of the distance LUT's +2⁵⁰. */
  def ipLutFlat(querySubs: DataFrame, idCol: String,
      codebooks: DataFrame, ks: Int): DataFrame =
    flatten(ipLut(querySubs, idCol, codebooks), idCol, ks, -DeadCellSentinel)
}
