package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) — the THIRD vector-compression family
  * beside sign-LSH (hash) and PQ (codebook): each dimension is
  * affinely mapped to an unsigned 8-bit code against per-dimension
  * [min, max] bounds trained on the corpus. 4× smaller than float32
  * with no codebook training, the standard first rung of the FAISS
  * compression ladder (SQ8 → PQ → IVF×PQ).
  *
  * Search is asymmetric (ADC): the full-precision query builds a
  * per-(dim, code) lookup table of exact squared distances to every
  * RECONSTRUCTED code value (dim × 256 entries per query — the SQ
  * analogue of the PQ LUT), and candidates are scored by summing
  * LUT entries keyed by their stored codes — the scan reads ONLY the
  * 1-byte codes. Per-entry distances floor-quantize to integer e6 so
  * the per-candidate sum is an order-insensitive BIGINT sum, exactly
  * replayable in any engine (the [[Pq]] discipline).
  *
  * Determinism: bounds are exact min/max of float→double casts; the
  * encode expression `floor((v - mn) / (mx - mn) * 255 + 0.5)` and the
  * reconstruction `mn + code / 255 * (mx - mn)` are fixed single-op
  * sequences spelled identically in the DuckDB oracles, so every
  * double is bit-identical cross-engine. A constant dimension
  * (mx == mn) encodes to 0 and reconstructs to mn.
  *
  * Clamping (ADVICE r12, FAISS's SQ discipline): encode saturates to
  * [0, 255] BEFORE the int cast. The standing-store contract makes
  * out-of-range components the expected case — bounds train on the
  * first fold and stay pinned, so later batches routinely carry values
  * outside [mn, mx]; unclamped they'd produce codes < 0 / > 255, which
  * the packed [[graft.functions.Sq8AdcSum]] kernel would use as raw
  * array indices (and the exploded join would silently DROP, losing
  * the dimension's distance term). The clamp happens on the double
  * (pre-cast) so a wildly out-of-range value can't overflow the ANSI
  * int cast either, and is spelled identically in the DuckDB CTEs.
  *
  * Reference context: no vector surface in the reference; part of the
  * SURVEY §7.5 similarity-search extension.
  */
object Sq {

  /** Per-dimension quantizer bounds over the corpus: (dim, mn, mx) —
    * one narrow posexplode + a map-side-combined min/max aggregate
    * (dim rows out; at 100 TB this is the cheapest trainable
    * quantizer there is). `dim` is 0-based. */
  def train(vecs: DataFrame, embCol: String): DataFrame =
    Dedup.spread(vecs)
      .select(posexplode(expr(s"transform($embCol, v -> CAST(v AS DOUBLE))"))
        .as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(min("v").as("mn"), max("v").as("mx"))

  /** SQ8 codes: (id, dim, code ∈ 0..255) — the stored index, 1 byte
    * of information per (vector, dimension). Encode is a narrow
    * projection against the broadcast dim-row bounds. */
  def encode(vecs: DataFrame, idCol: String, embCol: String,
      bounds: DataFrame): DataFrame =
    Dedup.spread(vecs)
      .select(col(idCol),
        posexplode(expr(s"transform($embCol, v -> CAST(v AS DOUBLE))"))
          .as(Seq("dim", "v")))
      .join(broadcast(bounds), Seq("dim"))
      .select(col(idCol), col("dim"),
        when(col("mx") === col("mn"), lit(0))
          .otherwise(expr(
            "CAST(least(greatest(floor((v - mn) / (mx - mn) * 255.0D + 0.5D), 0.0D), 255.0D) AS INT)"))
          .as("code"))

  /** Bounds as ONE broadcastable row (mn_arr, mx_arr indexed by dim) —
    * the form the packed encode/scan kernels consume. */
  def boundsRow(bounds: DataFrame): DataFrame =
    bounds.groupBy()
      .agg(expr("transform(array_sort(collect_list(struct(dim, mn))), x -> x.mn)")
          .as("mn_arr"),
        expr("transform(array_sort(collect_list(struct(dim, mx))), x -> x.mx)")
          .as("mx_arr"))

  /** PACKED SQ8 codes: (id, codes array<int>) — one row per vector,
    * the 100 TB index layout (the long (id, dim, code) form of
    * [[encode]] is the oracle-replayable view; this is what a scan
    * should actually read: dim bytes of information per vector, no
    * ×dim row blow-up). Same arithmetic per component as [[encode]],
    * so unpacking reproduces it exactly. */
  def encodePacked(vecs: DataFrame, idCol: String, embCol: String,
      bounds: DataFrame): DataFrame =
    Dedup.spread(vecs)
      .crossJoin(broadcast(boundsRow(bounds)))
      .select(col(idCol), expr(
        s"""transform($embCol, (v, i) ->
           |  CASE WHEN mx_arr[i] = mn_arr[i] THEN 0
           |       ELSE CAST(least(greatest(floor((CAST(v AS DOUBLE) - mn_arr[i])
           |                 / (mx_arr[i] - mn_arr[i]) * 255.0D + 0.5D), 0.0D), 255.0D) AS INT)
           |  END)""".stripMargin).as("codes"))

  /** Per-query FLAT ADC LUT: (query_id, lut array<bigint>) with entry
    * d·256 + code = [[adcLut]]'s dq_e6 — the broadcast side of the
    * packed scan ([[graft.functions.Sq8AdcSum]] indexes it directly).
    * dim×256 longs ≈ 128 KB per query: probe-batch bounded. */
  def adcLutPacked(queries: DataFrame, idCol: String, embCol: String,
      bounds: DataFrame): DataFrame =
    adcLut(queries, idCol, embCol, bounds)
      .groupBy("query_id")
      .agg(expr(
        "transform(array_sort(collect_list(struct(dim, code, dq_e6))), x -> x.dq_e6)")
        .as("lut"))

  /** ADC lookup table for a query batch: (query_id, dim, code,
    * dq_e6) — floor-e6-quantized exact squared distance from each
    * query component to each of the 256 reconstructed code values of
    * that dimension. |Q| × dim × 256 rows: bounded by the probe
    * batch, broadcast against the code scan. */
  def adcLut(queries: DataFrame, idCol: String, embCol: String,
      bounds: DataFrame): DataFrame =
    queries
      .select(col(idCol).as("query_id"),
        posexplode(expr(s"transform($embCol, v -> CAST(v AS DOUBLE))"))
          .as(Seq("dim", "v")))
      .join(broadcast(bounds), Seq("dim"))
      .select(col("query_id"), col("dim"),
        explode(expr("sequence(0, 255)")).as("code"),
        col("v"), col("mn"), col("mx"))
      .withColumn("recon",
        when(col("mx") === col("mn"), col("mn"))
          .otherwise(expr("mn + code / 255.0D * (mx - mn)")))
      .select(col("query_id"), col("dim"), col("code"),
        expr("CAST(floor((v - recon) * (v - recon) * 1000000.0D) AS BIGINT)")
          .as("dq_e6"))
}
