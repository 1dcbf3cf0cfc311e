package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for the training-data pipeline surface
  * (SURVEY.md §7.5): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design: signature math (shingle hashes, MinHash, SimHash) is
  * NARROW — codegen'd per-row Catalyst expressions with no shuffle;
  * the only shuffles are the fingerprint groupBy and the band-bucket
  * self-join, both key-partitioned. Nothing is quadratic in corpus
  * size: near-dup candidate generation goes through LSH band buckets
  * with a hot-bucket cap, and only bucket-local pairs are scored. No
  * black-box UDFs anywhere; every formula is mirrored bit-for-bit in
  * the DuckDB oracles.
  */
object Dedup {

  // MinHash parameters: 32 hashes in 8 bands of 4 rows. Single source
  // of truth is the codegen'd expressions (MinHashSig / BandHashes).
  val NumHashes: Int = graft.functions.MinHashSig.NumHashes
  val Bands: Int = graft.functions.BandHashes.Bands
  val RowsPerBand: Int = graft.functions.BandHashes.RowsPerBand
  val MinhashP: Long = graft.functions.MinHashSig.P
  val BandP: Long = graft.functions.BandHashes.BandP

  /** Exact duplicate groups: hash-groupBy on the content fingerprint.
    * One shuffle on md5(text); map-side partial agg applies. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** Spread compute-heavy narrow stages across the session's shuffle
    * parallelism: a single small parquet file arrives as ONE partition,
    * serializing signature math onto one core (observed at sf0.1). At
    * 100 TB inputs are many-filed and this is a no-op in spirit; the
    * round-robin shuffle of the raw rows is cheap relative to the
    * per-row expression work it parallelizes. */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // df.rdd.getNumPartitions would force full RDD lineage conversion on
    // every query build; the input-file count is analysis-only and a good
    // proxy (a many-filed scan at 100 TB already arrives spread out).
    val files = try df.inputFiles.length catch { case _: Throwable => 0 }
    if (files < math.min(target, 8)) df.repartition(target) else df
  }

  /** Stage computed columns BELOW a repartition exchange.
    *
    * Catalyst's project collapsing rewrites `withColumn` staging into
    * inline expression duplication — references inside higher-order-
    * function lambdas are re-evaluated per element, which turned the
    * staged token array back into O(positions) re-splits of the text
    * (measured 115 s at sf0.1). A Repartition node is a collapse
    * barrier, so the staged columns are materialized exactly once into
    * the shuffle — which these operators need for parallelism anyway. */
  private[graft] def stageThenSpread(df: DataFrame, cols: (String, org.apache.spark.sql.Column)*): DataFrame = {
    val staged = cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    staged.repartition(target)
  }

  /** Stage per-doc distinct token-shingle hashes (narrow projection).
    * Token shingles, not char shingles: on small-vocab text, char
    * 3-grams collide so heavily that LSH candidate generation degrades
    * toward the cross product (measured on the fixture corpus). */
  def withShingleHashes(df: DataFrame, textCol: String, k: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    stageThenSpread(df,
      "__toks" -> expr(TextFunctions.tokensSql(s"lower(${TextFunctions.cleanAsciiSql(textCol)})")))
      .withColumn("shingle_hashes", expr(s"graft_shingle_hashes(__toks, $k)"))
      .drop("__toks")
  }

  /** MinHash LSH index: (id, band, band_hash) rows.
    *
    * Entirely NARROW: the whole 32-minima signature is one codegen'd
    * pass per document ([[graft.functions.MinHashSig]]) and bands fold
    * from the signature array in the same projection — no explode of
    * per-shingle rows, no shuffle, no hash aggregate. (Round 1 used
    * explode → groupBy min-aggregates to dodge interpreted array
    * lambdas — measured 175 s as nested lambdas, ~2 s as aggregates;
    * the native expression removes the remaining shuffle too.) */
  def minhashBands(df: DataFrame, textCol: String, idCol: String, k: Int = 3): DataFrame =
    minhashBandsFromHashes(withShingleHashes(df, textCol, k), idCol)

  /** Same as [[minhashBands]] over an already-staged `shingle_hashes`
    * frame, so one (possibly persisted / stored) hash frame can feed
    * both the band index and a downstream Jaccard rescore without
    * re-tokenizing the corpus per stage. */
  def minhashBandsFromHashes(hashed: DataFrame, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(hashed.sparkSession)
    hashed
      .filter(size(col("shingle_hashes")) > 0)
      .select(col(idCol),
        posexplode(expr("graft_band_hashes(shingle_hashes)")).as(Seq("band", "band_hash")))
  }

  /** Buckets larger than this are dropped from candidate generation: a
    * degenerate bucket (boilerplate text, zero vectors) turns a
    * bucket-local self-join quadratic — cap² rows instead of n² at
    * 100 TB. Oracles mirror the cap with a window-count QUALIFY. */
  val MaxBucket = 1000

  /** Drop rows of buckets whose row count exceeds `maxBucket`. The
    * histogram-above-cap is metadata-sized by construction
    * (≤ totalRows / cap buckets), so it rides a broadcast hash
    * anti-join — the big side is never shuffled by the guard. LAZY
    * since r18: the old implementation collect()ed the hot set to the
    * driver (for a log line and an empty-set fast path), paying one
    * full extra action + driver round-trip per call site per cold
    * pass; the broadcast anti-join against a lazily-aggregated hot
    * frame is the identical result with the guard fused into the
    * consumer's own job (an empty broadcast side costs nothing). */
  def dropHotBuckets(rows: DataFrame, keyCols: Seq[String], maxBucket: Int,
      what: String): DataFrame = {
    val hot = rows.groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > maxBucket)
      .select(keyCols.map(col): _*)
    rows.join(broadcast(hot), keyCols, "left_anti")
  }

  /** LSH candidate pairs: equal (band, band_hash) ⇒ candidate. The join
    * shuffles on the bucket key only — no cross product — and buckets
    * over `maxBucket` are dropped (see [[dropHotBuckets]]).
    *
    * The band index is computed once per side reference; callers that
    * reuse it across stages (pairs + rescore, or repeated queries)
    * should persist it or write it to storage first — the query layer
    * memoizes one persisted index per (session, dataset). */
  def lshCandidatePairs(bands: DataFrame, idCol: String,
      maxBucket: Int = MaxBucket): DataFrame = {
    val pruned = dropHotBuckets(bands, Seq("band", "band_hash"), maxBucket, "lshCandidatePairs")
    val a = pruned.select(col(idCol).as("id_a"), col("band"), col("band_hash"))
    val b = pruned.select(col(idCol).as("id_b"), col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** SimHash (32-bit): bit b set iff the majority of token hashes have
    * bit b set. One codegen'd pass per document (SimHashExpr) — a
    * narrow projection with no explode and no shuffle. */

  def withTokenHashes(df: DataFrame, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    stageThenSpread(df,
      "__toks" -> expr(TextFunctions.tokensSql(s"lower(${TextFunctions.cleanAsciiSql(textCol)})")))
      .withColumn("token_hashes", expr("graft_shingle_hashes(__toks, 1)"))
      .drop("__toks")
  }

  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    withTokenHashes(df, textCol)
      .select(col(idCol), expr("graft_simhash(token_hashes)").as("simhash"))

  /** n-gram Jaccard similarity for a pre-paired frame carrying shingle
    * arrays `sh_a`, `sh_b` (distinct char k-shingles). */
  // Both similarity ratios quantize through DECIMAL(18,12) before the
  // 6-digit round: k/n rationals can land EXACTLY on a .5 at the
  // rounding digit (e.g. 333/640), where Spark's shortest-string
  // HALF_UP and DuckDB's float-multiply round disagree — and these
  // values feed threshold FILTERS, so a one-ulp disagreement would
  // flip row membership, not just a printed digit.
  def jaccardCol: Column = expr(
    "CAST(round(CAST(CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) / " +
      "(size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b))) " +
      "AS DECIMAL(18,12)), 6) AS DOUBLE)")

  /** Containment C(A,B) = |A∩B| / |A| — the asymmetric twin of Jaccard:
    * high when A's shingles are (nearly) a subset of B's, so a short
    * document embedded verbatim in a longer one scores ~1.0 where
    * Jaccard stays low. The standard quote/boilerplate-inclusion signal. */
  def containmentCol: Column = expr(
    "CAST(round(CAST(CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) / size(sh_a) " +
      "AS DECIMAL(18,12)), 6) AS DOUBLE)")
}

/** Typed `Aggregator` surface (SURVEY.md §2-I): per-document MinHash
  * signature from exploded shingle hashes. The production path stays
  * the explode → groupBy with 32 codegen'd `min` aggregates
  * ([[Dedup.minhashBands]] — partial aggregation beats a typed
  * buffer's serialization in the hot path); this Aggregator is the
  * same math behind the typed API, kept signature-identical (parity
  * pinned by test) for callers that want `Dataset`-typed composition. */
object MinHashAgg extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Long]] {
  def zero: Array[Long] = Array.fill(Dedup.NumHashes)(Long.MaxValue)

  def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < buf.length) {
      val v = ((2L * i + 3L) * h + (7919L * i + 13L)) % Dedup.MinhashP
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
