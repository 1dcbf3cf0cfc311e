package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the exact hamming near-dup join with adaptive
  * (radius+1)-band multi-index hashing.
  *
  * Corpus: 2 000 000 synthetic 64-bit fingerprints —
  *   - a seeded-random base (xxhash64 of the id: uniform bits);
  *   - 10 000 planted near-dup clusters of 3 (two perturbed copies of
  *     a base hash, ≤ 3 bits flipped each — every in-cluster pair is
  *     within radius 6, in-cluster pair count is exactly 30 000);
  *   - ONE degenerate fingerprint (the all-zero hash — "black
  *     thumbnail") repeated 50 000 times: its bucket goes hot in every
  *     band, so the cap must drop it, preventing C(50 000, 2) ≈
  *     1.25×10⁹ identical pairs from materializing.
  *
  * Checks are closed-form: at radius 3 with 4 bands of 16 bits the
  * expected random collision mass is ≪ 1 pair, so the result must be
  * EXACTLY the planted in-cluster pairs that are within radius 3
  * (computed independently from the plant parameters) — nothing from
  * the capped degenerate pile and nothing else. Prints one JSON
  * evidence line; recorded in BASELINE.md.
  */
object FingerprintSoak {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nBase = 2000000L
    val nClusters = 10000L
    val hotCopies = 50000L

    // base: uniform 64-bit hashes keyed by id
    val base = spark.range(nBase)
      .select(col("id"), xxhash64(col("id")).as("h"))
    // planted: ids >= 1e9 mark the two perturbed copies of cluster c's
    // center (base id = c). Flip up to 3 DISTINCT bit positions drawn
    // from disjoint xxhash streams — deterministic, replayable.
    def bit(seedCol: org.apache.spark.sql.Column) =
      call_function("shiftleft", lit(1L), pmod(seedCol, lit(64)).cast("int"))
    val planted = spark.range(nClusters)
      .select(col("id").as("c"), explode(array(lit(1), lit(2))).as("copy"))
      .select(
        (lit(1000000000L) + col("c") * 2 + col("copy")).as("id"),
        xxhash64(col("c"))
          .bitwiseXOR(bit(xxhash64(col("c"), col("copy"), lit(1))))
          .bitwiseXOR(bit(xxhash64(col("c"), col("copy"), lit(2))))
          .bitwiseXOR(bit(xxhash64(col("c"), col("copy"), lit(3)))).as("h"))
    // degenerate pile: the all-zero fingerprint, 50k copies
    val hot = spark.range(hotCopies)
      .select((lit(2000000000L) + col("id")).as("id"), lit(0L).as("h"))

    val all = base.unionByName(planted).unionByName(hot)
      .repartition(cpus.toInt).localCheckpoint(true)

    val t0 = System.nanoTime()
    val pairs = graft.operators.Fingerprint
      .hammingNearDupPairs(all, "id", "h", maxHamming = 3,
        what = "fingerprintSoak")
      .localCheckpoint(true)
    val nPairs = pairs.count()
    val sec = (System.nanoTime() - t0) / 1e9

    // independent expectation: per cluster, the center (if it survives
    // as a base id < nBase... it does: center id = c < nClusters) and
    // its two copies. Compute each copy's true hash in the driver via
    // the same xxhash64 streams replayed through Spark (one tiny job),
    // then brute-force the 3-element cluster.
    val truth = spark.range(nClusters)
      .select(col("id").as("c"), explode(array(lit(0), lit(1), lit(2))).as("copy"))
      .select(col("c"), col("copy"),
        when(col("copy") === 0, col("c"))
          .otherwise(lit(1000000000L) + col("c") * 2 + col("copy")).as("id"),
        when(col("copy") === 0, xxhash64(col("c")))
          .otherwise(xxhash64(col("c"))
            .bitwiseXOR(bit(xxhash64(col("c"), col("copy"), lit(1))))
            .bitwiseXOR(bit(xxhash64(col("c"), col("copy"), lit(2))))
            .bitwiseXOR(bit(xxhash64(col("c"), col("copy"), lit(3))))).as("h"))
    // The cap drops exactly the degenerate buckets: every slice of the
    // all-zero hot hash is 0, so buckets (pos, 0) hold 50k+ rows; no
    // OTHER bucket can get hot (2M uniform hashes over 65 536 16-bit
    // values ≈ 31/bucket — asserted below). A planted pair is therefore
    // findable iff some matching band has a NONZERO slice; the (rare,
    // deterministic) cluster whose sole pigeonhole band is a zero slice
    // is legitimately capped away and excluded from the expectation.
    def slice(h: org.apache.spark.sql.Column, i: Int) =
      shiftright(h, 16 * i).bitwiseAND(lit(65535L))
    val findable = (0 until 4).map { i =>
      (slice(col("a.h"), i) === slice(col("b.h"), i)) &&
        (slice(col("a.h"), i) =!= lit(0L))
    }.reduce(_ || _)
    val expected = truth.as("a").join(truth.as("b"),
        col("a.c") === col("b.c") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        expr("bit_count(a.h ^ b.h)").cast("int").as("hamming"),
        findable.as("findable"))
      .filter(col("hamming") <= 3)
      .localCheckpoint(true)
    val nExpected = expected.count()
    val nCappedAway = expected.filter(!col("findable")).count()
    val missing = expected.filter(col("findable")).select("id_a", "id_b")
      .except(pairs.select("id_a", "id_b")).count()
    val extra = pairs.select("id_a", "id_b")
      .except(expected.select("id_a", "id_b")).count()
    val hotPairs = pairs.filter(col("id_a") >= 2000000000L).count()
    val prevented = hotCopies * (hotCopies - 1) / 2
    // no organic bucket may approach the cap (proves the cap surgically
    // removed ONLY the degenerate pile)
    val maxOrganic = graft.operators.Fingerprint
      .bandsOf(all, "id", "h", 64, 4)
      .filter(col("band") =!= 0L)
      .groupBy("pos", "band").count()
      .agg(max("count")).as[Long].head()

    val ok = missing == 0 && extra == 0 && hotPairs == 0 && maxOrganic < 1000
    println(s"""{"soak":"fingerprint_hamming","n_hashes":${nBase + 2 * nClusters + hotCopies},""" +
      s""""n_clusters":$nClusters,"hot_copies":$hotCopies,""" +
      s""""pairs_found":$nPairs,"pairs_expected":$nExpected,""" +
      s""""capped_away":$nCappedAway,"missing":$missing,"extra":$extra,""" +
      s""""hot_pairs":$hotPairs,"hot_pairs_prevented":$prevented,""" +
      s""""max_organic_bucket":$maxOrganic,""" +
      s""""query_sec":${math.round(sec * 100) / 100.0},""" +
      s""""checks":"${if (ok) "all-exact" else "FAILED"}"}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
