package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the PREFIX-PINNED MRL store layout (round 13): two
  * standing vector stores fold the same ~250×-sf0.1 corpus — one with
  * the Matryoshka prefix persisted as its own columns
  * (`vectorFoldBatch(prefixDim = 16)`), one without — and the SAME
  * `mrlServeFromStore(prefix = 16)` call serves both:
  *
  *   - the RAW store takes the fallback plan (scan the full embedding
  *     column, slice + norm per candidate per query, broadcast-join
  *     the survivors);
  *   - the PINNED store takes the I/O-pruned plan (cheap pass
  *     column-prunes to (vec_id, p_emb, p_nrm) — 16/64 of the vector
  *     bytes — exact rescore IN-pushes the probe-bounded survivor ids
  *     into the second scan).
  *
  * The raw serve is measured FIRST so shared first-job costs land on
  * the incumbent. Asserts the two rankings are row-identical (same
  * arithmetic, same heap ties). Prints one JSON evidence line;
  * recorded in BASELINE.md. */
object MrlStoreSoak {
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

    val nVecs = args.headOption.map(_.toLong).getOrElse(500000L)
    val (dim, tp, nt, prefixDim, nCand, k) = (64, 7, 16, 16, 16, 3)
    val vecs = SoakCorpus.frontLoaded(spark, nVecs)
    val probes = vecs.filter(col("vec_id") < 32).localCheckpoint(true)

    import SoakCorpus.timed
    def rank4(df: DataFrame): Set[(Long, Long, Double, Int)] = df
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rnk").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

    def fold(pd: Int): (String, Double) = {
      val tbl = java.nio.file.Files.createTempDirectory(s"graft_mrlsoak_p$pd").toString
      val (_, w) = timed {
        graft.streaming.VectorStreams.vectorFoldBatch(
          vecs.filter(pmod(col("vec_id"), lit(2)) === 0), tbl, 0L, dim, tp, nt,
          prefixDim = pd)
        graft.streaming.VectorStreams.vectorFoldBatch(
          vecs.filter(pmod(col("vec_id"), lit(2)) === 1), tbl, 1L, dim, tp, nt,
          prefixDim = pd)
      }
      (tbl, w)
    }
    val (rawStore, wFoldRaw) = fold(0)
    val (pinnedStore, wFoldPinned) = fold(prefixDim)

    // raw (fallback) serve first: warm-up lands on the incumbent
    val (raw, wRaw) = timed(rank4(graft.streaming.VectorStreams
      .mrlServeFromStore(spark, rawStore, probes, prefixDim, nCand, k)))
    val (pruned, wPruned) = timed(rank4(graft.streaming.VectorStreams
      .mrlServeFromStore(spark, pinnedStore, probes, prefixDim, nCand, k)))
    val equal = raw == pruned

    import SoakCorpus.dirBytes

    println(s"""{"soak":"mrl_pruned_store","n_vecs":$nVecs,"n_queries":32,"dim":$dim,"prefix_dim":$prefixDim,"n_cand":$nCand,"wall_fold_raw":${f"$wFoldRaw%.1f"},"wall_fold_pinned":${f"$wFoldPinned%.1f"},"wall_serve_raw":${f"$wRaw%.1f"},"wall_serve_pruned":${f"$wPruned%.1f"},"vectors_bytes_raw":${dirBytes(s"$rawStore/vectors")},"vectors_bytes_pinned":${dirBytes(s"$pinnedStore/vectors")},"plans_equal":$equal}""")
    assert(equal, "pruned and raw MRL store serves diverged at soak scale")
    spark.stop()
  }
}
