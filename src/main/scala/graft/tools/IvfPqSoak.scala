package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale soak for the IVF×PQ standing store
  * ([[graft.streaming.VectorStreams.ivfPqIngest]]): models trained on
  * the BASE corpus sample and pinned, standing index = 96 000 vectors
  * (48 shifted replicas of sf0.1 `embeddings`), today's crawl = one
  * 2 000-vector slice. Measures the crawl fold (assign + encode +
  * append, against the pinned models) vs the from-scratch
  * encode+search rebuild it avoids, asserts append-only layout and
  * EXACT serve parity (pinned-store ADC == one-shot IVF-ADC over the
  * union). Prints one JSON evidence line; recorded in BASELINE.md. */
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
    val (k, nprobe, nAssign, pqM, pqSub) = (3, 4, 2, 8, 8)

    val base = graft.sources.Tables(spark, "/root/testdata/sf0.1", "embeddings")
      .select("vec_id", "embedding").localCheckpoint(true)
    val nBase = base.count()
    def replicas(from: Int, until: Int) =
      spark.range(from, until).crossJoin(base)
        .select((col("vec_id") + col("id") * 1000000L).as("vec_id"), col("embedding"))
    val standing = replicas(0, 48).localCheckpoint(true)
    val crawl = replicas(48, 49).localCheckpoint(true)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // models train ONCE on the base sample — the pinned-quantizer
    // production shape (the store folds never retrain)
    val (cent, trainIvfSec) = timed {
      graft.operators.Knn.ivfTrain(base, "vec_id", "embedding", 16, 3)
        .localCheckpoint(true)
    }
    val (books, trainPqSec) = timed {
      graft.operators.Pq.train(
        graft.operators.Pq.subviews(base, "vec_id", "embedding", pqM, pqSub),
        "vec_id", 16, 2).localCheckpoint(true)
    }

    val tbl = java.nio.file.Files.createTempDirectory("graft_ivfpqsoak").toString
    val (_, standSec) = timed {
      graft.streaming.VectorStreams.ivfPqFoldBatch(
        standing, tbl, 0L, cent, books, nAssign, pqM, pqSub)
    }
    val (_, foldSec) = timed {
      graft.streaming.VectorStreams.ivfPqFoldBatch(
        crawl, tbl, 1L, cent, books, nAssign, pqM, pqSub)
    }
    def parts(t: String) = new java.io.File(s"$tbl/$t").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(parts("posts") == Seq("batch=0", "batch=1"), parts("posts"))
    assert(parts("codes") == Seq("batch=0", "batch=1"), parts("codes"))

    // serve parity + the rebuild cost the fold avoids: one-shot
    // assign+encode+ADC over the 98k-vector union
    val union = standing.unionByName(crawl).localCheckpoint(true)
    val probes = union.filter(col("vec_id") < 32).localCheckpoint(true)
    val (expected, rebuildSec) = timed {
      val ranked = graft.operators.Knn.ivfRank(union, cent, "vec_id", "embedding")
        .localCheckpoint(true)
      val pr = ranked.filter(col("vec_id") < 32 && col("rn") <= nprobe)
        .select(col("vec_id").as("query_id"), col("cell"))
      val posts = ranked.filter(col("rn") <= nAssign)
        .select(col("vec_id").as("cand_id"), col("cell"))
      val cand = pr.join(posts, Seq("cell"))
        .filter(col("query_id") =!= col("cand_id"))
        .select("query_id", "cand_id").distinct()
      val subs = graft.operators.Pq.subviews(union, "vec_id", "embedding", pqM, pqSub)
        .localCheckpoint(true)
      val codes = graft.operators.Pq.encode(subs, "vec_id", books)
        .select(col("vec_id").as("cand_id"), col("m"), col("code"))
      val lut = graft.operators.Pq.adcLut(
          subs.filter(col("vec_id") < 32), "vec_id", books)
        .withColumnRenamed("vec_id", "query_id")
      codes.join(cand, Seq("cand_id")).join(broadcast(lut), Seq("query_id", "m", "code"))
        .groupBy("query_id", "cand_id").agg(sum("dq_e6").as("adist_e6"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("query_id").orderBy(col("adist_e6"), col("cand_id"))))
        .filter(col("rnk") <= k)
        .select(col("query_id"), col("rnk").cast("long"), col("cand_id"), col("adist_e6"))
        .collect().map(_.toSeq).toSet
    }
    val (served, serveSec) = timed {
      graft.streaming.VectorStreams.ivfPqServeFromStore(
          spark, tbl, probes, k, nprobe)
        .select(col("query_id"), col("rnk").cast("long"), col("cand_id"), col("adist_e6"))
        .collect().map(_.toSeq).toSet
    }
    assert(served == expected, "pinned-store ADC serve != one-shot IVF-ADC")

    val nVecs = graft.operators.Lakehouse.readCurrent(spark, tbl, "stats")
      .head().getLong(0)
    println(s"""{"soak":"ivfpq_store_fold","n_base":$nBase,""" +
      s""""n_standing":${nBase * 48},"n_vecs":$nVecs,""" +
      s""""train_ivf_sec":${f"$trainIvfSec%.2f"},"train_pq_sec":${f"$trainPqSec%.2f"},""" +
      s""""standing_fold_sec":${f"$standSec%.2f"},"crawl_fold_sec":${f"$foldSec%.2f"},""" +
      s""""rebuild_search_sec":${f"$rebuildSec%.2f"},"serve_sec":${f"$serveSec%.2f"},""" +
      s""""ranking_exact":true,"append_only":true}""")
    spark.stop()
  }
}
