package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for [[graft.streaming.VectorStreams.vectorIndexIngest]]:
  * the dense twin of LexicalSoak. Standing index = 96 000 vectors (48
  * shifted replicas of sf0.1 `embeddings`), today's batch = one 2 000-
  * vector slice. Measures the crawl fold against a full in-session
  * index rebuild + search, asserts append-only I/O (the fold wrote
  * only `batch=1` partitions) and serving exactness over a planted
  * probe set (searchVectorStore == lshTopKMultiTable over the union).
  * Prints one JSON evidence line; recorded in BASELINE.md.
  */
object VectorStoreSoak {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val (dim, tp, nt) = (64, 7, 16)

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
    val rows = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq

    val tbl = java.nio.file.Files.createTempDirectory("graft_vecsoak").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.VectorStreams.vectorIndexIngest(
      mem.toDF().toDF("vec_id", "embedding"), tbl, dim, tp, nt)
    val (_, standSec) = timed {
      mem.addData(rows(standing): _*); q.processAllAvailable()
    }
    val (_, foldSec) = timed {
      mem.addData(rows(crawl): _*); q.processAllAvailable()
    }
    q.stop()

    def parts(t: String) = new java.io.File(s"$tbl/$t").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(parts("buckets") == Seq("batch=0", "batch=1"), parts("buckets"))
    assert(parts("vectors") == Seq("batch=0", "batch=1"), parts("vectors"))

    // serving exactness over 32 probes vs the in-session index on the
    // union corpus (and the rebuild cost it avoids)
    val union = standing.unionByName(crawl).localCheckpoint(true)
    val probes = union.filter(col("vec_id") < 32)
    val (expected, rebuildSec) = timed {
      graft.operators.Knn.lshTopKMultiTable(
          graft.operators.Knn.withLshTables(union, "embedding", dim, tp, nt),
          "vec_id", "embedding", col("vec_id") < 32, 3)
        .select(col("query_id"), col("rnk").cast("long"), col("cand_id"), col("cosine"))
        .collect().map(_.toSeq).toSet
    }
    val (served, serveSec) = timed {
      graft.streaming.VectorStreams.searchVectorStore(
          spark, tbl, probes, dim, tp, nt, 3)
        .select(col("query_id"), col("rnk"), col("cand_id"), col("cosine"))
        .collect().map(_.toSeq).toSet
    }
    assert(served == expected, "served ranking != in-session index ranking")

    val nVecs = graft.operators.Lakehouse.readCurrent(spark, tbl, "stats")
      .head().getLong(0)
    println(s"""{"soak":"vector_index_fold","n_base":$nBase,""" +
      s""""n_standing":${nBase * 48},"n_vecs":$nVecs,""" +
      s""""standing_fold_sec":${f"$standSec%.2f"},"crawl_fold_sec":${f"$foldSec%.2f"},""" +
      s""""rebuild_search_sec":${f"$rebuildSec%.2f"},"serve_sec":${f"$serveSec%.2f"},""" +
      s""""ranking_exact":true,"append_only":true}""")
    spark.stop()
  }
}
