package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch micro-bench: attribute the per-round cost of the PQ/IVF
  * Lloyd training loops (optimization round measurement aid). Times
  * each building block of one assignment round on the real fixture
  * corpus, comparing the row_number-window argmin against a
  * min(struct)-aggregate argmin. Not registered anywhere; run
  * manually. */
object MicroLloyd {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[micro] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val m = 8; val subDim = 8; val ks = 16

    val subs = graft.operators.Pq.subviews(emb, "vec_id", "embedding", m, subDim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("subviews persist count")(subs.count())
    time("subviews count again")(subs.count())

    val cent = subs.filter(col("vec_id") < ks)
      .select(col("m"), col("vec_id").as("cell"), col("sub").as("cw"))
      .localCheckpoint(true)

    // piece 1: join + kernel only
    val joined = subs.join(broadcast(cent), Seq("m"))
      .withColumn("dist", round(expr("graft_l2sq(sub, cw)"), 8))
    for (i <- 1 to 3)
      time(s"join+l2sq+round noop #$i")(
        joined.select("vec_id", "m", "dist", "cell")
          .write.format("noop").mode("overwrite").save())
    // piece 1b: kernel without round
    val joinedNoRound = subs.join(broadcast(cent), Seq("m"))
      .withColumn("dist", expr("graft_l2sq(sub, cw)"))
    for (i <- 1 to 2)
      time(s"join+l2sq NO round noop #$i")(
        joinedNoRound.select("vec_id", "m", "dist", "cell")
          .write.format("noop").mode("overwrite").save())

    // piece 2: window argmin (current shape)
    val winAssign = joined
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id", "m").orderBy(col("dist"), col("cell"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("qsub"), col("cell"))
    for (i <- 1 to 3)
      time(s"window argmin noop #$i")(
        winAssign.write.format("noop").mode("overwrite").save())

    // piece 3: aggregate argmin (candidate shape)
    val aggAssign = joined
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("dist"), col("cell"), col("qsub"))).as("mn"))
      .select(col("vec_id"), col("m"), col("mn.qsub").as("qsub"), col("mn.cell").as("cell"))
    for (i <- 1 to 3)
      time(s"agg argmin noop #$i")(
        aggAssign.write.format("noop").mode("overwrite").save())

    // piece 4: full round window vs agg (assign + update)
    def update(a: org.apache.spark.sql.DataFrame) =
      a.select(col("m"), col("cell"), posexplode(col("qsub")).as(Seq("i", "qv")))
        .groupBy("m", "cell", "i")
        .agg(sum("qv").as("sv"), count(lit(1)).as("n"))
        .groupBy("m", "cell")
        .agg(collect_list(struct(col("i"),
          ((col("sv").cast("double") / col("n").cast("double")) / 1048576.0d).as("w"))).as("ws"))
        .select(col("m"), col("cell"), expr("transform(array_sort(ws), x -> x.w)").as("cw"))
    for (i <- 1 to 2)
      time(s"full round window noop #$i")(
        update(winAssign).write.format("noop").mode("overwrite").save())
    for (i <- 1 to 2)
      time(s"full round agg noop #$i")(
        update(aggAssign).write.format("noop").mode("overwrite").save())

    // equality check: window vs agg assignment must agree exactly
    val diff = winAssign.select("vec_id", "m", "cell")
      .exceptAll(aggAssign.select("vec_id", "m", "cell")).count()
    println(s"[micro] window-vs-agg assignment diff rows = $diff")

    spark.stop()
  }
}
