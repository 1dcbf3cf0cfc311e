package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val docs = Tables(spark, d, "documents")
    time("scan") { docs.count() }
    val sh = Dedup.withShingleHashes(docs, "text")
    time("shingle_hashes") { sh.count() }
    val expl = sh.filter(size(col("shingle_hashes")) > 0)
      .select(col("doc_id"), explode(col("shingle_hashes")).as("h"))
    time("exploded") { expl.count() }
    val sigAggs = (0 until 32).map(i =>
      min(expr(s"((2*$i + 3) * h + (7919*$i + 13)) % 2147483647L")).as(s"sig_$i"))
    val sig = expl.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
    time("signatures") { sig.count() }
    val bands = Dedup.minhashBands(docs, "text", "doc_id")
    time("bands count") { bands.count() }
    time("bands noop") { bands.write.format("noop").mode("overwrite").save(); 0L }
    spark.stop()
  }
}

object ProfileMinhashV3 {
  import org.apache.spark.sql.expressions.Window
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val docs = Tables(spark, d, "documents")
    val toks = Dedup.stageThenSpread(docs,
      "__toks" -> expr(graft.functions.TextFunctions.tokensSql(
        s"lower(${graft.functions.TextFunctions.cleanAsciiSql("text")})")))
      .select(col("doc_id"), posexplode(col("__toks")).as(Seq("pos", "tok")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val sh = toks
      .withColumn("t1", lead("tok", 1).over(w))
      .withColumn("t2", lead("tok", 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), expr("graft_poly(concat(tok, ' ', t1, ' ', t2))").as("h"))
    time("v3 shingle hash rows") { sh.count() }
    val sigAggs = (0 until 32).map(i =>
      min(expr(s"((2*$i + 3) * h + (7919*$i + 13)) % 2147483647L")).as(s"sig_$i"))
    val sig = sh.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
    time("v3 signatures") { sig.count() }
    time("v3 signatures again") { sig.count() }
    spark.stop()
  }
}
