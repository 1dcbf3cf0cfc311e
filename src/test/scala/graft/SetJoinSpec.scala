package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The completeness guarantee of the prefix-filtered set-similarity
  * join (`dedup_setjoin_prefix`): prefix filtering is an OPTIMIZATION,
  * not an approximation — the result must equal the brute-force
  * all-pairs join exactly. This is the property that separates it from
  * MinHash/LSH (which trade recall for cost). */
class SetJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("prefix-filtered join equals the brute-force all-pairs set join") {
    val tf = graft.functions.TextFunctions
    graft.functions.GraftFunctions.register(spark)
    val tk = graft.sources.Tables(spark, dir, "documents")
      .withColumn("__cl", expr(s"lower(${tf.cleanAsciiSql("text")})"))
      .withColumn("__toks", expr(tf.tokensSql("__cl")))
      .select(col("doc_id"), explode(expr(tf.tokenShinglesSql("__toks", 3))).as("tok"))
      .localCheckpoint(true)
    val szq = tk.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // brute force: every co-shingled pair, exact intersection, threshold
    val brute = tk.select(col("doc_id").as("id_a"), col("tok"))
      .join(tk.select(col("doc_id").as("id_b"), col("tok")), Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(szq.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(szq.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
      .filter(expr("inter * 10 >= 7 * (na + nb - inter)"))
      .select("id_a", "id_b", "inter")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val pref = SparkEntry.queries("dedup_setjoin_prefix")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pref == brute,
      s"prefix join lost or invented pairs: only-brute=${brute.keySet -- pref.keySet} " +
        s"only-prefix=${pref.keySet -- brute.keySet}")
    assert(brute.nonEmpty, "fixture produced no qualifying pairs — property vacuous")
  }

  test("prefix index is strictly smaller than the full set index") {
    val tf = graft.functions.TextFunctions
    val tk = graft.sources.Tables(spark, dir, "documents")
      .withColumn("__cl", expr(s"lower(${tf.cleanAsciiSql("text")})"))
      .withColumn("__toks", expr(tf.tokensSql("__cl")))
      .select(col("doc_id"), explode(expr(tf.tokenShinglesSql("__toks", 3))).as("tok"))
    val full = tk.count()
    val dfq = tk.groupBy("tok").agg(count(lit(1)).as("df"))
    val szq = tk.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pfx = tk.join(dfq, "tok").join(szq, "doc_id")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("df"), col("tok"))))
      .filter(col("rk") <= col("n") - expr("(7 * n + 9) div 10") + 1)
      .count()
    assert(pfx < full / 2, s"prefix index $pfx not < half of full index $full")
  }
}
