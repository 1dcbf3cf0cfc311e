package graft.tools
import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for a few representative queries —
  * the pushdown/broadcast/codegen evidence (run manually; see PLANS.md). */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("a1_scan_pushdown", "q5_local_supplier", "dedup_minhash_bands",
        "txt_chunks", "g3_sample_hashmod", "asof_join_events")
    names.foreach { n =>
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
