package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the bench's dedup sequence step by step to verify the shared
  * band-index cache is actually hit (run: sbt "runMain graft.tools.ProfileLsh"). */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def cpu(): Long = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); val c0 = cpu()
      f
      println(f"PROF $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  cpu ${(cpu() - c0) / 1e9}%8.2f s")
    }
    def noop(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, d).write.format("noop").mode("overwrite").save()
    time("warmup q1") { noop("q1_pricing_summary") }
    graft.SparkEntry.benchNames.foreach(n => time(n) { noop(n) })
    spark.stop()
  }
}
