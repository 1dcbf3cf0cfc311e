package graft

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Benchmark main (driver contract): runs the headline queries
  * (QueryDef.bench) on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is fully materialized through the `noop` sink — unlike
  * `count()`, this computes every output column, so Catalyst can't
  * prune the work away. One warm-up pass of the flagship query
  * amortizes first-job costs (codegen, classloading) out of the
  * per-query numbers, mirroring a warmed cluster.
  *
  * Besides wall-clock, each query reports process-CPU seconds and GC
  * seconds (local mode: executors share the JVM, so process CPU covers
  * the whole engine). A contended or GC-thrashed environment is then
  * visible in the artifact itself: wall ≫ cpu/32 means the box was
  * busy; gc ≈ wall means memory pressure — not engine regressions.
  */
object Bench {
  private def cpuNanos(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }

  private def gcMillis(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Timing(wall: Double, cpu: Double, gc: Double)

    def materialize(name: String): Timing = {
      val t0 = System.nanoTime(); val c0 = cpuNanos(); val g0 = gcMillis()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return Timing(-1.0, -1.0, -1.0)
      }
      Timing((System.nanoTime() - t0) / 1e9, (cpuNanos() - c0) / 1e9,
        (gcMillis() - g0) / 1e3)
    }

    materialize("q1_pricing_summary") // warm-up

    val results = SparkEntry.benchNames.map(n => n -> materialize(n))
    def jmap(f: Timing => Double): String = results
      .map { case (k, t) => "\"" + k + "\":" + f"${f(t)}%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2.wall).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${jmap(_.wall)},"cpu_sec":${jmap(_.cpu)},"gc_sec":${jmap(_.gc)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
