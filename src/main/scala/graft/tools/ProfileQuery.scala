package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Stage-level profile of one or more registered queries (optimization
  * rounds' measurement harness — guide §1: decide whether time goes to
  * shuffle, compute or scheduling BEFORE changing anything).
  *
  * For each named query: one warm-up materialization (memo caches
  * populated, codegen warmed), then `clearMemo` + one PROFILED cold
  * materialization through the noop sink with a listener recording
  * per-stage wall, task count, shuffle read/write bytes, input bytes
  * and spill. Stages are printed in start order with the originating
  * job id so the per-round job structure (probe jobs, checkpoint
  * materializations) is visible too.
  *
  * Usage: sbt "runMain graft.tools.ProfileQuery q1 q2 ..."
  * (env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as for Bench).
  */
object ProfileQuery {
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
    spark.sparkContext.setLogLevel("ERROR")

    final case class StageRow(jobId: Int, stageId: Int, name: String,
      wallMs: Long, tasks: Int, inputMB: Double, srMB: Double, swMB: Double,
      spillMB: Double, cpuMs: Long)
    val rows = mutable.ArrayBuffer.empty[StageRow]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        rows.synchronized {
          rows += StageRow(stageToJob.getOrElse(si.stageId, -1), si.stageId,
            si.name.takeWhile(_ != '\n').take(90),
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.numTasks,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6,
            m.executorCpuTime / 1000000L)
        }
      }
    }

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    args.foreach { name =>
      spark.sparkContext.setJobDescription(s"warmup: $name")
      val w = materialize(name) // warm-up: memo/codegen
      graft.queries.TextDedupQueries.clearMemo(spark)
      graft.queries.SimilarityStreamQueries.clearMemo(spark)
      rows.clear(); stageToJob.clear()
      spark.sparkContext.addSparkListener(listener)
      spark.sparkContext.setJobDescription(s"profile: $name")
      val t = materialize(name)
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // let trailing stage events drain
      println(f"##### $name cold=$t%.3fs (warm=$w%.3fs) #####")
      println(f"${"job"}%4s ${"stage"}%5s ${"wallMs"}%7s ${"tasks"}%5s " +
        f"${"inMB"}%8s ${"srMB"}%8s ${"swMB"}%8s ${"spill"}%6s ${"cpuMs"}%7s  name")
      rows.sortBy(_.stageId).foreach { r =>
        println(f"${r.jobId}%4d ${r.stageId}%5d ${r.wallMs}%7d ${r.tasks}%5d " +
          f"${r.inputMB}%8.1f ${r.srMB}%8.2f ${r.swMB}%8.2f ${r.spillMB}%6.1f " +
          f"${r.cpuMs}%7d  ${r.name}")
      }
      val totWall = rows.map(_.wallMs).sum
      println(f"[profile] $name stages=${rows.size} jobs=${rows.map(_.jobId).distinct.size} " +
        f"stageWallSum=${totWall / 1000.0}%.3fs queryWall=$t%.3fs\n")
    }
    spark.stop()
  }
}
