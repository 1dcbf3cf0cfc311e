package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg (local iteration only): comma-separated query names.
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A query whose build/write throws must be LOUD: it gets a red row
    // in verify_errors.json and a final count assertion line, instead of
    // silently vanishing from the driver's CORRECTNESS compare (which is
    // keyed on the output dirs that exist).
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(500)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // Per-family runtime budget (round-12 verdict #8): the sweep's
    // wall-clock per query, rolled up per pack with its slowest 5, so a
    // registry addition that regresses sweep time is visible in the
    // ARTIFACT (not only in bench). Flat {"per_query":{...},
    // "families":{fam:{"total_sec":…,"n":…,"slowest":{name:sec,…}}}}.
    def fd(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val famJson = timings.toSeq
      .groupBy { case (n, _) => SparkEntry.families.getOrElse(n, "other") }
      .toSeq.sortBy(-_._2.map(_._2).sum)
      .map { case (fam, qs) =>
        val slowest = qs.sortBy(-_._2).take(5)
          .map { case (n, s) => s"${q(n)}: ${fd(s)}" }.mkString("{", ",", "}")
        s"${q(fam)}: {\"total_sec\": ${fd(qs.map(_._2).sum)}, " +
          s"\"n\": ${qs.size}, \"slowest\": $slowest}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_timings.json"),
      "{\"per_query\": " +
        timings.map { case (k, v) => s"${q(k)}: ${fd(v)}" }.mkString("{", ",", "}") +
        s""", "families": $famJson}""")
    val written = selected.keys.count(n => new java.io.File(s"$outDir/$n").isDirectory)
    System.err.println(s"[verify] registry ${selected.size} queries → $written outputs, " +
      s"${errors.size} FAILED" +
      (if (errors.nonEmpty) s": ${errors.keys.mkString(", ")}" else ""))
    spark.stop()
  }
}
