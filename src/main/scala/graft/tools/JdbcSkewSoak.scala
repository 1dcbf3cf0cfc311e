package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parallel-cursor skew soak for the JDBC source (round-11 verdict
  * #7): `cnics_jdbc_e2e_audit` proves the pipeline runs over a live
  * JDBC source; this pins how the source's RANGE-PARTITIONED cursors
  * behave when the underlying key distribution is skewed — the
  * one-patient-many-labs shape CnicsSkewSoak pins on the JOIN side,
  * now pinned at INGEST.
  *
  * The point being pinned, both directions:
  *
  *   - NEGATIVE control: `partitionColumn = PatientId` with a hot
  *     patient DOES serialize — range strides are value-space, not
  *     row-space, so every hot row lands in the one cursor whose
  *     stride covers the hot key. No Spark setting fixes this; it is
  *     a property of value-range partitioning. The soak asserts the
  *     hot cursor holds ≥90% of the table.
  *   - The DISCIPLINE: partition on a uniformly-distributed surrogate
  *     key (the lab table's own monotone LabSeq — every real CNICS
  *     table carries an AUTO_INCREMENT id) and the same table arrives
  *     balanced: the soak asserts max-cursor/mean-cursor ≤ 1.5. The
  *     PatientId skew is then the DOWNSTREAM join's problem, which
  *     AQE skew-split handles (CnicsSkewSoak).
  *
  * Runs against embedded Derby (the `cnics_jdbc_e2e_audit` wire), with
  * a real index on the partition column so each range cursor seeks
  * instead of scanning (the production-DB shape). Prints one JSON
  * evidence line; recorded in BASELINE.md. */
object JdbcSkewSoak {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nPatients = args.headOption.map(_.toInt).getOrElse(2000)
    val hotLabs = if (args.length > 1) args(1).toInt else 200000
    val coldEach = 10
    val nRows = hotLabs + coldEach * (nPatients - 1)
    val nCursors = 8

    val dbDir = java.nio.file.Files.createTempDirectory("graft_jdbcskew").toString
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val loadT0 = System.nanoTime()
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE lab ("LabSeq" BIGINT, "PatientId" BIGINT,
        "TestName" VARCHAR(16), "Result" VARCHAR(16))""")
      st.execute("""CREATE INDEX lab_seq ON lab ("LabSeq")""")
      st.execute("""CREATE INDEX lab_pat ON lab ("PatientId")""")
      st.close()
      conn.setAutoCommit(false)
      val ins = conn.prepareStatement("INSERT INTO lab VALUES (?, ?, ?, ?)")
      var seq = 0L
      // hot patient 1 first, then the cold tail — physically clustered,
      // the worst case for value-range cursors on PatientId
      def row(pid: Long): Unit = {
        ins.setLong(1, seq); ins.setLong(2, pid)
        ins.setString(3, "CD4"); ins.setString(4, (seq % 1500).toString)
        ins.addBatch(); seq += 1
        if (seq % 5000 == 0) { ins.executeBatch(); conn.commit() }
      }
      (0 until hotLabs).foreach(_ => row(1L))
      (2 to nPatients).foreach(p => (0 until coldEach).foreach(_ => row(p.toLong)))
      ins.executeBatch(); conn.commit()
      ins.close()
    } finally conn.close()
    val wLoad = (System.nanoTime() - loadT0) / 1e9

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // rows per JDBC cursor (one Spark input partition per range stride)
    def cursorCounts(partCol: String, lower: Long, upper: Long): Seq[Long] =
      graft.sources.JdbcSource.partitionedTable(spark, url, "lab",
          partCol, lower, upper, nCursors)
        .groupBy(spark_partition_id().as("cursor"))
        .agg(count(lit(1)).as("n"))
        .collect().map(_.getLong(1)).toSeq

    // the discipline: uniform surrogate key → balanced cursors
    val (bySeq, wSeq) = timed(cursorCounts("\"LabSeq\"", 0L, nRows.toLong))
    // the negative control: hot-value key → one cursor drags
    val (byPat, wPat) = timed(cursorCounts("\"PatientId\"", 1L, nPatients.toLong))

    val seqMax = bySeq.max
    val seqMean = bySeq.sum.toDouble / nCursors
    val patMax = byPat.max
    val total = bySeq.sum
    assert(total == nRows && byPat.sum == nRows, s"row loss: $total / ${byPat.sum} vs $nRows")
    val balanced = seqMax <= 1.5 * seqMean
    val serialized = patMax >= 0.9 * nRows

    println(s"""{"soak":"jdbc_skew_cursors","n_rows":$nRows,"hot_labs":$hotLabs,"n_cursors":$nCursors,"wall_load_sec":${f"$wLoad%.1f"},"surrogate_key_cursor_max":$seqMax,"surrogate_key_cursor_mean":${f"$seqMean%.0f"},"surrogate_balanced":$balanced,"hot_key_cursor_max":$patMax,"hot_key_serialized":$serialized,"wall_surrogate_sec":${f"$wSeq%.1f"},"wall_hotkey_sec":${f"$wPat%.1f"}}""")
    assert(balanced, s"surrogate-key cursors unbalanced: $bySeq")
    assert(serialized, s"hot-key cursor unexpectedly balanced (negative control): $byPat")
    spark.stop()
  }
}
