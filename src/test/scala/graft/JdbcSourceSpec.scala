package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.JdbcSource

/** A1/A2 JDBC source mode against an embedded Derby database — the
  * local stand-in for the reference's MySQL scans. Verifies not just
  * values but PLAN evidence: the filter must reach the remote scan as
  * PushedFilters, and the partitioned read must produce the requested
  * number of range-bounded partitions. */
class JdbcSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val url: String = {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    val u = s"jdbc:derby:$dbDir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE patient (PatientId BIGINT, Site VARCHAR(16), Historical VARCHAR(4))")
    val ins = conn.prepareStatement("INSERT INTO patient VALUES (?, ?, ?)")
    (1 to 100).foreach { i =>
      ins.setLong(1, i.toLong)
      ins.setString(2, if (i % 2 == 0) "uw" else "sea")
      ins.setString(3, if (i % 10 == 0) "Yes" else null)
      ins.addBatch()
    }
    ins.executeBatch()
    st.close(); conn.close()
    u
  }

  test("JDBC scan pushes filter predicates into the remote query") {
    val df = JdbcSource.table(spark, url, "patient")
      .filter(col("Site") === "uw" && col("PatientId") > 10L)
    assert(df.count() === 45)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("SITE"), plan) // predicate reached the JDBC scan
  }

  test("JDBC partitioned scan splits into range-bounded parallel cursors") {
    val df = JdbcSource.partitionedTable(spark, url, "patient",
      "PatientId", lower = 1L, upper = 100L, numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 100)
    // C1 — the null-tolerant historical filter works through JDBC too
    val live = df.filter(coalesce(col("Historical") =!= "Yes", lit(true)))
    assert(live.count() === 90)
  }
}
