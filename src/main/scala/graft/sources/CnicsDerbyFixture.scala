package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.CnicsFixtures
import graft.pipeline.CnicsInputs

/** The demo fixtures loaded through a REAL database wire: an embedded
  * Derby instance stands in for the reference's MySQL source
  * (`cnics_to_fhir.py:259-266` — every cohort and detail scan the
  * reference runs is a live SQL query). The five CNICS clinical tables
  * (patient, demographic, diagnosis, medication, lab) are created and
  * populated over JDBC and read back through [[JdbcSource]] with V2
  * pushdown enabled, so the `cnics_jdbc_e2e_audit` driver row exercises
  * cohort → assembly → merge → audit with A1 in JDBC mode end-to-end.
  * The PRO tables and the crosswalk stay in-memory: in the reference
  * they come from a DIFFERENT database and a CSV respectively, and
  * their source modes are covered by their own rows (A5/A6).
  *
  * DDL and rows are DERIVED from [[CnicsFixtures.demo]] (one source of
  * truth): column names are quoted to preserve exact case through
  * Derby's uppercase folding, and binary fixture columns (MySQL
  * VARBINARY parity) map to `VARCHAR FOR BIT DATA` so the pipeline's
  * binary→string casts run against a genuine binary wire type.
  */
object CnicsDerbyFixture {

  private def ddlType(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case org.apache.spark.sql.types.LongType => "BIGINT"
    case org.apache.spark.sql.types.BinaryType => "VARCHAR(64) FOR BIT DATA"
    case org.apache.spark.sql.types.DateType => "DATE"
    case org.apache.spark.sql.types.StringType => "VARCHAR(128)"
    case other => sys.error(s"no Derby mapping for fixture type $other")
  }

  /** Create `table` in the Derby instance at `url` from the frame's
    * schema and load its (driver-side, fixture-sized) rows. */
  private def load(url: String, table: String, df: DataFrame): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val cols = df.schema.fields
        .map(f => s""""${f.name}" ${ddlType(f.dataType)}""").mkString(", ")
      val st = conn.createStatement()
      st.execute(s"CREATE TABLE $table ($cols)")
      st.close()
      val ins = conn.prepareStatement(
        s"INSERT INTO $table VALUES (${df.schema.fields.map(_ => "?").mkString(", ")})")
      df.collect().foreach { row =>
        df.schema.fields.zipWithIndex.foreach { case (f, i) =>
          (f.dataType, row.get(i)) match {
            case (_, null) =>
              // Derby requires the column's REAL type on setNull
              val sqlType = f.dataType match {
                case org.apache.spark.sql.types.LongType => java.sql.Types.BIGINT
                case org.apache.spark.sql.types.BinaryType => java.sql.Types.VARBINARY
                case org.apache.spark.sql.types.DateType => java.sql.Types.DATE
                case _ => java.sql.Types.VARCHAR
              }
              ins.setNull(i + 1, sqlType)
            case (org.apache.spark.sql.types.BinaryType, v: Array[Byte]) =>
              ins.setBytes(i + 1, v)
            case (_, v) => ins.setObject(i + 1, v)
          }
        }
        ins.addBatch()
      }
      ins.executeBatch()
      ins.close()
    } finally conn.close()
  }

  /** A fresh Derby database holding the five clinical tables, read back
    * as JDBC-sourced [[CnicsInputs]]. */
  def inputs(spark: SparkSession): CnicsInputs = {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_cnics_derby").toString
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val demo = CnicsFixtures.demo(spark)
    load(url, "patient", demo.patient)
    load(url, "demographic", demo.demographic)
    load(url, "diagnosis", demo.diagnosis)
    load(url, "medication", demo.medication)
    load(url, "lab", demo.lab)
    demo.copy(
      patient = JdbcSource.table(spark, url, "patient"),
      demographic = JdbcSource.table(spark, url, "demographic"),
      diagnosis = JdbcSource.table(spark, url, "diagnosis"),
      medication = JdbcSource.table(spark, url, "medication"),
      lab = JdbcSource.table(spark, url, "lab"))
  }
}
