package graft.model

import org.apache.spark.sql.SparkSession
import graft.pipeline.CnicsInputs

/** CNICS-shaped demo fixtures (FIXTURES.md §A): deterministic in-memory
  * rows exercising every branch the golden tests pin — crosswalk
  * last-wins, PRO fallback, historical filter, C3 predicate, F7 value
  * classes, referenceRange parsing. Shared by the ScalaTest goldens and
  * the driver-visible cnics_* queries. */
object CnicsFixtures {

  def demo(spark: SparkSession): CnicsInputs = {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    def b(s: String) = s.getBytes("UTF-8")
    CnicsInputs(
      patient = Seq(
        (1L, b("uw-001"), "uw"),
        (2L, b("uw-002"), "uw"),
        (3L, b("sea-9"), "sea")
      ).toDF("PatientId", "SitePatientId", "Site"),
      demographic = Seq(
        (10L, 1L, Some("Female"), Some("Asian"), Some("Yes")),
        (11L, 1L, Some("Male"), Some("White"), Some("No")),
        (12L, 2L, None, None, None),
        (13L, 3L, Some("Male"), Some("Black"), Some("No"))
      ).toDF("DemographicId", "PatientId", "Sex", "Race", "Hispanic"),
      diagnosis = Seq(
        (1L, b("dx-1"), Some(d("2020-01-02")), "Verified clinical diagnosis", "J44.1", None),
        (1L, b("dx-2"), None, "Source unknown", "Hepatitis C", Some("Yes")), // historical
        (2L, b("dx-3"), Some(d("2021-03-04")), "Data collected at CNICS site", "491.21", None),
        (2L, b("dx-4"), None, "Source unknown", "NotInFilter", None) // C3-filtered
      ).toDF("PatientId", "DiagnosisId", "DiagnosisDate", "DiagnosisSource", "DiagnosisName", "Historical"),
      medication = Seq(
        (1L, b("med-1"), "Aspirin  81mg", Some(d("2020-01-01")),
          None: Option[java.sql.Date], None: Option[String], None: Option[String])
      ).toDF("PatientId", "MedicationId", "MedicationName", "StartDate", "EndDate", "EndType", "Historical"),
      lab = Seq(
        (1L, "lab-1", "Hemoglobin A1C", "5.4", None: Option[String], Some(d("2020-02-03")), Some("4"), Some("6"), None: Option[String]),
        (1L, "lab-2", "CD4", "<7.0", Some("cells/uL"), Some(d("2020-03-04")), Some("junk"), None, None),
        (2L, "lab-3", "Rapid HIV", "positive", None, None: Option[java.sql.Date], None, None, None)
      ).toDF("PatientId", "LabId", "TestName", "Result", "Units", "TestDate", "ReferenceLow", "ReferenceHigh", "Historical"),
      pro = Seq((1L, "s2"), (1L, "s1"), (1L, "s1")).toDF("PatientId", "SessionId"),
      proDb = Seq(
        ("s1", Some(900L), Some("MRN-A")),
        ("s2", Some(900L), Some("MRN-B")),
        ("s2", Some(901L), None: Option[String])
      ).toDF("SessionID", "PatientID", "MRN"),
      crosswalk = Seq(
        (Some("H1"), None: Option[String], "uw-001", 1L),
        (Some("H2"), Some("U2"), "uw-001", 2L) // last wins
      ).toDF("hmrn", "umrn", "SitePatientId", "__order"),
      conditionsFilter = "DiagnosisName in ('J44.1', 'Hepatitis C', '491.21')",
      medicationsFilter = "MedicationName in ('Aspirin  81mg')",
      observationsFilter = "TestName in ('Hemoglobin A1C', 'CD4', 'Rapid HIV')",
      standardDiagnoses = Seq("Hepatitis C", "Pneumonia"))
  }
}
