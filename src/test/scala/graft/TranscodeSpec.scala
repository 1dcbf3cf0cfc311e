package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Transcode

/** F1–F6/F9–F10 table-driven against the reference's branches
  * (cnics_to_fhir.py:11-46, 225-244, 444-523). */
class TranscodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dxRow(dx: String, std: Boolean): (String, String, String) = {
    val df = Seq(dx).toDF("dx")
    val r = df.select(
      Transcode.dxCodingSystem(col("dx"), lit(std)),
      Transcode.dxCodingCode(col("dx"), lit(std)),
      Transcode.dxCodingDisplay(col("dx"), lit(std))).head()
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("F1-F3 ICD-10 prefix (rlike is search-anchored-left like re.search)") {
    assert(dxRow("J44.1", std = false) ===
      (("http://hl7.org/fhir/sid/icd-10-cm", "J44.1", "J44.1")))
  }
  test("F1-F3 V-prefix is ICD-9 not ICD-10") {
    assert(dxRow("V08", std = false)._1 === "http://hl7.org/fhir/sid/icd-9-cm")
  }
  test("F1-F3 three-digit ICD-9") {
    assert(dxRow("491.21", std = false)._1 === "http://hl7.org/fhir/sid/icd-9-cm")
  }
  test("F1-F3 standard CNICS name") {
    assert(dxRow("Hepatitis C", std = true) ===
      (("https://cnics.cirg.washington.edu/diagnosis-name", "Hepatitis C", "Hepatitis C")))
  }
  test("F1-F3 free text → SNOMED catch-all with display prefix") {
    assert(dxRow("weird finding", std = false) ===
      (("http://snomed.info/sct", "404684003", "Clinical finding (finding): weird finding")))
  }

  test("F4 med status truth table; end_type ignored") {
    val rows = Seq(
      (Some("2020-01-01"), Some("2020-02-01"), "whatever", "stopped"),
      (Some("2020-01-01"), None, "Completed", "active"),
      (None, Some("2020-02-01"), "x", "unknown"),
      (None, None, null, "unknown"))
    val df = rows.map { case (s, e, t, exp) => (s.orNull, e.orNull, t, exp) }
      .toDF("s", "e", "t", "expected")
    val bad = df.select(Transcode.medStatus(col("s"), col("e"), col("t")).as("got"), col("expected"))
      .filter(col("got") =!= col("expected")).count()
    assert(bad === 0)
  }

  test("F5 dictionaries include the dead 16100001 display entry") {
    val r = Seq("16100001").toDF("c")
      .select(Transcode.categoryDisplay(col("c"))).head().getString(0)
    assert(r === "Death Diagnosis")
  }

  test("F5 missing key yields null (reference would KeyError)") {
    val r = Seq("nope").toDF("c").select(Transcode.dxCategory(col("c"))).head()
    assert(r.isNullAt(0))
  }

  test("F6 all race branches incl. lossy Asian/Pacific Islander → NHPI") {
    val expected = Map(
      "American Indian" -> ("1002-5", "American Indian or Alaska Native"),
      "Asian" -> ("2028-9", "Asian"),
      "Asian/Pacific Islander" -> ("2076-8", "Native Hawaiian or Other Pacific Islander"),
      "Black" -> ("2054-5", "Black or African American"),
      "Pacific Islander" -> ("2076-8", "Native Hawaiian or Other Pacific Islander"),
      "White" -> ("2106-3", "White"),
      "Multiracial" -> ("2131-1", "Other Race"),
      "Other" -> ("2131-1", "Other Race"))
    expected.foreach { case (race, (code, disp)) =>
      val r = Seq(race).toDF("r")
        .select(Transcode.raceCode(col("r")), Transcode.raceDisplay(col("r"))).head()
      assert((r.getString(0), r.getString(1)) === ((code, disp)), race)
    }
    val unk = Seq("Martian").toDF("r").select(Transcode.raceCode(col("r"))).head()
    assert(unk.isNullAt(0))
  }

  test("F6 ethnicity/birth-sex/gender") {
    val r = Seq(("Yes", "Female")).toDF("h", "s").select(
      Transcode.ethnicityCode(col("h")), Transcode.ethnicityDisplay(col("h")),
      Transcode.birthSex(col("s")), Transcode.gender(col("s"))).head()
    assert((r.getString(0), r.getString(1), r.getString(2), r.getString(3)) ===
      (("2135-2", "Hispanic or Latino", "F", "female")))
    val r2 = Seq(("Maybe", "Nonbinary")).toDF("h", "s").select(
      Transcode.ethnicityCode(col("h")), Transcode.birthSex(col("s")), Transcode.gender(col("s"))).head()
    assert(r2.isNullAt(0) && r2.isNullAt(1) && r2.isNullAt(2))
  }

  test("F10 med code collapses double spaces") {
    val r = Seq("ABC  DEF  GHI").toDF("m").select(Transcode.medCode(col("m"))).head().getString(0)
    assert(r === "ABC DEF GHI")
  }
}
