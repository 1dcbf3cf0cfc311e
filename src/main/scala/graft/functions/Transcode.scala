package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar transcode library — SURVEY.md §2 rows F1–F6, F9–F10.
  *
  * Everything is a pure `Column => Column` composition of built-in
  * functions (when/rlike/concat/...): zero UDFs, so the expressions
  * stay inside whole-stage codegen and Catalyst can fold/pushdown.
  *
  * Semantics mirror the reference (`cnics_to_fhir.py`):
  *  - dx coding dispatch: lines 11-39
  *  - med status: lines 41-46 (end_type deliberately unused)
  *  - code dictionaries: lines 225-244
  *  - race/ethnicity/birth-sex OMB mapping: lines 444-523 (including
  *    the lossy Asian/Pacific Islander → NHPI mapping, 451-453)
  */
object Transcode {

  // dx classification regexes (cnics_to_fhir.py:12-14 re.search, i.e. unanchored-right)
  private def isIcd10(dx: Column): Column = dx.rlike("^[A-Z][0-9]{2}") && !dx.rlike("^V")
  private def isIcd9(dx: Column): Column = dx.rlike("^[0-9]{3}") || dx.rlike("^V[0-9]{2}")

  /** F1 — diagnosis text → coding.system URI. `isStandard` is the
    * membership test against the CNICS standard diagnosis list (D7);
    * pass e.g. `dx.isin(stdList: _*)` or a semi-join flag column. */
  def dxCodingSystem(dx: Column, isStandard: Column): Column =
    when(isIcd10(dx), "http://hl7.org/fhir/sid/icd-10-cm")
      .when(isIcd9(dx), "http://hl7.org/fhir/sid/icd-9-cm")
      .when(isStandard, "https://cnics.cirg.washington.edu/diagnosis-name")
      .otherwise("http://snomed.info/sct")

  /** F2 — diagnosis text → coding.code (pass-through or SNOMED catch-all). */
  def dxCodingCode(dx: Column, isStandard: Column): Column =
    when(isIcd10(dx) || isIcd9(dx) || isStandard, dx).otherwise("404684003")

  /** F3 — diagnosis text → coding.display. */
  def dxCodingDisplay(dx: Column, isStandard: Column): Column =
    when(isIcd10(dx) || isIcd9(dx) || isStandard, dx)
      .otherwise(concat(lit("Clinical finding (finding): "), dx))

  /** F4 — medication start/end dates → request status. The reference
    * takes an end_type parameter and never reads it; we keep the
    * argument to pin that contract (cnics_to_fhir.py:41-46). */
  def medStatus(startDate: Column, endDate: Column, endType: Column): Column = {
    val _ = endType // intentionally unused, bug-compatible
    when(startDate.isNotNull && endDate.isNotNull, "stopped")
      .when(startDate.isNotNull, "active")
      .otherwise("unknown")
  }

  // F5 — code dictionaries (cnics_to_fhir.py:225-244) as literal maps.
  // try_element_at: missing key → null (ANSI-safe); the reference would
  // raise KeyError — strict mode can assert on nulls downstream.
  val dxToCategory: Column = typedLit(Map(
    "Data collected at CNICS site" -> "encounter-diagnosis",
    "Patient reported without supporting outside documentation" -> "health-concern",
    "Reported in outside documentation" -> "problem-list-item",
    "Source unknown" -> "health-concern",
    "Verified clinical diagnosis" -> "problem-list-item"))

  val categoryCodeToDisplay: Column = typedLit(Map(
    "encounter-diagnosis" -> "Encounter Diagnosis",
    "health-concern" -> "Health Concern",
    "problem-list-item" -> "Problem List Item",
    "16100001" -> "Death Diagnosis"))

  val dxToVerificationStatus: Column = typedLit(Map(
    "Data collected at CNICS site" -> "confirmed",
    "Patient reported without supporting outside documentation" -> "unconfirmed",
    "Reported in outside documentation" -> "confirmed",
    "Source unknown" -> "unconfirmed",
    "Verified clinical diagnosis" -> "confirmed"))

  def dxCategory(source: Column): Column = try_element_at(dxToCategory, source)
  def categoryDisplay(category: Column): Column = try_element_at(categoryCodeToDisplay, category)
  def dxVerificationStatus(source: Column): Column = try_element_at(dxToVerificationStatus, source)

  // F6 — OMB race/ethnicity/birth-sex transcodes (cnics_to_fhir.py:444-523).
  def raceCode(race: Column): Column =
    when(race === "American Indian", "1002-5")
      .when(race === "Asian", "2028-9")
      .when(race === "Asian/Pacific Islander", "2076-8") // lossy by design (451-453)
      .when(race === "Black", "2054-5")
      .when(race === "Pacific Islander", "2076-8")
      .when(race === "White", "2106-3")
      .when(race === "Multiracial", "2131-1")
      .when(race === "Other", "2131-1")

  def raceDisplay(race: Column): Column =
    when(race === "American Indian", "American Indian or Alaska Native")
      .when(race === "Asian", "Asian")
      .when(race === "Asian/Pacific Islander", "Native Hawaiian or Other Pacific Islander")
      .when(race === "Black", "Black or African American")
      .when(race === "Pacific Islander", "Native Hawaiian or Other Pacific Islander")
      .when(race === "White", "White")
      .when(race === "Multiracial", "Other Race")
      .when(race === "Other", "Other Race")

  def ethnicityCode(hispanic: Column): Column =
    when(hispanic === "No", "2186-5").when(hispanic === "Yes", "2135-2")

  def ethnicityDisplay(hispanic: Column): Column =
    when(hispanic === "No", "Non Hispanic or Latino")
      .when(hispanic === "Yes", "Hispanic or Latino")

  def birthSex(sex: Column): Column =
    when(sex === "Female", "F").when(sex === "Male", "M")

  /** gender is only set when birth-sex mapped (cnics_to_fhir.py:512-523). */
  def gender(sex: Column): Column =
    when(sex === "Female" || sex === "Male", lower(sex))

  /** F9 — strftime("%Y-%m-%d") equivalent (cnics_to_fhir.py:614,794). */
  def fhirDate(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** F10 — medication display → code: collapse double spaces
    * (cnics_to_fhir.py:702). */
  def medCode(name: Column): Column = regexp_replace(name, "  ", " ")
}
