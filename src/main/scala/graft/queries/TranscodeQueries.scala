package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.{DynamicValue, Transcode}
import graft.operators.Merge

/** SURVEY.md §2 F-row coverage: the CNICS transcode library driven
  * through deterministic synthetic inputs built from fixture columns,
  * so each Column function gets an independent DuckDB oracle that
  * re-derives the expected output from the same raw tables (including
  * the ported regexes — this checks Java-regex vs RE2 parity too).
  */
object TranscodeQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  // DuckDB-side regexes (single-quoted SQL, RE2): same patterns as
  // DynamicValue.{Integer,Range,Decimal,Comparator}Re.
  private val intRe = """^(0|[-+]?\s*[1-9][0-9]*)$"""
  private val rangeRe = """^(0|[-+]?\s*[1-9][0-9]*)\s*-\s*(0|[-+]?\s*[1-9][0-9]*)$"""
  private val decRe = """^(-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?)$"""
  private val cmpRe = """^(<|<=|>=|>)(-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?)$"""

  val defs: Seq[QueryDef] = Seq(

    // ── F1-F3: diagnosis coding dispatch ──
    QueryDef(
      "f1_dx_coding",
      "dx → coding system/code/display regex CASE (cnics_to_fhir.py:11-39)",
      (s, d) => {
        val p = t(s, d, "part")
        val dx = when(col("p_partkey") % 5 === 0,
            concat(lit("A"), lpad((col("p_size") % 100).cast("string"), 2, "0")))
          .when(col("p_partkey") % 5 === 1, lpad((col("p_partkey") % 1000).cast("string"), 3, "0"))
          .when(col("p_partkey") % 5 === 2,
            concat(lit("V"), lpad((col("p_size") % 100).cast("string"), 2, "0")))
          .when(col("p_partkey") % 5 === 3, lit("Hepatitis C"))
          .otherwise(col("p_name"))
        val isStd = dx.isin("Hepatitis C", "Pneumonia")
        p.select(
          col("p_partkey"),
          dx.as("dx"),
          Transcode.dxCodingSystem(dx, isStd).as("sys"),
          Transcode.dxCodingCode(dx, isStd).as("code"),
          Transcode.dxCodingDisplay(dx, isStd).as("disp"))
      },
      Some(s"""WITH src AS (SELECT p_partkey,
              |CASE (p_partkey % 5)
              | WHEN 0 THEN 'A' || lpad((p_size % 100)::VARCHAR, 2, '0')
              | WHEN 1 THEN lpad((p_partkey % 1000)::VARCHAR, 3, '0')
              | WHEN 2 THEN 'V' || lpad((p_size % 100)::VARCHAR, 2, '0')
              | WHEN 3 THEN 'Hepatitis C'
              | ELSE p_name END AS dx FROM part),
              |cls AS (SELECT *,
              | regexp_matches(dx, '^[A-Z][0-9]{2}') AND NOT regexp_matches(dx, '^V') AS icd10,
              | regexp_matches(dx, '^[0-9]{3}') OR regexp_matches(dx, '^V[0-9]{2}') AS icd9,
              | dx IN ('Hepatitis C', 'Pneumonia') AS std FROM src)
              |SELECT p_partkey, dx,
              | CASE WHEN icd10 THEN 'http://hl7.org/fhir/sid/icd-10-cm'
              |      WHEN icd9 THEN 'http://hl7.org/fhir/sid/icd-9-cm'
              |      WHEN std THEN 'https://cnics.cirg.washington.edu/diagnosis-name'
              |      ELSE 'http://snomed.info/sct' END AS sys,
              | CASE WHEN icd10 OR icd9 OR std THEN dx ELSE '404684003' END AS code,
              | CASE WHEN icd10 OR icd9 OR std THEN dx
              |      ELSE 'Clinical finding (finding): ' || dx END AS disp
              |FROM cls""".stripMargin)),

    // ── F4: medication status cascade ──
    QueryDef(
      "f4_med_status",
      "start/end date → status when-cascade, end_type unused (cnics_to_fhir.py:41-46)",
      (s, d) => {
        val o = t(s, d, "orders")
        val start = when(col("o_orderkey") % 3 =!= 0, col("o_orderdate"))
        val end = when(col("o_orderkey") % 2 === 0, col("o_orderdate"))
        o.select(col("o_orderkey"),
          Transcode.medStatus(start, end, lit("ignored")).as("status"))
      },
      Some("""SELECT o_orderkey,
             |CASE WHEN s IS NOT NULL AND e IS NOT NULL THEN 'stopped'
             |     WHEN s IS NOT NULL THEN 'active' ELSE 'unknown' END AS status
             |FROM (SELECT o_orderkey,
             | CASE WHEN o_orderkey % 3 <> 0 THEN o_orderdate END AS s,
             | CASE WHEN o_orderkey % 2 = 0 THEN o_orderdate END AS e FROM orders)""".stripMargin)),

    // ── F5: dictionary transcodes ──
    QueryDef(
      "f5_dict_transcode",
      "code-map lookups incl. missing-key → null (cnics_to_fhir.py:225-244)",
      (s, d) => {
        val o = t(s, d, "orders")
        val src = when(col("o_orderkey") % 6 === 0, "Data collected at CNICS site")
          .when(col("o_orderkey") % 6 === 1, "Patient reported without supporting outside documentation")
          .when(col("o_orderkey") % 6 === 2, "Reported in outside documentation")
          .when(col("o_orderkey") % 6 === 3, "Source unknown")
          .when(col("o_orderkey") % 6 === 4, "Verified clinical diagnosis")
          .otherwise("Bogus source")
        val cat = Transcode.dxCategory(src)
        o.select(col("o_orderkey"), src.as("src"), cat.as("category"),
          Transcode.categoryDisplay(cat).as("cat_display"),
          Transcode.dxVerificationStatus(src).as("ver_status"))
      },
      Some("""WITH m AS (SELECT o_orderkey,
             |CASE (o_orderkey % 6)
             | WHEN 0 THEN 'Data collected at CNICS site'
             | WHEN 1 THEN 'Patient reported without supporting outside documentation'
             | WHEN 2 THEN 'Reported in outside documentation'
             | WHEN 3 THEN 'Source unknown'
             | WHEN 4 THEN 'Verified clinical diagnosis'
             | ELSE 'Bogus source' END AS src FROM orders),
             |c AS (SELECT *, CASE src
             | WHEN 'Data collected at CNICS site' THEN 'encounter-diagnosis'
             | WHEN 'Patient reported without supporting outside documentation' THEN 'health-concern'
             | WHEN 'Reported in outside documentation' THEN 'problem-list-item'
             | WHEN 'Source unknown' THEN 'health-concern'
             | WHEN 'Verified clinical diagnosis' THEN 'problem-list-item' END AS category FROM m)
             |SELECT o_orderkey, src, category,
             | CASE category WHEN 'encounter-diagnosis' THEN 'Encounter Diagnosis'
             |  WHEN 'health-concern' THEN 'Health Concern'
             |  WHEN 'problem-list-item' THEN 'Problem List Item'
             |  WHEN '16100001' THEN 'Death Diagnosis' END AS cat_display,
             | CASE src
             |  WHEN 'Data collected at CNICS site' THEN 'confirmed'
             |  WHEN 'Patient reported without supporting outside documentation' THEN 'unconfirmed'
             |  WHEN 'Reported in outside documentation' THEN 'confirmed'
             |  WHEN 'Source unknown' THEN 'unconfirmed'
             |  WHEN 'Verified clinical diagnosis' THEN 'confirmed' END AS ver_status
             |FROM c""".stripMargin)),

    // ── F6: OMB race / ethnicity / birth-sex ──
    QueryDef(
      "f6_demographics",
      "race/ethnicity/birth-sex OMB transcode incl. lossy mappings (cnics_to_fhir.py:444-523)",
      (s, d) => {
        val c = t(s, d, "customer")
        val race = when(col("c_custkey") % 9 === 0, "American Indian")
          .when(col("c_custkey") % 9 === 1, "Asian")
          .when(col("c_custkey") % 9 === 2, "Asian/Pacific Islander")
          .when(col("c_custkey") % 9 === 3, "Black")
          .when(col("c_custkey") % 9 === 4, "Pacific Islander")
          .when(col("c_custkey") % 9 === 5, "White")
          .when(col("c_custkey") % 9 === 6, "Multiracial")
          .when(col("c_custkey") % 9 === 7, "Other")
        val hispanic = when(col("c_custkey") % 3 === 0, "Yes").when(col("c_custkey") % 3 === 1, "No")
        val sex = when(col("c_custkey") % 4 === 0, "Female")
          .when(col("c_custkey") % 4 === 1, "Male")
          .when(col("c_custkey") % 4 === 2, "Unknown")
        c.select(col("c_custkey"),
          Transcode.raceCode(race).as("race_code"),
          Transcode.raceDisplay(race).as("race_display"),
          Transcode.ethnicityCode(hispanic).as("eth_code"),
          Transcode.ethnicityDisplay(hispanic).as("eth_display"),
          Transcode.birthSex(sex).as("birth_sex"),
          Transcode.gender(sex).as("gender"))
      },
      Some("""WITH m AS (SELECT c_custkey,
             |CASE (c_custkey % 9) WHEN 0 THEN 'American Indian' WHEN 1 THEN 'Asian'
             | WHEN 2 THEN 'Asian/Pacific Islander' WHEN 3 THEN 'Black'
             | WHEN 4 THEN 'Pacific Islander' WHEN 5 THEN 'White'
             | WHEN 6 THEN 'Multiracial' WHEN 7 THEN 'Other' END AS race,
             |CASE (c_custkey % 3) WHEN 0 THEN 'Yes' WHEN 1 THEN 'No' END AS hispanic,
             |CASE (c_custkey % 4) WHEN 0 THEN 'Female' WHEN 1 THEN 'Male'
             | WHEN 2 THEN 'Unknown' END AS sex
             |FROM customer)
             |SELECT c_custkey,
             |CASE race WHEN 'American Indian' THEN '1002-5' WHEN 'Asian' THEN '2028-9'
             | WHEN 'Asian/Pacific Islander' THEN '2076-8' WHEN 'Black' THEN '2054-5'
             | WHEN 'Pacific Islander' THEN '2076-8' WHEN 'White' THEN '2106-3'
             | WHEN 'Multiracial' THEN '2131-1' WHEN 'Other' THEN '2131-1' END AS race_code,
             |CASE race WHEN 'American Indian' THEN 'American Indian or Alaska Native'
             | WHEN 'Asian' THEN 'Asian'
             | WHEN 'Asian/Pacific Islander' THEN 'Native Hawaiian or Other Pacific Islander'
             | WHEN 'Black' THEN 'Black or African American'
             | WHEN 'Pacific Islander' THEN 'Native Hawaiian or Other Pacific Islander'
             | WHEN 'White' THEN 'White' WHEN 'Multiracial' THEN 'Other Race'
             | WHEN 'Other' THEN 'Other Race' END AS race_display,
             |CASE hispanic WHEN 'No' THEN '2186-5' WHEN 'Yes' THEN '2135-2' END AS eth_code,
             |CASE hispanic WHEN 'No' THEN 'Non Hispanic or Latino'
             | WHEN 'Yes' THEN 'Hispanic or Latino' END AS eth_display,
             |CASE sex WHEN 'Female' THEN 'F' WHEN 'Male' THEN 'M' END AS birth_sex,
             |CASE WHEN sex IN ('Female', 'Male') THEN lower(sex) END AS gender
             |FROM m""".stripMargin)),

    // ── F7: dynamic value typing (the tagged union) ──
    QueryDef(
      "f7_dynamic_value",
      "regex-dispatched string→typed measurement union (cnics_to_fhir.py:799-855)",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val m = when(col("l_linenumber") % 7 === 0, (col("l_partkey") % 200).cast("string"))
          .when(col("l_linenumber") % 7 === 1,
            concat(lit("+"), ((col("l_partkey") % 99) + 1).cast("string")))
          .when(col("l_linenumber") % 7 === 2,
            concat(((col("l_partkey") % 90) + 1).cast("string"), lit("-"),
              ((col("l_partkey") % 90) + 10).cast("string")))
          .when(col("l_linenumber") % 7 === 3,
            concat((col("l_partkey") % 40).cast("string"), lit("."),
              (col("l_suppkey") % 10).cast("string")))
          .when(col("l_linenumber") % 7 === 4,
            concat(lit("<"), ((col("l_suppkey") % 9) + 1).cast("string"), lit("."),
              (col("l_partkey") % 10).cast("string")))
          .when(col("l_linenumber") % 7 === 5,
            concat(lit(">="), ((col("l_suppkey") % 50) + 1).cast("string")))
          .otherwise(lit("positive"))
        val units = when(col("l_suppkey") % 3 =!= 0, "mg/dL")
        val meas = DynamicValue.measurement(m, units)
        li.select(col("l_orderkey"), col("l_linenumber"), m.as("m"), meas.as("meas"))
          .select(col("l_orderkey"), col("l_linenumber"), col("m"),
            col("meas.value_type").as("value_type"),
            col("meas.value_int").as("value_int"),
            col("meas.value_num").as("value_num"),
            col("meas.low").as("low"), col("meas.high").as("high"),
            col("meas.comparator").as("comparator"),
            col("meas.value_str").as("value_str"),
            col("meas.unit").as("unit"))
      },
      Some(s"""WITH src AS (SELECT l_orderkey, l_linenumber,
              |CASE (l_linenumber % 7)
              | WHEN 0 THEN (l_partkey % 200)::VARCHAR
              | WHEN 1 THEN '+' || ((l_partkey % 99) + 1)::VARCHAR
              | WHEN 2 THEN ((l_partkey % 90) + 1)::VARCHAR || '-' || ((l_partkey % 90) + 10)::VARCHAR
              | WHEN 3 THEN (l_partkey % 40)::VARCHAR || '.' || (l_suppkey % 10)::VARCHAR
              | WHEN 4 THEN '<' || ((l_suppkey % 9) + 1)::VARCHAR || '.' || (l_partkey % 10)::VARCHAR
              | WHEN 5 THEN '>=' || ((l_suppkey % 50) + 1)::VARCHAR
              | ELSE 'positive' END AS m,
              |CASE WHEN l_suppkey % 3 <> 0 THEN 'mg/dL' END AS units
              |FROM lineitem),
              |cls AS (SELECT *,
              |CASE WHEN regexp_matches(m, '$intRe') THEN 'valueInteger'
              |     WHEN regexp_matches(m, '$rangeRe') THEN 'valueRange'
              |     WHEN regexp_matches(m, '$decRe') THEN 'valueQuantity'
              |     WHEN regexp_matches(m, '$cmpRe') THEN 'valueQuantity'
              |     ELSE 'valueString' END AS value_type FROM src)
              |SELECT l_orderkey, l_linenumber, m, value_type,
              |CASE WHEN value_type = 'valueInteger'
              |     THEN CAST(regexp_replace(m, '\\s+', '', 'g') AS BIGINT) END AS value_int,
              |CASE WHEN value_type = 'valueQuantity' THEN
              |  CASE WHEN regexp_matches(m, '$decRe') THEN CAST(m AS DOUBLE)
              |       ELSE CAST(regexp_extract(m, '$cmpRe', 2) AS DOUBLE) END END AS value_num,
              |CASE WHEN value_type = 'valueRange'
              |     THEN CAST(regexp_replace(regexp_extract(m, '$rangeRe', 1), '\\s+', '', 'g') AS DOUBLE) END AS low,
              |CASE WHEN value_type = 'valueRange'
              |     THEN CAST(regexp_replace(regexp_extract(m, '$rangeRe', 2), '\\s+', '', 'g') AS DOUBLE) END AS high,
              |CASE WHEN regexp_matches(m, '$cmpRe') AND NOT regexp_matches(m, '$decRe')
              |     THEN regexp_extract(m, '$cmpRe', 1) END AS comparator,
              |CASE WHEN value_type = 'valueString' THEN m END AS value_str,
              |CASE WHEN value_type = 'valueQuantity' THEN coalesce(units, '%')
              |     WHEN value_type = 'valueRange' THEN units END AS unit
              |FROM cls""".stripMargin)),

    // ── F8: referenceRange builder ──
    QueryDef(
      "f8_reference_range",
      "referenceRange from decimal-parsing bounds (cnics_to_fhir.py:856-886)",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val lowS = when(col("l_orderkey") % 4 === 0, (col("l_partkey") % 50).cast("string"))
          .when(col("l_orderkey") % 4 === 1,
            concat((col("l_partkey") % 50).cast("string"), lit("."), (col("l_suppkey") % 10).cast("string")))
          .when(col("l_orderkey") % 4 === 2, lit("junk"))
        val highS = when(col("l_suppkey") % 3 === 0, ((col("l_partkey") % 60) + 1).cast("string"))
          .when(col("l_suppkey") % 3 === 2, lit("N/A"))
        val units = when(col("l_orderkey") % 5 =!= 0, "g/L")
        val rr = DynamicValue.referenceRange(lowS, highS, units)
        li.select(col("l_orderkey"), col("l_linenumber"), rr.as("rr"))
          .select(col("l_orderkey"), col("l_linenumber"),
            col("rr").isNotNull.as("has_rr"),
            col("rr.low").as("low"), col("rr.high").as("high"),
            col("rr.low_unit").as("low_unit"), col("rr.high_unit").as("high_unit"))
      },
      Some(s"""WITH src AS (SELECT l_orderkey, l_linenumber,
              |CASE (l_orderkey % 4) WHEN 0 THEN (l_partkey % 50)::VARCHAR
              | WHEN 1 THEN (l_partkey % 50)::VARCHAR || '.' || (l_suppkey % 10)::VARCHAR
              | WHEN 2 THEN 'junk' END AS low_s,
              |CASE (l_suppkey % 3) WHEN 0 THEN ((l_partkey % 60) + 1)::VARCHAR
              | WHEN 2 THEN 'N/A' END AS high_s,
              |CASE WHEN l_orderkey % 5 <> 0 THEN 'g/L' END AS units
              |FROM lineitem),
              |cls AS (SELECT *,
              | low_s IS NOT NULL AND regexp_matches(low_s, '$decRe') AS low_ok,
              | high_s IS NOT NULL AND regexp_matches(high_s, '$decRe') AS high_ok FROM src)
              |SELECT l_orderkey, l_linenumber, (low_ok OR high_ok) AS has_rr,
              |CASE WHEN low_ok THEN CAST(low_s AS DOUBLE) END AS low,
              |CASE WHEN high_ok THEN CAST(high_s AS DOUBLE) END AS high,
              |CASE WHEN low_ok AND (low_ok OR high_ok) THEN units END AS low_unit,
              |CASE WHEN high_ok AND (low_ok OR high_ok) THEN units END AS high_unit
              |FROM cls""".stripMargin)),

    // ── D4/F12: the merge classifier through graft.operators.Merge ──
    QueryDef(
      "d4_merge_classify",
      "full-outer reconcile → insert/update/delete actions (cnics_to_fhir.py:548-584)",
      (s, d) => {
        val source = t(s, d, "customer")
          .filter(col("c_custkey") % 2 === 0)
          .select(col("c_custkey").as("merge_key"))
        // %3 store restriction guarantees all three actions occur at
        // every SF (otherwise no customer is order-less at sf>=0.01
        // and the insert path would go unexercised)
        val store = t(s, d, "orders")
          .filter(col("o_custkey") % 3 =!= 0)
          .select(col("o_custkey").as("merge_key")).distinct()
          .withColumn("id", concat(lit("O"), col("merge_key")))
        Merge.classify(source, store, Seq("merge_key"))
          .select(col("merge_key"), col(Merge.ActionCol), col(Merge.StoreIdCol))
      },
      Some("""SELECT coalesce(c.c_custkey, o.o_custkey) AS merge_key,
             |CASE WHEN c.c_custkey IS NOT NULL AND o.o_custkey IS NOT NULL THEN 'update'
             |     WHEN c.c_custkey IS NULL THEN 'delete' ELSE 'insert' END AS merge_action,
             |CASE WHEN o.o_custkey IS NOT NULL THEN 'O' || o.o_custkey::VARCHAR END AS store_id
             |FROM (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0) c
             |FULL JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey % 3 <> 0) o
             |ON c.c_custkey = o.o_custkey""".stripMargin))
  )
}
