package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.functions.DynamicValue

/** F7/F8 — every regex class plus the edge cases pinned in SURVEY.md §5
  * (cnics_to_fhir.py:799-886). */
class DynamicValueSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def meas(v: String, unit: Option[String] = None): Row =
    Seq((v, unit.orNull)).toDF("v", "u")
      .select(DynamicValue.measurement(col("v"), col("u")).as("m"))
      .select("m.*").head()

  test("integer classes") {
    assert(meas("7").getAs[String]("value_type") === "valueInteger")
    assert(meas("7").getAs[Long]("value_int") === 7L)
    assert(meas("+5").getAs[Long]("value_int") === 5L)
    assert(meas("0").getAs[Long]("value_int") === 0L)
    assert(meas("-12").getAs[Long]("value_int") === -12L)
    // interior whitespace tolerated by the regex; reference int() would
    // crash — we parse (documented divergence)
    assert(meas("+ 5").getAs[String]("value_type") === "valueInteger")
    assert(meas("+ 5").getAs[Long]("value_int") === 5L)
  }

  test("leading zeros are NOT integers (regex rejects 007)") {
    assert(meas("007").getAs[String]("value_type") === "valueString")
  }

  test("range class incl. spaces around dash") {
    val r = meas("4-6")
    assert(r.getAs[String]("value_type") === "valueRange")
    assert(r.getAs[Double]("low") === 4.0)
    assert(r.getAs[Double]("high") === 6.0)
    val r2 = meas("3 - 5")
    assert(r2.getAs[String]("value_type") === "valueRange")
    assert(r2.getAs[Double]("low") === 3.0)
  }

  test("negative range bound goes to range, not subtraction") {
    // "-4-6": range_re first group [-+]?\s*[1-9].. matches -4
    assert(meas("-4-6").getAs[String]("value_type") === "valueRange")
    assert(meas("-4-6").getAs[Double]("low") === -4.0)
  }

  test("decimal / scientific classes") {
    assert(meas("5.4").getAs[String]("value_type") === "valueQuantity")
    assert(meas("5.4").getAs[Double]("value_num") === 5.4)
    assert(meas("1e3").getAs[Double]("value_num") === 1000.0)
    assert(meas("-0.5").getAs[Double]("value_num") === -0.5)
    // "-0" fails integer ([0] is bare; sign only allowed before [1-9])
    // but matches decimal -?(0|...)
    assert(meas("-0").getAs[String]("value_type") === "valueQuantity")
  }

  test("comparator classes; alternation picks longest viable (<= not <)") {
    val r = meas("<7.0")
    assert(r.getAs[String]("value_type") === "valueQuantity")
    assert(r.getAs[String]("comparator") === "<")
    assert(r.getAs[Double]("value_num") === 7.0)
    assert(meas("<=0.4").getAs[String]("comparator") === "<=")
    assert(meas(">=5").getAs[String]("comparator") === ">=")
    assert(meas(">123").getAs[Double]("value_num") === 123.0)
  }

  test("string fallback") {
    val r = meas("positive")
    assert(r.getAs[String]("value_type") === "valueString")
    assert(r.getAs[String]("value_str") === "positive")
    assert(r.getAs[String]("unit") === null)
  }

  test("unit defaulting: quantity gets %, range keeps null, supplied wins") {
    assert(meas("5.4").getAs[String]("unit") === "%")
    assert(meas("5.4", Some("mg")).getAs[String]("unit") === "mg")
    assert(meas("4-6").getAs[String]("unit") === null)
    assert(meas("4-6", Some("mg")).getAs[String]("unit") === "mg")
  }

  test("total function: every string lands in exactly one variant") {
    val inputs = Seq("7", "+5", "0", "-0", "5.4", "1e3", "4-6", "3 - 5",
      "<7.0", ">=5", "pos", "", "007", "1.2.3", "- 5", "<abc", "NaN")
    val df = inputs.toDF("v")
      .select(col("v"), DynamicValue.measurement(col("v"), lit(null).cast("string")).as("m"))
      .select(col("v"), col("m.value_type"),
        col("m.value_int"), col("m.value_num"), col("m.low"), col("m.value_str"))
    df.collect().foreach { r =>
      val vt = r.getAs[String]("value_type")
      assert(Set("valueInteger", "valueRange", "valueQuantity", "valueString")(vt), r.toString)
      vt match {
        case "valueInteger" => assert(!r.isNullAt(2), r.toString)
        case "valueQuantity" => assert(!r.isNullAt(3), r.toString)
        case "valueRange" => assert(!r.isNullAt(4), r.toString)
        case "valueString" => assert(!r.isNullAt(5), r.toString)
      }
    }
  }

  test("F8 referenceRange: bound emitted iff decimal-parsable") {
    def rr(lo: String, hi: String, u: String): Row =
      Seq((lo, hi, u)).toDF("lo", "hi", "u")
        .select(DynamicValue.referenceRange(col("lo"), col("hi"), col("u")).as("r"))
        .head()
    assert(rr(null, null, "mg").isNullAt(0))
    assert(rr("junk", "N/A", "mg").isNullAt(0))
    val both = rr("3.5", "7", "mg").getStruct(0)
    assert(both.getAs[Double]("low") === 3.5 && both.getAs[Double]("high") === 7.0)
    assert(both.getAs[String]("low_unit") === "mg")
    val onlyHigh = rr("junk", "11", null).getStruct(0)
    assert(onlyHigh.isNullAt(onlyHigh.fieldIndex("low")))
    assert(onlyHigh.getAs[Double]("high") === 11.0)
    assert(onlyHigh.isNullAt(onlyHigh.fieldIndex("high_unit")))
  }
}
