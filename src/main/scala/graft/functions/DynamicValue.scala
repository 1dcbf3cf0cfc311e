package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F7/F8 — dynamic typing of string lab measurements into a tagged
  * union, the most intricate transform in the reference
  * (cnics_to_fhir.py:799-886).
  *
  * The regexes are ported verbatim (804-807) and evaluated in the
  * reference's dispatch order: integer → range → decimal →
  * comparator+decimal → string. Everything is built from codegen'd
  * built-ins (`rlike`, `regexp_extract`, `try_cast`), no UDFs.
  *
  * Divergence note (documented, strict-mode): for inputs like "+ 5"
  * (the integer regex tolerates interior whitespace after the sign)
  * Python's int()/float() would raise and abort the reference run;
  * we strip the whitespace and parse, instead of crashing the job.
  */
object DynamicValue {
  // cnics_to_fhir.py:804-807, anchored as the reference does ("^"+re+"$")
  val IntegerRe = "^([0]|[-+]?\\s*[1-9][0-9]*)$"
  val RangeRe = "^([0]|[-+]?\\s*[1-9][0-9]*)\\s*-\\s*([0]|[-+]?\\s*[1-9][0-9]*)$"
  val DecimalRe = "^(-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?)$"
  val ComparatorRe = "^(<|<=|>=|>)(-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?)$"

  // ANSI-safe numeric parse: the surrounding `when` guard guarantees a
  // regex match, and whitespace (tolerated by the integer regex after a
  // sign) is stripped before the cast so ANSI cast cannot throw.
  private def castNum(c: Column, t: String): Column =
    regexp_replace(c, "\\s+", "").cast(t)

  /** Discriminator: which value[x] variant the measurement maps to. */
  def valueType(v: Column): Column =
    when(v.rlike(IntegerRe), "valueInteger")
      .when(v.rlike(RangeRe), "valueRange")
      .when(v.rlike(DecimalRe), "valueQuantity")
      .when(v.rlike(ComparatorRe), "valueQuantity")
      .otherwise("valueString")

  /** The full tagged-union struct (SURVEY.md §1.5): exactly one variant
    * populated; `unit`/`ucum` carry the quantity unit with the
    * reference's '%' defaulting (839-855). */
  def measurement(v: Column, units: Column): Column = {
    val vt = valueType(v)
    val isInt = vt === "valueInteger"
    val isRange = vt === "valueRange"
    val isQty = vt === "valueQuantity"
    val isCmp = v.rlike(ComparatorRe) && !v.rlike(DecimalRe)
    struct(
      vt.as("value_type"),
      when(isInt, castNum(v, "long")).as("value_int"),
      // plain decimal parses v itself; comparator parses group 2
      when(isQty,
        when(v.rlike(DecimalRe), castNum(v, "double"))
          .otherwise(castNum(regexp_extract(v, ComparatorRe, 2), "double"))).as("value_num"),
      // range bounds: reference float()s the raw captured strings (815-816)
      when(isRange, castNum(regexp_extract(v, RangeRe, 1), "double")).as("low"),
      when(isRange, castNum(regexp_extract(v, RangeRe, 2), "double")).as("high"),
      when(isCmp, regexp_extract(v, ComparatorRe, 1)).as("comparator"),
      when(vt === "valueString", v).as("value_str"),
      // quantity gets a '%' default when no unit supplied (839-841);
      // range bounds carry the unit only when supplied (845-855)
      when(isQty, coalesce(units, lit("%"))).when(isRange, units).as("unit"))
  }

  /** F8 — referenceRange builder (cnics_to_fhir.py:856-886): a bound is
    * emitted iff the raw string parses as a decimal; the struct exists
    * iff at least one bound does. Unit attached only when supplied. */
  def referenceRange(lowS: Column, highS: Column, units: Column): Column = {
    val lowOk = lowS.isNotNull && lowS.rlike(DecimalRe)
    val highOk = highS.isNotNull && highS.rlike(DecimalRe)
    when(lowOk || highOk, struct(
      when(lowOk, castNum(lowS, "double")).as("low"),
      when(highOk, castNum(highS, "double")).as("high"),
      when(lowOk, units).as("low_unit"),
      when(highOk, units).as("high_unit")))
  }
}
