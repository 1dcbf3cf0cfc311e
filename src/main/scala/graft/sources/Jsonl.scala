package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-lines ingest — the wire format crawl pipelines actually
  * deliver — with a scale-clean DEAD-LETTER split.
  *
  * Spark's native json reader in PERMISSIVE mode needs the corrupt
  * column materialized into the schema and (documented Spark caveat)
  * a cache before the corrupt rows can be filtered. At 100 TB caching
  * the raw input is not a plan; instead the file is read as text
  * (splittable, pushdown-pruned to one string column) and parsed
  * columnar with `from_json`, which yields NULL for malformed lines —
  * so the valid/quarantine split is a codegen'd filter, one pass, no
  * cache. Blank lines are dropped (JSONL padding, not data); corrupt
  * lines keep their raw text and source file for the quarantine table
  * every production ingest maintains.
  *
  * Schema is DECLARED, not inferred: inference reads the corpus twice
  * and locks the job to the sampled shape; a crawl contract supplies
  * the schema and everything off-contract lands in quarantine.
  * `from_json` is lax about extra fields (dropped) and missing fields
  * (null) — strictness beyond well-formedness belongs to downstream
  * expectations (profile gates), not the decoder.
  *
  * Reference context: no file-format surface in the reference (MySQL
  * rows in, HTTP out); training-pipeline extension (SURVEY §7.5).
  */
object Jsonl {

  final val RawCol = "_raw"
  final val FileCol = "_source_file"

  /** Read `path` as JSONL under `schema`: (valid, quarantine).
    * `valid` carries the schema's columns; `quarantine` carries
    * (_raw, _source_file) for the dead-letter table. The two frames
    * share one text scan lineage — materialize both in one job via a
    * union sink, or independently (each is a single pass). */
  def read(spark: SparkSession, path: String, schema: StructType):
      (DataFrame, DataFrame) = {
    val lines = spark.read.text(path)
      .select(col("value").as(RawCol),
        input_file_name().as(FileCol))
      .filter(length(trim(col(RawCol))) > 0)
    split(lines, schema)
  }

  /** The parse/split half, exposed for streams and tests: `lines`
    * must carry [[RawCol]] (and optionally [[FileCol]]). */
  def split(lines: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    val corrupt = "_graft_corrupt"
    require(!schema.fieldNames.contains(corrupt), s"schema may not declare $corrupt")
    val withFile =
      if (lines.columns.contains(FileCol)) lines
      else lines.withColumn(FileCol, lit(null).cast("string"))
    // PERMISSIVE from_json flags malformedness through the declared
    // corrupt-record field: non-objects, broken syntax, and off-type
    // field values all populate it (a malformed OBJECT still parses to
    // a struct — with null fields — so struct-null is not the signal)
    val parsed = withFile.withColumn("__p",
      from_json(col(RawCol), schema.add(corrupt, "string"),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt)))
    val bad = col("__p").isNull || col(s"__p.$corrupt").isNotNull
    val valid = parsed.filter(!bad)
      .select(schema.fieldNames.map(f => col(s"__p.$f").as(f)).toSeq: _*)
    val quarantine = parsed.filter(bad).select(col(RawCol), col(FileCol))
    (valid, quarantine)
  }
}
