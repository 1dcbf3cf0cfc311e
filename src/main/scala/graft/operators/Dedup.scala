package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for the training-data pipeline surface
  * (SURVEY.md §7.5): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design: every path is a narrow per-row projection followed by
  * a key-partitioned shuffle (groupBy fingerprint / band-bucket join).
  * Nothing is quadratic in corpus size: near-dup candidate generation
  * goes through LSH band buckets, and only bucket-local pairs are
  * scored. All signature math is higher-order-function expressions —
  * no UDFs, fully codegen'd, portable to the DuckDB oracles.
  */
object Dedup {

  // MinHash parameters: 32 hashes in 8 bands of 4 rows.
  val NumHashes = 32
  val Bands = 8
  val RowsPerBand: Int = NumHashes / Bands
  val MinhashP = 2147483647L // 2^31-1 (prime)
  val BandP = 1000000000000037L

  /** Exact duplicate groups: hash-groupBy on the content fingerprint.
    * One shuffle on md5(text); map-side partial agg applies. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** Stage per-doc distinct token-shingle hashes (narrow projection).
    * Token shingles, not char shingles: on small-vocab text, char
    * 3-grams collide so heavily that LSH candidate generation degrades
    * toward the cross product (measured on the fixture corpus). */
  def withShingleHashes(df: DataFrame, textCol: String, k: Int = 3): DataFrame =
    df.withColumn("__clean", expr(s"lower(${TextFunctions.cleanAsciiSql(textCol)})"))
      .withColumn("__sh", expr(TextFunctions.tokenShinglesSql("__clean", k)))
      .withColumn("shingle_hashes", expr(
        s"transform(__sh, sh -> ${TextFunctions.polyHashSql("sh")})"))
      .drop("__clean", "__sh")

  /** MinHash signature (length NumHashes) from staged shingle hashes:
    * sig[i] = min over shingles of (a_i*h + b_i) mod P. */
  def minhashSigCol: Column = expr(
    s"transform(sequence(0, ${NumHashes - 1}), i -> " +
      s"array_min(transform(shingle_hashes, h -> ((2*i + 3) * h + (7919*i + 13)) % ${MinhashP}L)))")

  /** Explode signature into (id, band, band_hash) rows — the LSH index.
    * band_hash folds the band's rows so equal bands ⇒ equal hash. */
  def minhashBands(df: DataFrame, textCol: String, idCol: String, k: Int = 3): DataFrame =
    withShingleHashes(df, textCol, k)
      .filter(size(col("shingle_hashes")) > 0)
      .withColumn("__sig", minhashSigCol)
      .select(col(idCol), expr(
        s"explode(transform(sequence(0, ${Bands - 1}), b -> struct(b AS band, " +
          s"aggregate(slice(__sig, b*${RowsPerBand} + 1, ${RowsPerBand}), CAST(0 AS BIGINT), " +
          s"(a, x) -> (a * 31 + x) % ${BandP}L) AS band_hash)))").as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))

  /** LSH candidate pairs: equal (band, band_hash) ⇒ candidate. The join
    * shuffles on the bucket key only — no cross product. */
  def lshCandidatePairs(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("id_a"), col("band"), col("band_hash"))
    val b = bands.select(col(idCol).as("id_b"), col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** SimHash (32-bit) over whitespace tokens from a staged
    * `token_hashes` array column: bit b set iff the majority of token
    * hashes have bit b set. */
  def simhash32Col: Column = expr(
    s"aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, b) -> acc + " +
      s"IF(aggregate(token_hashes, CAST(0 AS BIGINT), " +
      s"(s, h) -> s + IF((shiftright(h, b) & 1) = 1, 1, -1)) > 0, " +
      s"shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))")

  def withTokenHashes(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__clean", expr(s"lower(${TextFunctions.cleanAsciiSql(textCol)})"))
      .withColumn("token_hashes", expr(
        s"transform(${TextFunctions.tokensSql("__clean")}, t -> ${TextFunctions.polyHashSql("t")})"))
      .drop("__clean")

  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    withTokenHashes(df, textCol)
      .select(col(idCol), simhash32Col.as("simhash"))

  /** n-gram Jaccard similarity for a pre-paired frame carrying shingle
    * arrays `sh_a`, `sh_b` (distinct char k-shingles). */
  def jaccardCol: Column = expr(
    "round(CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) / " +
      "(size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b))), 6)")
}
