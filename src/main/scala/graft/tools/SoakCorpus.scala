package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared soak-tool helpers: ONE spelling of the deterministic vector
  * corpus (and the timing/ranking utilities every vector soak wraps
  * around it), so a distribution change can never leave two soaks
  * silently measuring different corpora. Pseudo-floats are in [-1, 1]
  * at 1e-3 granularity — the e6 quantization the engine applies is
  * exact on them, so closed forms replay exactly. */
object SoakCorpus {

  /** FRONT-LOADED corpus: component d is damped by 1/(1 + d/8), so
    * energy concentrates in the leading dimensions — the Matryoshka /
    * coarse-quantizer-friendly shape (MRL prefix passes and IVF
    * centroids explain real variance on it). (vec_id, embedding). */
  def frontLoaded(spark: SparkSession, nVecs: Long): DataFrame =
    spark.range(0, nVecs)
      .select(col("id").as("vec_id"),
        expr("""transform(sequence(0, 63), d ->
          CAST(((pmod(id * 2654435761L + d * 7919L, 2001L) - 1000L) / 1000.0D)
               / (1.0D + d / 8.0D) AS FLOAT))""")
          .as("embedding"))
      .repartition(64)
      .localCheckpoint(true)

  /** FLAT corpus: undamped components (near-isotropic — the
    * adversarial case for prefix/residual methods), with the label
    * column EmbSoak's closed forms group by. (vec_id, label,
    * embedding). */
  def flat(spark: SparkSession, nVecs: Long): DataFrame =
    spark.range(0, nVecs)
      .select(col("id").as("vec_id"), (col("id") % 8).as("label"),
        expr("""transform(sequence(0, 63), d ->
          CAST((pmod(id * 2654435761L + d * 7919L, 2001L) - 1000L) / 1000.0D AS FLOAT))""")
          .as("embedding"))
      .repartition(64)
      .localCheckpoint(true)

  def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  /** (query_id, cand_id, score: long, rnk) rankings as a set — the
    * ADC-family serve output shape. */
  def rank4Long(df: DataFrame): Set[(Long, Long, Long, Int)] = df
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

  /** (query_id, cand_id, score: double, rnk) rankings as a set — the
    * cosine-family serve output shape. */
  def rank4Double(df: DataFrame): Set[(Long, Long, Double, Int)] = df
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  /** Recursive on-disk size of a store directory. */
  def dirBytes(p: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(p))
  }
}
