package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Vector/similarity primitives over `array<float>` embedding columns
  * (SURVEY.md §7.5 similarity search).
  *
  * Dot products fold sequentially in index order with a double
  * accumulator — deterministic and bit-identical to a same-order fold
  * in any IEEE-754 engine (this is what makes the DuckDB oracles exact).
  * The folds are codegen'd Catalyst expressions (`DotProduct`,
  * `LshTableBucket` — register via `GraftFunctions.register`, done by
  * `Tables` and the Knn entry points): identical accumulation order to
  * the interpreted `aggregate(zip_with(...))` SQL they replaced, so
  * every oracle stays bit-exact, at tight-loop speed. */
object VectorFunctions {

  /** Sequential double dot product of two array columns (codegen'd). */
  def dotSql(a: String, b: String): String = s"graft_dot($a, $b)"

  def dot(a: String, b: String): Column = expr(dotSql(a, b))

  /** L2 norm. */
  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"
  def norm(a: String): Column = expr(normSql(a))

  /** Cosine similarity (caller should precompute norms for reuse —
    * see Knn.bruteForceTopK which materializes them once per side). */
  def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})"

  /** Deterministic pseudo-random hyperplane component for LSH:
    * w(j,i) = (((j*dim + i) + 1) * 2654435761) % 1000003 - 501501.
    * Integer-exact in any engine, then used as a double factor. */
  def planeWeightSql(j: String, i: String, dim: Int): String =
    s"CAST((((($j * $dim + $i) + 1) * 2654435761) % 1000003) - 501501 AS DOUBLE)"

  /** Sign-random-projection LSH bucket id over `nPlanes` hyperplanes:
    * bit j = (dot(embedding, plane_j) >= 0). Returns a BIGINT bucket.
    * At scale this turns O(n²) similarity search into a bucket-local
    * join; the plan is a single narrow codegen'd projection per row. */
  def lshBucketSql(embCol: String, dim: Int, nPlanes: Int): String =
    s"graft_lsh_bucket($embCol, 0L, $dim, $nPlanes)"

  def lshBucket(embCol: String, dim: Int, nPlanes: Int): Column =
    expr(lshBucketSql(embCol, dim, nPlanes))

  /** Per-TABLE bucket for multi-table LSH: table `tblCol`'s planes are
    * rows `tbl*nPlanes .. tbl*nPlanes+nPlanes-1` of the same
    * deterministic weight stream (tbl=0 reproduces [[lshBucketSql]]
    * with the same nPlanes). L independent tables is the standard
    * recall lever for sign-random-projection ANN: a true neighbor only
    * needs to collide in ONE of the L tables. */
  def lshBucketTableSql(embCol: String, dim: Int, nPlanes: Int, tblCol: String): String =
    s"graft_lsh_bucket($embCol, $tblCol, $dim, $nPlanes)"
}
