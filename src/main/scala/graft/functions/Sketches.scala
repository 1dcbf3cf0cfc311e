package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Distinct-count sketches.
  *
  * [[KmvAgg]] is a KMV (k-minimum-values) sketch: keep the K smallest
  * distinct values of a uniform hash; with the K-th smallest at h_K,
  * the distinct count is ≈ (K-1)·M/h_K for hashes uniform on [0, M).
  * Same mergeable-state single-pass shape as HyperLogLog (O(K) bytes
  * per group, map-side partial aggregation, executor-side merge), but —
  * unlike HLL, whose register layout differs across implementations —
  * every step is elementary integer arithmetic, so a DuckDB oracle can
  * replay the sketch EXACTLY (distinct hashes → k-th order statistic →
  * integer-division estimate) and the engine's answer is verified
  * bit-for-bit, not just "roughly close". Complements the
  * `approx_count_distinct` (HLL++) surface, which stays rows-only.
  *
  * Reference context: the reference has no sketching surface; this is
  * part of the training-pipeline extension (SURVEY §7.5).
  */
object Kmv {
  val K = 256
  /** Hash modulus 2^31-1 (prime); hashes are uniform on [0, P). */
  val P = 2147483647L
  val A = 2654435761L
  val B = 40503L

  /** Reduce x into [0, P) BEFORE multiplying: A·(x mod P) ≤ ~5.7e18
    * fits a signed 64-bit, whereas A·x overflows for x above ~3.47e9 —
    * Spark would wrap silently (negative hashes) while an oracle
    * engine's BIGINT raises, so the sketch would diverge outside the
    * wrapped range. The double-mod keeps negatives well-defined and
    * the formula replayable verbatim in ANSI SQL. */
  def hash(x: Long): Long = (A * ((x % P + P) % P) + B) % P
}

/** Typed Aggregator: column of longs → KMV distinct-count estimate.
  * Buffer = sorted array of at most K smallest distinct hashes. */
object KmvAgg extends Aggregator[Long, Array[Long], Long] {
  import Kmv._

  def zero: Array[Long] = Array.emptyLongArray

  def reduce(buf: Array[Long], x: Long): Array[Long] = {
    val v = hash(x)
    if (buf.length == K && v >= buf(K - 1)) return buf
    val pos = java.util.Arrays.binarySearch(buf, v)
    if (pos >= 0) return buf // already present
    val ins = -pos - 1
    val n = math.min(buf.length + 1, K)
    val out = new Array[Long](n)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = v
    System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
    out
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, K))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) { val t = a(i); i += 1; t } else { val t = b(j); j += 1; t }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Exact count below K distinct; (K-1)·P/h_K (integer division,
    * division-by-zero guarded) once the sketch is full. */
  def finish(buf: Array[Long]): Long =
    if (buf.length < K) buf.length.toLong
    else (K - 1).toLong * P / math.max(buf(K - 1), 1L)

  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Long] =
    ExpressionEncoder[Long]()
}

/** KMV sketch VALUE aggregator: same buffer as [[KmvAgg]] but the
  * finished output is the sketch itself (sorted array of ≤ K minimum
  * distinct hashes). This is the theta-sketch form of KMV: two sketches
  * support SET OPERATIONS — with θ = min of the two K-th minima (P for
  * a non-full sketch), the entries strictly below θ are a uniform
  * hash-sample of each set, so |A∩B| ≈ |sample_A ∩ sample_B|·P/θ and
  * |A∪B| ≈ |sample_A ∪ sample_B|·P/θ, all in integer arithmetic — a
  * DuckDB oracle replays every step bit-for-bit. The standard use is
  * audience-overlap estimation across segments without rescanning raw
  * rows: sketches are tiny (≤ K longs), mergeable, and storable. */
object KmvSketchAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  def zero: Array[Long] = KmvAgg.zero
  def reduce(buf: Array[Long], x: Long): Array[Long] = KmvAgg.reduce(buf, x)
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = KmvAgg.merge(a, b)
  def finish(buf: Array[Long]): Array[Long] = buf
  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/** Re-aggregation of STORED KMV sketches: input is a sketch (array of
  * hash minima), the reduce step is the sketch MERGE, output is the
  * merged distinct-count estimate. This is the property that makes
  * sketches a storage primitive and not just a query device: per-fine-
  * grain sketches computed once can roll up any hierarchy (nation →
  * region, day → month) without ever rescanning raw rows — the KMV
  * union is exact over sketch states, so the rolled-up estimate equals
  * the estimate a raw rescan at the coarse grain would produce. */
object KmvMergeAgg extends Aggregator[Array[Long], Array[Long], Long] {
  def zero: Array[Long] = KmvAgg.zero
  def reduce(buf: Array[Long], sk: Array[Long]): Array[Long] = KmvAgg.merge(buf, sk)
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = KmvAgg.merge(a, b)
  def finish(buf: Array[Long]): Long = KmvAgg.finish(buf)
  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Long] =
    ExpressionEncoder[Long]()
}
