package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Bounded top-k per group as a typed Aggregator.
  *
  * The window formulation of "top k per group" (`row_number() OVER
  * (PARTITION BY g ORDER BY score)` then `<= k`) must SORT every row of
  * every group after a full shuffle. This Aggregator keeps only the k
  * best (score desc, id asc) entries in its buffer, so the heavy
  * reduction happens MAP-SIDE (partial ObjectHashAggregate) and the
  * shuffle carries O(k) entries per group per mapper instead of the
  * whole group — the shape a trillion-row fact table needs. Output is
  * the sorted top-k array; callers posexplode it back to rows.
  *
  * Determinism: total order on (score desc, id asc) — ties cannot
  * reorder across partitionings. Scores must be STORED values (no
  * float arithmetic happens here), so comparisons are exact and any
  * engine agrees.
  *
  * Reference context: no grouped-top-k surface in the reference; part
  * of the general-analytics extension (SURVEY §7.5).
  */
case class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {
  require(k > 0, s"k must be positive: $k")

  // ordering: better = higher score, then smaller id
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def zero: Array[(Double, Long)] = Array.empty

  def reduce(buf: Array[(Double, Long)], x: (Double, Long)): Array[(Double, Long)] = {
    if (buf.length == k && !beats(x, buf(k - 1))) return buf
    var ins = buf.length
    var i = 0
    while (i < buf.length) { if (beats(x, buf(i))) { ins = i; i = buf.length } else i += 1 }
    val n = math.min(buf.length + 1, k)
    val out = new Array[(Double, Long)](n)
    System.arraycopy(buf, 0, out, 0, math.min(ins, n))
    if (ins < n) {
      out(ins) = x
      System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
    }
    out
  }

  def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[(Double, Long)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length) {
      val takeA = j >= b.length || (i < a.length && beats(a(i), b(j)))
      out(n) = if (takeA) { val t = a(i); i += 1; t } else { val t = b(j); j += 1; t }
      n += 1
    }
    out
  }

  def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf

  def bufferEncoder: org.apache.spark.sql.Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
}
