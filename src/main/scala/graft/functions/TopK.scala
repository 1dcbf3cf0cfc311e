package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Bounded top-k per group as a typed Aggregator, generic in the
  * payload carried alongside the score.
  *
  * The window formulation of "top k per group" (`row_number() OVER
  * (PARTITION BY g ORDER BY score)` then `<= k`) must SORT every row of
  * every group after a full shuffle. This Aggregator keeps only the k
  * best (score desc, payload asc) entries in its buffer, so the heavy
  * reduction happens MAP-SIDE (partial ObjectHashAggregate) and the
  * shuffle carries O(k) entries per group per mapper instead of the
  * whole group — the shape a trillion-row fact table needs. Output is
  * the sorted top-k array; callers posexplode it back to rows.
  *
  * Determinism: total order on (score desc, payload asc) — ties cannot
  * reorder across partitionings. Scores compare via
  * `java.lang.Double.compare` — the SAME total order Spark SQL's sort
  * uses for doubles (SQLOrderingUtil), so NaN sorts greatest like a
  * SQL DESC ordering instead of silently never-winning as primitive
  * `>` would have it, and the buffer's sortedness invariant holds for
  * every input. Scores must be STORED values (no float arithmetic
  * happens here), so comparisons are exact and any engine agrees.
  *
  * Reference context: no grouped-top-k surface in the reference; part
  * of the general-analytics extension (SURVEY §7.5).
  */
class TopKAgg[P](val k: Int)(implicit ordP: Ordering[P],
    bufEnc: Encoder[Array[(Double, P)]])
    extends Aggregator[(Double, P), Array[(Double, P)], Array[(Double, P)]] {
  require(k > 0, s"k must be positive: $k")

  // ordering: better = higher score (Double total order), then smaller payload
  private def beats(a: (Double, P), b: (Double, P)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && ordP.lt(a._2, b._2))
  }

  def zero: Array[(Double, P)] = Array.empty

  def reduce(buf: Array[(Double, P)], x: (Double, P)): Array[(Double, P)] = {
    if (buf.length == k && !beats(x, buf(k - 1))) return buf
    var ins = buf.length
    var i = 0
    while (i < buf.length) { if (beats(x, buf(i))) { ins = i; i = buf.length } else i += 1 }
    val n = math.min(buf.length + 1, k)
    val out = new Array[(Double, P)](n)
    System.arraycopy(buf, 0, out, 0, math.min(ins, n))
    if (ins < n) {
      out(ins) = x
      System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
    }
    out
  }

  def merge(a: Array[(Double, P)], b: Array[(Double, P)]): Array[(Double, P)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[(Double, P)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length) {
      val takeA = j >= b.length || (i < a.length && beats(a(i), b(j)))
      out(n) = if (takeA) { val t = a(i); i += 1; t } else { val t = b(j); j += 1; t }
      n += 1
    }
    out
  }

  def finish(buf: Array[(Double, P)]): Array[(Double, P)] = buf

  def bufferEncoder: Encoder[Array[(Double, P)]] = bufEnc
  def outputEncoder: Encoder[Array[(Double, P)]] = bufEnc
}

object TopKAgg {
  /** Long-payload form (score, id) — source-compatible with existing
    * `TopKAgg(k)` call sites. */
  def apply(k: Int): TopKAgg[Long] = longs(k)

  def longs(k: Int): TopKAgg[Long] =
    new TopKAgg[Long](k)(Ordering.Long, ExpressionEncoder[Array[(Double, Long)]]())

  /** Code-point order == binary UTF-8 byte order — the collation
    * Spark's UTF8String and oracle engines actually compare VARCHARs
    * with. Java's String.compareTo is UTF-16 code-UNIT order instead,
    * which ranks supplementary characters (surrogate pairs, 0xD800+)
    * BELOW U+E000..U+FFFF — a tie-break there would silently diverge
    * from a row_number oracle on non-BMP keys. */
  private[functions] val codePointOrdering: Ordering[String] =
    new Ordering[String] {
      def compare(a: String, b: String): Int = {
        var i = 0
        var j = 0
        var res = 0
        while (res == 0 && i < a.length && j < b.length) {
          val ca = a.codePointAt(i)
          val cb = b.codePointAt(j)
          if (ca != cb) res = Integer.compare(ca, cb)
          else { i += Character.charCount(ca); j += Character.charCount(cb) }
        }
        if (res != 0) res else Integer.compare(a.length - i, b.length - j)
      }
    }

  /** String-payload form (score, key) — code-point (binary UTF-8)
    * ordering, the collation Spark and oracle engines give VARCHAR. */
  def strings(k: Int): TopKAgg[String] =
    new TopKAgg[String](k)(codePointOrdering, ExpressionEncoder[Array[(Double, String)]]())
}

/** Payload-DISTINCT bounded top-k: [[TopKAgg]] whose buffer never holds
  * a payload twice — the aggregation-state form of the batch
  * `.distinct()` on candidate pairs, for STREAMING plans where a
  * blocking distinct is unavailable and the same candidate arrives once
  * per colliding LSH table. Exactness contract: the payload determines
  * the score (re-arrivals carry the same score, true for any
  * (query, candidate) → cosine pairing), so dropping a re-arrival —
  * whether the payload currently sits in the buffer or was already
  * evicted by k better ones — never changes the distinct top-k. */
class TopKDistinctAgg[P](k: Int)(implicit ordP: Ordering[P],
    bufEnc: Encoder[Array[(Double, P)]])
    extends Aggregator[(Double, P), Array[(Double, P)], Array[(Double, P)]] {
  private val inner = new TopKAgg[P](k)
  def zero: Array[(Double, P)] = inner.zero
  // distinctness rides the payload ORDERING's equivalence, not ==: a
  // payload carrying an Array field (CodeEntry) compares by reference
  // under ==, which would silently never dedupe; every payload ordering
  // here keys on the candidate id, which is exactly the distinctness
  // the serving plans mean (identical for Long payloads, where equiv
  // IS value equality)
  def reduce(buf: Array[(Double, P)], x: (Double, P)): Array[(Double, P)] =
    if (buf.exists(e => ordP.equiv(e._2, x._2))) buf else inner.reduce(buf, x)
  def merge(a: Array[(Double, P)], b: Array[(Double, P)]): Array[(Double, P)] =
    b.foldLeft(a)(reduce)
  def finish(buf: Array[(Double, P)]): Array[(Double, P)] = buf
  def bufferEncoder: Encoder[Array[(Double, P)]] = bufEnc
  def outputEncoder: Encoder[Array[(Double, P)]] = bufEnc
}

object TopKDistinctAgg {
  def longs(k: Int): TopKDistinctAgg[Long] =
    new TopKDistinctAgg[Long](k)(Ordering.Long, ExpressionEncoder[Array[(Double, Long)]]())
}

/** Heap payload carrying a candidate's FULL vector (id, full-dim norm,
  * embedding) alongside its cheap-pass score — the single-aggregation
  * MRL serving shape: the bounded heap prunes on the prefix score and
  * only the ≤k SURVIVORS keep their embedding alive, so the exact
  * full-dim rescore after the aggregate is a row-local array transform
  * (no second shuffle, no join-back — streaming-legal). Ordering is by
  * id only (ids are unique within a group), matching the (score desc,
  * cand_id asc) window tie contract. */
final case class VecEntry(id: Long, fn: Double, emb: Array[Float])

object VecEntry {
  implicit val ordById: Ordering[VecEntry] = Ordering.by(_.id)
}

object TopKVecAgg {
  def apply(k: Int): TopKAgg[VecEntry] =
    new TopKAgg[VecEntry](k)(VecEntry.ordById,
      ExpressionEncoder[Array[(Double, VecEntry)]]())
}

/** Heap payload carrying a candidate's PACKED quantized codes (id,
  * codes) alongside its shortlist score — the single-aggregation
  * refine-at-serve shape ([[VecEntry]]'s compressed twin): the bounded
  * heap prunes on the cheap ADC estimate and only the ≤shortlist
  * SURVIVORS keep their rerank codes alive, so the refine stage after
  * the aggregate is a row-local array transform (no second stateful
  * op — streaming-legal). Ordering is by id only (ids are unique
  * within a group), matching the (score desc, cand_id asc) tie
  * contract; the DISTINCT variant dedupes on the same id ordering. */
final case class CodeEntry(id: Long, codes: Array[Int])

object CodeEntry {
  implicit val ordById: Ordering[CodeEntry] = Ordering.by(_.id)
}

object TopKCodesAgg {
  def apply(k: Int): TopKDistinctAgg[CodeEntry] =
    new TopKDistinctAgg[CodeEntry](k)(CodeEntry.ordById,
      ExpressionEncoder[Array[(Double, CodeEntry)]]())
}
