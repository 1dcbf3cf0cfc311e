package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Semi-join reduction via a Bloom runtime filter — the standard trick
  * for big⋈big joins where one side is made selective by its local
  * predicates: sketch the selective side's join keys into a Bloom
  * bitmap, broadcast the bitmap, and drop probe-side rows that cannot
  * match BEFORE they reach the join shuffle. At 100 TB the shuffle of
  * the unfiltered fact side IS the cost; a 128 KiB bitmap that prunes
  * 95% of it is the difference between a job and an incident. (Spark's
  * own InjectRuntimeFilter plans the same shape for DPP-ineligible
  * joins; this operator makes it explicit, tunable, and usable on any
  * frame, not just where the optimizer's heuristics fire.)
  *
  * No false negatives, so semantics are exactly those of the underlying
  * join — false positives only cost work, which the real join then
  * discards. Everything is engine-native and codegen'd: the bitmap is
  * built by a typed [[Aggregator]] (map-side partial merge of OR-able
  * word arrays), travels as a broadcast 1-row frame (never through the
  * driver), and the probe is `xxhash64` + bit arithmetic on an array
  * column — builtin expressions end to end.
  *
  * Reference context: no sketch surface in the reference; part of the
  * training-pipeline extension (SURVEY §7.5).
  */
object BloomJoin {
  /** 2^20 bits = 16 Ki longs = 128 KiB; with k=4 hashes the false-
    * positive rate is <3% up to ~10^5 distinct keys. Both constants are
    * compile-time so the probe expression stays literal-foldable. */
  val NumBits: Int = 1 << 20
  val NumHashes: Int = 4
  val Words: Int = NumBits / 64
  private val Seed = 42L // xxhash64's default seed — must match the SQL function

  @inline private def wordIdx(h1: Long, h2: Long, i: Int): (Int, Int) = {
    val pos = ((h1 + i * h2) & (NumBits - 1)).toInt
    (pos >>> 6, pos & 63)
  }

  /** Split one xxhash64 into the double-hashing pair (g_i = h1 + i·h2,
    * h2 forced odd so all k probes differ). */
  @inline private def splitHash(h: Long): (Long, Long) =
    (h >>> 32, (h & 0xffffffffL) | 1L)

  /** Typed Aggregator: long keys → Bloom bitmap as Array[Long]. */
  object BloomAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](Words)
    def reduce(buf: Array[Long], x: Long): Array[Long] = {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(x, Seed)
      val (h1, h2) = splitHash(h)
      var i = 0
      while (i < NumHashes) {
        val (w, b) = wordIdx(h1, h2, i)
        buf(w) |= (1L << b)
        i += 1
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < Words) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** 1-row frame holding the bitmap of `keyCol` (cast to long) — the
    * broadcastable build product. */
  def buildFrame(build: DataFrame, keyCol: String): DataFrame = {
    val agg = udaf(BloomAgg)
    build.agg(agg(col(keyCol).cast("long")).as("__bf"))
  }

  /** Probe-side pre-filter: keep rows whose key might be in the build
    * set. Exact-join semantics are preserved (no false negatives).
    * The key hash is hoisted into a projection BELOW the (1-row) cross
    * join — Catalyst folds the membership test into the join condition,
    * where common-subexpression elimination does not reach, so an
    * inline hash would be recomputed per probe term. */
  def filterByBloom(probe: DataFrame, keyCol: String, bloom: DataFrame): DataFrame =
    probe.withColumn("__bh", xxhash64(col(keyCol).cast("long")))
      .crossJoin(broadcast(bloom))
      .filter(mightContainSql("__bh", "__bf"))
      .drop("__bf", "__bh")

  /** `might_contain` over the broadcast bitmap column, as builtin
    * expressions over the precomputed hash column — codegen'd bit
    * arithmetic. Written as SQL text because `shiftleft` with a column
    * shift amount is SQL-only (the DSL overload takes a literal Int). */
  private def mightContainSql(hashCol: String, bf: String): Column = {
    val h1 = s"shiftrightunsigned(`$hashCol`, 32)"
    val h2 = s"((`$hashCol` & 4294967295) | 1)"
    val terms = (0 until NumHashes).map { i =>
      val pos = s"(($h1 + ${i}L * $h2) & ${(NumBits - 1).toLong})"
      s"(element_at(`$bf`, cast($pos div 64 as int) + 1) & shiftleft(1L, cast($pos % 64 as int))) != 0"
    }
    expr(terms.mkString("(", " AND ", ")"))
  }
}
