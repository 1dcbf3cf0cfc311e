package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned-merges BPE: deterministic byte-pair-encoding training over
  * a (word, freq) vocabulary, and application of the learned merges to
  * re-segment text — so token budgets are counted in MERGED tokens,
  * the unit real pipelines budget in, not regex pre-tokens.
  *
  * Training is the classic greedy loop: count adjacent symbol pairs
  * across the vocabulary (weighted by corpus word frequency), merge
  * the most frequent pair everywhere, repeat. Every quantity is an
  * integer and the argmax tie-break is total (count desc, pair asc),
  * so a SQL oracle replays the whole training as an unrolled CTE
  * chain bit-for-bit — same discipline as the trained-IVF round.
  *
  * Scale shape: the symbol state lives on the VOCABULARY (distinct
  * words + frequencies — dictionary-sized, like `CnicsCsv` code
  * lists), not on the corpus; each round is one narrow pair-explode +
  * map-side-combined count, and only the single argmax row comes to
  * the driver (metadata-sized, the `Dedup.dropHotBuckets` precedent).
  * Applying the merges to a 100 TB corpus is a broadcast join of the
  * final word → n_subwords table against the token stream.
  *
  * Symbol sequences are encoded as delimiter-framed strings
  * (U+001F-framed: `<D>sym<D><D>sym<D>...`): pair replacement is then a
  * plain left-to-right `replace`, which Spark and any oracle engine
  * execute identically, and the frame cannot collide with corpus
  * text because the tokenizer strips non-printable ASCII.
  *
  * Reference context: no tokenizer surface in the reference;
  * LLM-pipeline extension (SURVEY §7.5, round-5 verdict item 6).
  */
object Bpe {

  /** Symbol delimiter: outside the printable-ASCII alphabet the
    * tokenizer emits, so framing can never collide with data. */
  val D = "\u001F"

  final case class Merge(rank: Int, a: String, b: String)

  /** Initial symbolization: word → framed char sequence. The empty
    * word is guarded explicitly: Spark's `sequence(1, 0)` is
    * DESCENDING ([1, 0]), which would fabricate two phantom symbols
    * instead of none. */
  def encodeChars(words: DataFrame, wordCol: String): DataFrame =
    words.withColumn("enc",
      concat(lit(D),
        array_join(
          when(length(col(wordCol)) > 0,
            expr(s"transform(sequence(1, length($wordCol)), i -> substring($wordCol, i, 1))"))
            .otherwise(expr("CAST(array() AS array<string>)")),
          D + D),
        lit(D)))

  private def symsCol = split(
    col("enc").substr(lit(2), length(col("enc")) - 2), D + D)

  /** Ranked pairs collected per training round — the per-round driver
    * traffic is ≤ this many metadata rows, and the batch of merges
    * accepted per round is ≤ this. 256 keeps a 30k-merge vocabulary
    * within ~hundreds of driver-sync rounds instead of 30k. */
  val RoundTopK: Int = 256

  /** Train `m` merges on a (word, freq) vocabulary. Returns the merge
    * table in training order.
    *
    * BATCHED greedy, bit-identical to the one-merge-at-a-time loop:
    * each driver round collects the top-[[RoundTopK]] ranked pairs
    * (cnt desc, a asc, b asc — metadata-sized) and accepts a PREFIX of
    * that ranking such that (1) accepted pairs are pairwise disjoint
    * in symbol SPELLING (a, b, and the concatenation a+b all unseen —
    * spelling, not symbol identity, because the framed-string encoding
    * aliases a merged `ab` with any pre-existing symbol spelled "ab"),
    * and (2) every accepted pair after the head counts STRICTLY above
    * the first conflicting candidate (or the collection horizon).
    *
    * Why that equals sequential greedy: merging a pair only changes
    * counts of pairs whose spelling involves a, b, or ab — every newly
    * created pair maps occurrence-for-occurrence onto an old pair
    * sharing a spelling ((x,ab) ↤ (x,a), (ab,y) ↤ (b,y), (ab,ab) ↤
    * (b,a)), and every such sharing pair ranks at or below the first
    * conflict, so new-pair counts are ≤ the conflict bound. The strict
    * `cnt > bound` rule then keeps every still-pending accepted pair
    * above anything a merge can create or change — including on TIES,
    * where a renamed pair ((cd,cc) → (bacccd,cc)) can relocate
    * lexicographically ABOVE a pending equal-count pair (the case a
    * plain disjoint-prefix rule gets wrong; caught by the randomized
    * equivalence property in BpeSpec). Untouched pairs keep both count
    * and spelling, so the total order among them cannot reshuffle.
    *
    * Each round applies its batch as one chained replace + one
    * checkpoint; the ranking head is always accepted (it IS the
    * sequential argmax), so progress is guaranteed and driver rounds
    * collapse from m toward ~m/batch. */
  def train(vocab: DataFrame, wordCol: String, freqCol: String, m: Int,
      onRound: Int => Unit = _ => ()): Seq[Merge] = {
    require(m >= 1, s"merge count must be >= 1: $m")
    var enc = encodeChars(
      vocab.select(col(wordCol).as("word"), col(freqCol).cast("long").as("freq")),
      "word")
      .select("word", "freq", "enc")
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var exhausted = false
    while (merges.size < m && !exhausted) {
      val top = enc
        .withColumn("syms", symsCol)
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(
          expr("transform(sequence(0, size(syms) - 2), " +
            "i -> named_struct('a', syms[i], 'b', syms[i + 1]))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(RoundTopK)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set[String]()
        val prefix = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        var conflictCnt: Option[Long] = None
        var open = true
        top.iterator.takeWhile(_ => open).foreach { row =>
          val (a, b, c) = (row.getString(0), row.getString(1), row.getLong(2))
          if (used(a) || used(b) || used(a + b)) { conflictCnt = Some(c); open = false }
          else if (merges.size + prefix.size < m) {
            prefix += ((a, b, c)); used += a; used += b; used += (a + b)
          } else {
            // m-cap cut: the row we stop AT bounds pending merges the
            // same way a conflict row does — without recording it, a
            // cap-truncated batch could accept a tie-count pair that an
            // earlier batch merge would have renamed ahead of it,
            // diverging from one-at-a-time greedy.
            conflictCnt = Some(c); open = false
          }
        }
        // bound below which a pending merge could be overtaken by a pair
        // some earlier batch merge creates or renames
        val bound = conflictCnt.getOrElse(
          if (top.length == RoundTopK) top.last.getLong(2) else Long.MinValue)
        val batch = prefix.head +: prefix.tail.takeWhile(_._3 > bound)
        batch.foreach { case (a, b, _) =>
          merges += Merge(merges.size + 1, a, b)
          enc = enc.withColumn("enc",
            org.apache.spark.sql.functions.replace(col("enc"),
              lit(D + a + D + D + b + D), lit(D + a + b + D)))
        }
        onRound(batch.size)
        enc = enc.localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** word → subword count after applying `merges` (the application
    * table a corpus join consumes). */
  def subwordCounts(vocab: DataFrame, wordCol: String, freqCol: String,
      merges: Seq[Merge]): DataFrame = {
    var enc = encodeChars(
      vocab.select(col(wordCol).as("word"), col(freqCol).cast("long").as("freq")),
      "word")
    merges.foreach { mg =>
      enc = enc.withColumn("enc",
        org.apache.spark.sql.functions.replace(col("enc"),
          lit(D + mg.a + D + D + mg.b + D), lit(D + mg.a + mg.b + D)))
    }
    enc.select(col("word"), size(symsCol).cast("long").as("n_subwords"))
  }
}
