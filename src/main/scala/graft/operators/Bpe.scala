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

  /** Train `m` merges on a (word, freq) vocabulary. Returns the merge
    * table in training order; each round collects exactly one argmax
    * row (metadata), never vocabulary rows. */
  def train(vocab: DataFrame, wordCol: String, freqCol: String, m: Int): Seq[Merge] = {
    require(m >= 1, s"merge count must be >= 1: $m")
    var enc = encodeChars(
      vocab.select(col(wordCol).as("word"), col(freqCol).cast("long").as("freq")),
      "word")
      .select("word", "freq", "enc")
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    for (r <- 1 to m) {
      val top = enc
        .withColumn("syms", symsCol)
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(
          expr("transform(sequence(0, size(syms) - 2), " +
            "i -> named_struct('a', syms[i], 'b', syms[i + 1]))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.nonEmpty) {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(r, a, b)
        enc = enc
          .withColumn("enc",
            org.apache.spark.sql.functions.replace(col("enc"),
              lit(D + a + D + D + b + D), lit(D + a + b + D)))
          .localCheckpoint(true)
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
