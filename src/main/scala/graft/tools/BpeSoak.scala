package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the batched BPE training loop (round-7 verdict #7:
  * "m driver-sync rounds won't reach a 30k-merge vocabulary").
  *
  * Trains 150 merges over the real sf0.1 documents vocabulary and
  * reports how many driver rounds the batched prefix rule needed —
  * the evidence that the loop's driver-synchronous round count scales
  * like m / batch, not m. Cross-round exactness is covered by the
  * BpeSpec randomized equivalence property (batched == sequential
  * greedy); here exactness at scale is sanity-checked structurally:
  * merge count reached, all merges distinct, and the applied merge
  * table strictly compresses the vocabulary (total subwords after <
  * total chars before, monotone in m).
  *
  * Prints one JSON evidence line; recorded in BASELINE.md.
  */
object BpeSoak {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val m = 150
    // The synthetic corpus has only ~31 distinct whitespace tokens (BPE
    // exhausts near 89 merges), so the soak vocabulary is the
    // DETERMINISTIC pairwise expansion of the real base vocabulary:
    // every 2-word concatenation, frequency mixed from the base
    // frequencies — ~1k words with enough shared substructure to
    // sustain deep merge chains.
    val base = graft.sources.Tables(spark, dir, "documents")
      .select(explode(expr(graft.functions.TextFunctions.tokensSql("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val vocab = base.select(col("word").as("wa"), col("freq").as("fa"))
      .crossJoin(base.select(col("word").as("wb"), col("freq").as("fb")))
      .select(concat(col("wa"), col("wb")).as("word"),
        (pmod(col("fa") * 31 + col("fb"), lit(97)) + 1).as("freq"))
      .groupBy("word").agg(max("freq").as("freq"))
      .localCheckpoint(true)
    val nWords = vocab.count()

    var rounds = 0
    var batchSizes = List.empty[Int]
    val t0 = System.nanoTime()
    val merges = graft.operators.Bpe.train(vocab, "word", "freq", m,
      onRound = { bs => rounds += 1; batchSizes = bs :: batchSizes })
    val trainSec = (System.nanoTime() - t0) / 1e9

    assert(merges.size == m, s"trained ${merges.size} of $m merges")
    assert(merges.map(mg => (mg.a, mg.b)).distinct.size == m, "duplicate merge")
    val applied = graft.operators.Bpe.subwordCounts(vocab, "word", "freq", merges)
      .agg(sum("n_subwords")).head.getLong(0)
    val chars = vocab.agg(sum(length(col("word")))).head.getLong(0)
    assert(applied < chars, s"merges did not compress: $applied !< $chars")

    println(s"""{"soak":"bpe_batched_train","n_words":$nWords,"merges":$m,""" +
      s""""driver_rounds":$rounds,"max_batch":${batchSizes.max},""" +
      s""""subwords_after":$applied,"chars_before":$chars,""" +
      s""""train_sec":${math.round(trainSec * 10) / 10.0}}""")
    spark.stop()
  }
}
