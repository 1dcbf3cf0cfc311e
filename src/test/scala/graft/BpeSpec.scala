package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** Bpe.train against hand-derivable merges on a tiny vocabulary, and
  * the application table it produces. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // vocab: low 5, lower 2, newest 6, widest 3
  //   pair counts r1: (e,s)=9 (newest+widest), (e,w)=6, (s,t)=9, ...
  //   tie (e,s) vs (s,t) vs others broken lexicographically
  private def vocab = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)
  ).toDF("word", "freq")

  test("greedy merges follow weighted pair counts with lexicographic ties") {
    val merges = Bpe.train(vocab, "word", "freq", 3)
    assert(merges.length === 3)
    // round 1: (e,s) and (s,t) both 9; (e,s) < (s,t) lexicographically
    assert((merges(0).a, merges(0).b) === ("e", "s"))
    // round 2: (es,t) now 9 — es<t... compare against all remaining pairs
    assert((merges(1).a, merges(1).b) === ("es", "t"))
    // round 3: (l,o) = 7 (low 5 + lower 2) beats everything else
    assert((merges(2).a, merges(2).b) === ("l", "o"))
  }

  test("subword counts reflect the applied merges") {
    val merges = Bpe.train(vocab, "word", "freq", 3)
    val got = Bpe.subwordCounts(vocab, "word", "freq", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // low -> lo w (2), lower -> lo w e r (4),
    // newest -> n e w est (4), widest -> w i d est (4)
    assert(got === Map("low" -> 2L, "lower" -> 4L, "newest" -> 4L, "widest" -> 4L))
  }

  test("training rejects a non-positive merge count") {
    intercept[IllegalArgumentException] { Bpe.train(vocab, "word", "freq", 0) }
  }
}
