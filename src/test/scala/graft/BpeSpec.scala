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

  test("batched training equals one-merge-at-a-time greedy on random vocabularies") {
    // pure-Scala sequential reference: the classic loop, one argmax per
    // round, same total order (cnt desc, a asc, b asc) and the same
    // left-to-right non-overlapping pair replacement as Spark's replace
    def mergePair(syms: Vector[String], a: String, b: String): Vector[String] = {
      val buf = Vector.newBuilder[String]; var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { buf += (a + b); i += 2 }
        else { buf += syms(i); i += 1 }
      }
      buf.result()
    }
    def seqBpe(words: Seq[(String, Long)], m: Int): Seq[(String, String)] = {
      var enc = words.map { case (w, f) => (w.map(_.toString).toVector, f) }
      val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
      var done = false
      while (out.size < m && !done) {
        val counts = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
        for ((syms, f) <- enc; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) += f
        if (counts.isEmpty) done = true
        else {
          val (a, b) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
          out += ((a, b))
          enc = enc.map { case (syms, f) => (mergePair(syms, a, b), f) }
        }
      }
      out.toSeq
    }
    // small alphabet + repeated motifs force interacting merges (the
    // case where an unsound batch would diverge from sequential greedy)
    val rnd = new scala.util.Random(11)
    (0 until 3).foreach { trial =>
      val words = (1 to 30).map { _ =>
        val len = 1 + rnd.nextInt(8)
        (Seq.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString, (1L + rnd.nextInt(9)))
      }.distinct
      val df = words.toDF("word", "freq")
      val got = Bpe.train(df, "word", "freq", 25).map(mg => (mg.a, mg.b))
      val want = seqBpe(words, 25)
      assert(got === want, s"trial $trial vocab $words")
    }
  }
}
