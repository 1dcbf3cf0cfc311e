package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of content-defined chunking that the hash-exact oracle
  * cannot express: losslessness, boundary agreement with a brute-force
  * window-hash recompute, and the defining CDC property — an insertion
  * near the head of a document leaves every downstream chunk
  * byte-identical (boundaries re-synchronize), where fixed-offset
  * windows would shift everything. */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunks(text: String): Seq[(Int, Int, String)] = {
    graft.functions.GraftFunctions.register(spark)
    Seq(text).toDF("text")
      .select(expr("graft_cdc_chunks(text, 16, 64)").as(Seq("chunk_idx", "start", "chunk")))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sortBy(_._1).toSeq
  }

  // deterministic pseudo-random printable text
  private def mkText(n: Int, seed: Long): String = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
  }

  test("chunks are lossless: concatenation rebuilds the trimmed document in order") {
    val doc = mkText(3000, 7L).trim
    val cs = chunks(doc)
    assert(cs.map(_._3).mkString == doc)
    // starts are consistent 1-based offsets
    assert(cs.head._2 == 1)
    cs.sliding(2).foreach {
      case Seq(a, b) => assert(b._2 == a._2 + a._3.length)
      case _ =>
    }
  }

  test("boundaries match a brute-force per-window hash recompute") {
    val doc = mkText(2500, 42L).trim
    val B = 257L; val P = 1000003L
    def winHash(s: String, end: Int): Long = { // hash of s(end-16, end)
      var h = 0L
      (end - 16 until end).foreach(i => h = (h * B + s.charAt(i)) % P)
      h
    }
    val expected = (16 to doc.length).filter(p => winHash(doc, p) % 64 == 0)
    val cutsFromChunks = chunks(doc).map(c => c._2 + c._3.length - 1)
      .filter(_ < doc.length) // interior cuts only (doc end is forced)
    assert(cutsFromChunks == expected.filter(_ < doc.length))
  }

  test("CDC property: an insertion shifts no downstream chunk") {
    val base = mkText(4000, 99L).trim
    val edited = ("@@@" + base).trim
    val a = chunks(base).map(_._3)
    val b = chunks(edited).map(_._3)
    // every chunk of the original except the head chunk survives the
    // insertion byte-identically (boundaries re-synchronize)
    val bSet = b.toSet
    val surviving = a.tail.count(bSet.contains)
    assert(a.length >= 10, s"corpus too short for the property: ${a.length} chunks")
    assert(surviving == a.tail.length,
      s"expected all ${a.tail.length} downstream chunks to survive, got $surviving")
  }

  test("degenerate inputs: short docs are one chunk, blank docs are none") {
    assert(chunks("short") == Seq((0, 1, "short")))
    assert(chunks("   ") == Seq.empty)
    assert(chunks("") == Seq.empty)
  }
}
