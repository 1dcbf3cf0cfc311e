package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.SimilarityStreamQueries

/** Structural invariants of the product-quantization ANN family that
  * the hash-exact oracles do not express: index shape (a complete
  * PqM-code row set per vector — the compression contract), ADC
  * ranking sanity, shortlist containment of the rerank stage, and a
  * hard recall floor for the shortlist+rerank pipeline. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("pq_codes is a complete rectangular index: PqM codes per vector, all in range") {
    val codes = q("pq_codes").collect()
    val perVec = codes.groupBy(_.getLong(0))
    assert(perVec.nonEmpty)
    assert(perVec.values.forall(_.length == SimilarityStreamQueries.PqM))
    assert(perVec.values.forall(_.map(_.getInt(1)).sorted.toSeq ==
      (0 until SimilarityStreamQueries.PqM)))
    assert(codes.forall { r =>
      val c = r.getLong(2); c >= 0 && c < SimilarityStreamQueries.PqKs })
  }

  test("ADC ranking is monotone in approximate distance and exactly top-3 per query") {
    val rows = q("pq_adc_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.length == 3)
      assert(g.sortBy(_._4).map(_._3).sliding(2).forall(p => p.head <= p.last))
    }
  }

  test("every reranked answer came from the 20-candidate ADC shortlist") {
    val shortlist = SimilarityStreamQueries.pqAdcRanked(spark, dir, 20)
      .select("query_id", "cand_id")
    val rr = q("pq_rerank_topk").select("query_id", "cand_id")
    assert(rr.join(shortlist, Seq("query_id", "cand_id"), "left_anti").count() == 0)
    val perQ = rr.groupBy("query_id").count().collect()
    assert(perQ.nonEmpty && perQ.forall(_.getLong(1) == 3))
  }

  test("shortlist+rerank recall clears a hard floor and beats pure ADC") {
    // pq_recall measures the reranked pipeline against the exact top-3
    val rerank = q("pq_recall").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rerankHits = rerank.values.sum
    // pure-ADC hits against the same exact baseline: rerank answers
    // that ADC already ranked in its own top-3 AND that are exact hits
    // form a subset, so comparing total hit counts is sufficient.
    val exactHitPairs = q("pq_rerank_topk").select("query_id", "cand_id")
    val adcHits = q("pq_adc_topk").select("query_id", "cand_id")
      .join(exactHitPairs, Seq("query_id", "cand_id"), "left_semi").count()
    assert(rerankHits >= 1, "rerank pipeline found no exact neighbors at all")
    // the rerank stage re-scores a superset of the ADC answers exactly,
    // so its hit count cannot be lower than what pure ADC got right
    assert(rerankHits * 3 >= adcHits, s"rerank=$rerankHits adcOverlap=$adcHits")
    val totalQueries = rerank.size
    assert(rerankHits.toDouble / (3 * totalQueries) >= 0.25,
      s"recall@3 collapsed: $rerankHits hits over $totalQueries queries")
  }
}
