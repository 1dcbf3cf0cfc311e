package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for [[graft.operators.Components.mergeIncremental]]: the
  * incremental cluster fold against a full rebuild on a ~2.1M-edge
  * graph with CLOSED-FORM answers (the GraphSoak construction):
  *
  *  - stored state: connected components of the perfect binary tree
  *    over ids 1..2²¹−1 (one component, label 1);
  *  - batch: the 131k-edge mega-hub (node 0 → every id ≡ 0 mod 16) —
  *    the worst case for the CONTRACTED graph too, since every batch
  *    edge maps onto the single stored label and the batch CC sees a
  *    131k-edge star;
  *  - closed form after the fold: every tree vertex plus the hub moves
  *    to component 0 (the hub id is the new global minimum).
  *
  * Also folds a DISJOINT second batch (fresh chain 10M..10M+999) to
  * check first-seen vertices and untouched-store passthrough at scale.
  * Prints one JSON evidence line (exactness + fold wall vs full
  * rebuild wall); recorded in BASELINE.md.
  */
object IncrCcSoak {
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

    val n = 1L << 21
    val tree = spark.range(2, n).select(expr("id div 2").as("a"), col("id").as("b"))
    val hub = spark.range(16, n).filter(col("id") % 16 === 0)
      .select(lit(0L).as("a"), col("id").as("b"))
    val chain = spark.range(10000000L, 10000999L)
      .select(col("id").as("a"), (col("id") + 1).as("b"))

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (stored, storedSec) = timed {
      graft.operators.Components.connectedComponents(tree, "a", "b")
        .localCheckpoint(true)
    }
    assert(stored.filter(col("component") =!= 1L).count() == 0L, "tree label != 1")

    // fold 1: the mega-hub batch — merges the whole store into comp 0
    val (folded, foldSec) = timed {
      graft.operators.Components.mergeIncremental(stored, hub, "a", "b")
        .localCheckpoint(true)
    }
    val nFold = folded.count()
    assert(nFold == n, s"fold vertex count $nFold != $n") // ids 1..n-1 plus hub vertex 0
    assert(folded.filter(col("component") =!= 0L).count() == 0L, "fold label != 0")

    // fold 2: disjoint fresh chain — store must pass through untouched
    val (folded2, fold2Sec) = timed {
      graft.operators.Components.mergeIncremental(folded, chain, "a", "b")
        .localCheckpoint(true)
    }
    assert(folded2.count() == n + 1000, "chain vertices missing")
    assert(folded2.filter(col("id") < 10000000L && col("component") =!= 0L).count() == 0L)
    assert(folded2.filter(col("id") >= 10000000L && col("component") =!= 10000000L).count() == 0L)

    // the comparison bar: a from-scratch rebuild over all edges
    val (full, fullSec) = timed {
      graft.operators.Components
        .connectedComponents(tree.unionAll(hub).unionAll(chain), "a", "b")
        .localCheckpoint(true)
    }
    assert(full.count() == n + 1000)

    val nEdges = tree.count() + hub.count() + chain.count()
    def f(v: Double) = math.round(v * 100) / 100.0
    println(s"""{"soak":"incremental_cc","n_edges":$nEdges,"stored_sec":${f(storedSec)},""" +
      s""""fold_hub_sec":${f(foldSec)},"fold_chain_sec":${f(fold2Sec)},""" +
      s""""full_rebuild_sec":${f(fullSec)},"checks":"all-exact"}""")
    spark.stop()
  }
}
