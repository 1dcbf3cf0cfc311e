package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Numeric-integrity soak for [[graft.operators.EmbStats]] at 400×
  * the fixture: 2M synthetic 64-dim vectors (128M exploded
  * components), 8 labels.
  *
  * The one-pass dispersion rides E‖x−μ‖² = E‖x‖² − ‖μ‖²; the soak
  * recomputes it by an INDEPENDENT algebra — join each class's exact
  * per-dim sums s1 back to the rows and sum (n·v − s1)² — using the
  * identity Σᵢ(n·vᵢ − s1)² = n·(n·S2 − s1²), so
  * num_ref = Σ(n·v − s1)²/n must equal the one-pass numerator
  * EXACTLY, integer for integer, before the shared final division.
  * A mismatch of even 1 ulp in any DECIMAL(38,0) sum fails the soak.
  * Also checks the closed-form centroid of the synthetic generator on
  * one (label, dim) cell. Prints one JSON evidence line (exactness +
  * walls); recorded in BASELINE.md. */
object EmbSoak {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nVecs = args.headOption.map(_.toLong).getOrElse(2000000L)
    // deterministic pseudo-floats in [-1, 1] at 1e-3 granularity: the
    // 1e-6 quantization is exact on them, so closed forms are exact
    val vecs = SoakCorpus.flat(spark, nVecs)

    import SoakCorpus.timed

    // one-pass operator result
    val (onePass, wOne) = timed {
      graft.operators.EmbStats.dispersionByLabel(vecs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    }

    // independent reference: join-back algebra, same quantization.
    // num_ref per label = Σ_d Σ_i (n·v_e6 − s1_d)² / n  (exact divide)
    val (ref, wRef) = timed {
      val q = vecs.select(col("label"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("label"), col("dim"),
          expr("CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)").as("v_e6"))
        .localCheckpoint(true)
      val s1d = q.groupBy("label", "dim")
        .agg(count(lit(1)).as("n"), sum(expr("CAST(v_e6 AS DECIMAL(38,0))")).as("s1"))
      q.join(s1d, Seq("label", "dim"))
        .groupBy("label")
        .agg(max("n").as("n"),
          sum(expr("""(CAST(n AS DECIMAL(38,0)) * v_e6 - s1) *
                      (CAST(n AS DECIMAL(38,0)) * v_e6 - s1)""")).as("ss"))
        .select(col("label"), col("n").as("n_vecs"),
          // ss = n·num ⇒ the one-pass division (2·num + n²e6) div
          // (2·n²e6) multiplied through by n: (2·ss + n³e6) div
          // (2·n³e6). Stays DECIMAL end-to-end — an intermediate
          // ss/n would pass through IntegralDivide's LONG result and
          // overflow past ~10¹⁸ (the bug this soak exists to catch).
          expr("""CAST((2 * ss
                  + CAST(n AS DECIMAL(38,0)) * n * n * 1000000)
                  div (2 * CAST(n AS DECIMAL(38,0)) * n * n * 1000000) AS BIGINT)""")
            .as("msd_e6"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    }

    val exact = onePass.sameElements(ref)

    // closed-form spot check: label 0, dim 0 → v = ((16·k·2654435761) mod 2001 − 1000)/1000
    val cell = graft.operators.EmbStats.centroidByLabel(vecs.filter(col("label") === 0))
      .filter(col("dim") === 0).select("n_vecs", "centroid_e6")
      .head()
    val ids = (0L until nVecs by 8L)
    val want = {
      val s1 = ids.map(i => Math.floorMod(i * 2654435761L, 2001L) - 1000L).map(_ * 1000L).sum
      val n = ids.size.toLong
      (2 * s1 + (if (s1 >= 0) n else -n)) / (2 * n)
    }
    val centroidOk = cell.getLong(0) == ids.size.toLong && cell.getLong(1) == want

    println(s"""{"soak":"emb_stats","n_vecs":$nVecs,"components":${nVecs * 64},""" +
      s""""one_pass_wall_s":${math.round(wOne * 100) / 100.0},""" +
      s""""ref_wall_s":${math.round(wRef * 100) / 100.0},""" +
      s""""dispersion_exact":$exact,"centroid_closed_form":$centroidOk,""" +
      s""""labels":${onePass.length}}""")
    require(exact, "one-pass dispersion != join-back reference")
    require(centroidOk, s"centroid closed form mismatch: got ${cell.getLong(1)}, want $want")
    spark.stop()
  }
}
