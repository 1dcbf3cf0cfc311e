package graft

/** Pure protocol pieces of [[Bench]]'s regression machinery, factored
  * out so the hot-row / steady-registry behavior is unit-testable
  * (r14 verdict #1's done-criterion: a deliberate 2× slowdown of one
  * query must still trip its row — provable in a spec only if the
  * decision logic is callable without 30 real queries).
  *
  * Two registries, two jobs:
  *
  *  - `bench_best.json` — flat `{"name": sec}`: the ALL-TIME minimum
  *    ever observed per query. Historical record; ratcheted after
  *    every canonical-scale run; feeds `median_vs_best`. By round 14
  *    its minima (captured in rare quiet/thermal windows over 14
  *    rounds) had drifted ~1.4× below any steady-state observation,
  *    which blunted the per-query tripwire — 16 rows sat >1.5× their
  *    bests on a verifiably idle host with nothing to adjudicate.
  *  - `bench_steady.json` — `{"name": [sec, sec, sec]}`: the last ≤3
  *    QUIET-GATED observations per query (host idle at both load
  *    samples), most recent LAST. The steady reference is the MEDIAN
  *    of these — what this host actually runs at — and is what the
  *    retry protocol, the hot-row flag and `median_vs_steady` key on.
  *    Only quiet runs append; a contended capture can read the
  *    registry but never poison it.
  */
object BenchProtocol {

  /** Parse either registry shape: `"name": 1.23` (bench_best) or
    * `"name": [1.2, 1.3]` (bench_steady). Regex, not a JSON library —
    * Bench stays dependency-free. */
  def parseRegistry(txt: String): Map[String, Seq[Double]] =
    "\"([^\"]+)\"\\s*:\\s*(\\[[^\\]]*\\]|[0-9.]+)".r.findAllMatchIn(txt).map { m =>
      val vals = "[0-9.]+".r.findAllIn(m.group(2)).map(_.toDouble).toSeq
      m.group(1) -> vals
    }.toMap.filter(_._2.nonEmpty)

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Per-query steady reference: median of the recorded observations. */
  def steadyOf(obs: Map[String, Seq[Double]]): Map[String, Double] =
    obs.map { case (k, v) => k -> median(v) }

  /** Median of wall/reference ratios over queries present in `ref`;
    * -1 when fewer than `minRows` are comparable (uniform inflation
    * shows as a median well above 1, unlike a single-query
    * regression). */
  def medianRatio(walls: Seq[(String, Double)], ref: Map[String, Double],
      minRows: Int = 5): Double = {
    val ratios = walls.collect {
      case (n, w) if w >= 0 && ref.get(n).exists(_ > 0) => w / ref(n)
    }
    if (ratios.size < minRows) -1.0 else median(ratios)
  }

  /** Rows exceeding `factor`× their reference AND `minExcessSec` of
    * absolute excess — the per-query regression tripwire. A 2×
    * slowdown of ONE query trips its row here even when the run's
    * median is clean; a sub-second row jittering 120 ms over a 0.24 s
    * steady does NOT (the r15 all-set bootstrap run listed 13 such
    * rows — relative thresholds alone are meaningless at walls this
    * small, where scheduler noise is a fixed cost). */
  def hotRows(walls: Seq[(String, Double)], ref: Map[String, Double],
      factor: Double = 1.5, minExcessSec: Double = 0.25): Seq[String] =
    walls.collect {
      case (n, w) if w >= 0 &&
        ref.get(n).exists(r => w > factor * r && w - r > minExcessSec) => n
    }

  /** Rows over `factor`× their reference but UNDER the absolute-excess
    * floor — the band [[hotRows]]'s noise floor makes blind for
    * sub-half-second rows (r15 verdict watch item: a 0.3 s steady can
    * sit at 0.54 s untripped). These are not hot yet: each gets ONE
    * cold re-sample at pass end and trips only on 2-consecutive
    * confirmation ([[confirmBand]]) — a one-off scheduler jitter
    * clears on the re-sample, a persistent 1.7× regression of a 0.3 s
    * row does not. */
  def bandRows(walls: Seq[(String, Double)], ref: Map[String, Double],
      factor: Double = 1.5, minExcessSec: Double = 0.25): Seq[String] =
    walls.collect {
      case (n, w) if w >= 0 &&
        ref.get(n).exists(r => w > factor * r && w - r <= minExcessSec) => n
    }

  /** 2-consecutive confirmation for a [[bandRows]] candidate: trips
    * iff BOTH the original wall and its re-sample exceed `factor`×
    * the reference (no absolute floor — the band exists because the
    * floor is blind here; two independent samples agreeing is the
    * jitter defense instead). */
  def confirmBand(original: Double, resample: Double, ref: Double,
      factor: Double = 1.5): Boolean =
    ref > 0 && original > factor * ref &&
      resample >= 0 && resample > factor * ref

  /** Append this run's walls to the steady observations, keeping the
    * most recent `keep` per query (oldest dropped, new appended LAST).
    * Call ONLY for quiet-gated canonical-scale runs. */
  def appendObservations(obs: Map[String, Seq[Double]],
      walls: Seq[(String, Double)], keep: Int = 3): Map[String, Seq[Double]] =
    walls.foldLeft(obs) { case (acc, (n, w)) =>
      if (w < 0) acc
      else acc.updated(n, (acc.getOrElse(n, Seq.empty) :+ w).takeRight(keep))
    }

  /** Render the steady registry (sorted keys, 3-decimal values,
    * Locale-safe). */
  def renderRegistry(obs: Map[String, Seq[Double]]): String = {
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    obs.toSeq.sortBy(_._1).map { case (n, vs) =>
      s""""$n": [${vs.map(fmt).mkString(", ")}]"""
    }.mkString("{\n", ",\n", "\n}\n")
  }
}
