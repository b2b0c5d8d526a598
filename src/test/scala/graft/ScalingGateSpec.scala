package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The scaling==HEAD structural gate (the r11 verdict's #1 ask made a
  * red test): the committed `SCALING_r{N}.json` must describe THIS
  * code, and no batch query's sf0.01→sf0.1 wall-time ratio may sit
  * far above the 10× data ratio. Plan-shape pins (PlanAuditSpec)
  * argue every plan is scale-safe; this gate MEASURES it — a
  * superlinear plan (a pair join slipping off its bounded grid, an
  * accidental O(n·cells) loop) reads as a ratio tending toward 100×
  * between these SFs and fails here even when its absolute sf0.1 time
  * still clears the bench gate.
  *
  *  - the NEWEST `SCALING_r*.json` must cover exactly the batch
  *    registry (regenerate after registering a query);
  *  - it must be uncontended and failure-free;
  *  - every query with t_big above [[ScalingGateSpec.AbsFloorSec]]
  *    must have ratio ≤ [[ScalingGateSpec.RatioBar]], minus the
  *    per-round waiver list (same discipline as BenchArtifactGateSpec:
  *    every waiver names a cause, stale names are themselves red).
  *
  * Calibration (the committed SCALING_r13.json, 238 queries): the
  * ratio distribution is p50 1.08, p90 1.91, p99 3.91, max 6.12
  * (q82's real media decode — genuine per-row algorithmic work,
  * still under the data ratio; r12 measured p50 1.27 / max 8.27 on
  * the same bar) — fixed session overhead keeps everything UNDER the
  * 10× data ratio. The bar at 1.5× the artifact's own data_ratio
  * (15× for the default sf0.01→sf0.1 pair) leaves >2× headroom over
  * the healthiest board's max while a quadratic plan reads ~50–100×
  * between these SFs; the 1 s absolute floor ignores sub-second noise
  * on tiny denominators.
  */
class ScalingGateSpec extends AnyFunSuite {
  import ScalingGateSpec._

  private val repoRoot = new java.io.File(".").getCanonicalFile

  private def artifacts: Seq[java.io.File] = {
    val arts = Option(repoRoot.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("SCALING_r\\d+\\.json"))
    assert(arts.nonEmpty, s"no SCALING_r*.json under $repoRoot")
    arts.sortBy(f => f.getName.stripPrefix("SCALING_r")
      .stripSuffix(".json").toInt).toSeq
  }

  private def newest: java.io.File = artifacts.last

  private lazy val artifact: JValue = JsonMethods.parse(
    java.nio.file.Files.readString(newest.toPath))

  private def num(v: JValue): Double = v match {
    case JDouble(d) => d
    case JInt(i)    => i.toDouble
    case other      => fail(s"non-numeric field: $other")
  }

  private lazy val entries: Map[String, (Double, Double, Double)] =
    artifact \ "queries" match {
      case JObject(fields) => fields.map { case (k, v) =>
        k -> ((num(v \ "t_small"), num(v \ "t_big"), num(v \ "ratio")))
      }.toMap
      case other => fail(s"artifact 'queries' is not an object: $other")
    }

  test("scaling artifact batch keys == SparkEntry.queries at HEAD") {
    val streaming = SparkEntry.streamingQueries.keySet
    val registry = SparkEntry.queries.keySet -- streaming
    val missing = registry -- entries.keySet
    val stale = entries.keySet -- registry
    assert(missing.isEmpty && stale.isEmpty,
      s"${newest.getName} diverges from the registry — regenerate " +
        s"(runMain graft.ScalingBench). missing=${missing.toSeq.sorted} " +
        s"stale=${stale.toSeq.sorted}")
  }

  test("scaling artifact is uncontended and failure-free") {
    assert(artifact \ "contended" == JBool(false),
      s"${newest.getName} is contended — not a scaling claim")
    assert(artifact \ "n_failed" == JInt(0),
      s"${newest.getName} recorded query failures")
  }

  test("no unwaived superlinear query (ratio bar on measured queries)") {
    val round = newest.getName
      .stripPrefix("SCALING_r").stripSuffix(".json").toInt
    val waived = Waivers.getOrElse(round, Map.empty).keySet
    // the bar scales with the artifact's OWN data ratio (derived by
    // ScalingBench from the SF dir pair), so a run against a non-10×
    // pair is gated against ITS ratio, not a hardcoded 10×
    val dataRatio = num(artifact \ "data_ratio")
    assert(dataRatio > 1.0, s"artifact data_ratio $dataRatio is not a scale-up")
    val bar = BarOverDataRatio * dataRatio
    val hits = outliers(
      entries.view.mapValues { case (s, b, _) => (s, b) }.toMap,
      bar, AbsFloorSec, waived)
    assert(hits.isEmpty,
      f"superlinear scaling vs the $dataRatio%.1fx data ratio (waive with " +
        s"a cause in ScalingGateSpec.Waivers($round) or fix the plan):\n" +
        hits.mkString("\n"))
  }

  test("outlier detector flags a planted superlinear query (and honors waivers)") {
    // the gate must be RED on a planted quadratic — a ratio near n²'s
    // 100x between these SFs — not just green on today's artifact
    val data = Map(
      "qLinear" -> (0.5, 2.0),   // 4x: overhead-dominated linear
      "qQuad"   -> (0.2, 12.0),  // 60x over the floor: superlinear
      "qTinyQuad" -> (0.005, 0.4)) // 80x but under the abs floor: noise
    val hits = outliers(data, RatioBar, AbsFloorSec, Set.empty)
    assert(hits.size == 1 && hits.head.contains("qQuad"),
      s"expected exactly the planted qQuad: $hits")
    assert(outliers(data, RatioBar, AbsFloorSec, Set("qQuad")).isEmpty,
      "a waived query must not fire")
  }

  test("scaling waivers only name queries present in the artifact") {
    val round = newest.getName
      .stripPrefix("SCALING_r").stripSuffix(".json").toInt
    val stale = Waivers.getOrElse(round, Map.empty).keySet -- entries.keySet
    assert(stale.isEmpty, s"waivers for unknown queries: $stale")
  }
}

object ScalingGateSpec {
  /** A query "scales superlinearly" when its big-SF time exceeds BOTH
    * the ratio bar — 1.5× the artifact's data_ratio (committed healthy
    * boards max out at 6.12× (r13) / 8.27× (r12) against a 10× data
    * ratio) — and an absolute floor (ratios on sub-second denominators
    * are session noise, not plans). */
  val BarOverDataRatio = 1.5
  val RatioBar = BarOverDataRatio * 10.0 // the default sf0.01→sf0.1 pair
  val AbsFloorSec = 1.0

  /** Pure detector, red-tested with the planted quadratic above. */
  def outliers(data: Map[String, (Double, Double)], ratioBar: Double,
               absFloorSec: Double, waived: Set[String]): Seq[String] =
    (data.keySet -- waived).toSeq.sorted.flatMap { k =>
      val (s, b) = data(k)
      val ratio = b / math.max(s, 1e-3)
      if (b > absFloorSec && ratio > ratioBar)
        Some(f"$k: $s%.3f -> $b%.3f s (${ratio}%.1fx vs 10x data)")
      else None
    }

  /** Waivers keyed by the artifact round; each entry needs a cause. */
  val Waivers: Map[Int, Map[String, String]] = Map()
}
