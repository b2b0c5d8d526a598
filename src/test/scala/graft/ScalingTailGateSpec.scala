package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The second-decade scaling gate (the r13 verdict's #2 ask made a red
  * test): the committed `SCALING_TAIL_r{N}.json` must cover exactly
  * the eight SCALING_r13 outlier queries at THREE corpus sizes
  * (sf0.01, sf0.1, and the generated 10×-sf0.1 point), be uncontended
  * and failure-free, and no query's SECOND-decade fitted exponent may
  * exceed the bar — the first decade is fixed-cost-diluted (its
  * ratios 3.2–6.1× read as exponents 0.5–0.8), so a super-linear term
  * only becomes visible once the fixed costs have amortized, which is
  * exactly what the third point exists to expose.
  */
class ScalingTailGateSpec extends AnyFunSuite {
  import ScalingTailGateSpec._

  private val repoRoot = new java.io.File(".").getCanonicalFile

  private def artifacts: Seq[java.io.File] = {
    val arts = Option(repoRoot.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("SCALING_TAIL_r\\d+\\.json"))
    assert(arts.nonEmpty, s"no SCALING_TAIL_r*.json under $repoRoot")
    arts.sortBy(f => f.getName.stripPrefix("SCALING_TAIL_r")
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

  /** (t_big, exp23) per query — the second decade under the bar. */
  private lazy val entries: Map[String, (Double, Double)] =
    artifact \ "queries" match {
      case JObject(fields) => fields.map { case (k, v) =>
        k -> ((num(v \ "t_big"), num(v \ "exp23")))
      }.toMap
      case other => fail(s"artifact 'queries' is not an object: $other")
    }

  test("scaling-tail artifact covers exactly the eight outlier queries") {
    val want = ScalingTailBench.TailQueries.toSet
    assert(entries.keySet == want,
      s"${newest.getName} queries ${entries.keySet.toSeq.sorted} != $want — " +
        "regenerate (runMain graft.ScalingTailBench)")
  }

  test("scaling-tail artifact is uncontended, failure-free, at 10x") {
    assert(artifact \ "contended" == JBool(false),
      s"${newest.getName} is contended — not a scaling claim")
    assert(artifact \ "n_failed" == JInt(0),
      s"${newest.getName} recorded query failures")
    assert(num(artifact \ "data_ratio") == 10.0, "third point must be 10x")
  }

  test("no unwaived super-linear second decade") {
    val round = newest.getName
      .stripPrefix("SCALING_TAIL_r").stripSuffix(".json").toInt
    val waived = Waivers.getOrElse(round, Map.empty).keySet
    val hits = outliers(entries, ExpBar, AbsFloorSec, waived)
    assert(hits.isEmpty,
      "super-linear second decade (waive with a cause in " +
        s"ScalingTailGateSpec.Waivers($round) — naming the documented " +
        s"linear driver — or fix the plan):\n${hits.mkString("\n")}")
  }

  test("tail waivers only name queries present in the artifact") {
    val round = newest.getName
      .stripPrefix("SCALING_TAIL_r").stripSuffix(".json").toInt
    val stale = Waivers.getOrElse(round, Map.empty).keySet -- entries.keySet
    assert(stale.isEmpty, s"waivers for unknown queries: $stale")
  }

  test("the exponent detector catches a planted quadratic and passes a linear") {
    val planted = Map(
      "linear" -> ((50.0, 1.02)),   // 10x time for 10x data
      "quad" -> ((500.0, 2.0)),     // 100x time for 10x data
      "tiny_quad" -> ((1.0, 2.0)))  // superlinear but under the floor
    val hits = outliers(planted, ExpBar, AbsFloorSec, Set.empty)
    assert(hits.size == 1 && hits.head.startsWith("quad"), hits.toString)
    assert(outliers(planted, ExpBar, AbsFloorSec, Set("quad")).isEmpty)
  }
}

object ScalingTailGateSpec {
  /** Second-decade exponent bar: linear is 1.0; the slack absorbs
    * residual fixed-cost amortization and host noise on ~10 s
    * numerators without admitting an n·log n-and-worse surprise at
    * 10× (log₁₀ of a clean n² decade reads 2.0). */
  val ExpBar = 1.1

  /** Queries whose BIG point is under this are too cheap for a fitted
    * exponent to mean anything (sub-5 s at 10×-sf0.1 extrapolates to
    * minutes at petabyte scale only through the linear term). */
  val AbsFloorSec = 5.0

  /** Pure detector over (t_big, exp23) pairs. */
  def outliers(data: Map[String, (Double, Double)], expBar: Double,
               absFloorSec: Double, waived: Set[String]): Seq[String] =
    (data.keySet -- waived).toSeq.sorted.flatMap { k =>
      val (tBig, e) = data(k)
      if (tBig > absFloorSec && e > expBar)
        Some(f"$k: t_big $tBig%.2f s, second-decade exponent $e%.2f")
      else None
    }

  /** Waivers keyed by the artifact round; each entry needs a cause
    * naming the documented linear driver. */
  val Waivers: Map[Int, Map[String, String]] = Map()
}
