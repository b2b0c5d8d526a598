package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The store-fold scale gate (the r12 verdict's #4 ask made a red
  * test): the committed `STORE_SCALING_r{N}.json` must cover exactly
  * the four mergeable stores, be uncontended and failure-free, and no
  * store's small→big corpus time ratio may sit far above the data
  * ratio. The vocabulary store is the load-bearing case — its key
  * space grows with the corpus, so a fold that rewrote the whole
  * store per batch (instead of the live tail) or a merge-on-read that
  * lost its partition pruning would read superlinear here long before
  * the single-SF pipeline times moved.
  *
  * The outlier rule is [[ScalingGateSpec.outliers]] — already
  * red-tested there with a planted quadratic — applied at the same
  * 1.5×data_ratio bar (the artifact's data_ratio is the replication
  * factor between the two measured corpora), over the MARGINAL pair
  * (lifecycle minus the zero-row harness baseline the bench now
  * measures per store): the raw pairs are micro-batch-fixed-cost-
  * dominated at test scale, which is exactly how the r13 artifact's
  * 1.05–1.33× ratios could have hidden a quadratic fold (the r13
  * ADVICE finding this round closes).
  */
class StoreScalingGateSpec extends AnyFunSuite {
  import StoreScalingGateSpec._

  private val repoRoot = new java.io.File(".").getCanonicalFile

  private def artifacts: Seq[java.io.File] = {
    val arts = Option(repoRoot.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("STORE_SCALING_r\\d+\\.json"))
    assert(arts.nonEmpty, s"no STORE_SCALING_r*.json under $repoRoot")
    arts.sortBy(f => f.getName.stripPrefix("STORE_SCALING_r")
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

  /** MARGINAL lifecycle pairs (t − t_base): the r13 ADVICE showed the
    * raw pairs are fixed-cost-dominated at test scale (marginal ingest
    * ≤ 0.9 s inside a ~3–4 s harness floor), so the gate bars the
    * corrected denominators — a round-13-or-older artifact without the
    * marg fields fails here loudly: regenerate. */
  private lazy val entries: Map[String, (Double, Double)] =
    artifact \ "stores" match {
      case JObject(fields) => fields.map { case (k, v) =>
        k -> ((num(v \ "marg_small"), num(v \ "marg_big")))
      }.toMap
      case other => fail(s"artifact 'stores' is not an object: $other")
    }

  test("store-scaling artifact covers exactly the four mergeable stores") {
    val want = StoreScalingBench.StoreNames.toSet
    assert(entries.keySet == want,
      s"${newest.getName} stores ${entries.keySet.toSeq.sorted} != $want — " +
        "regenerate (runMain graft.StoreScalingBench)")
  }

  test("store-scaling artifact is uncontended and failure-free") {
    assert(artifact \ "contended" == JBool(false),
      s"${newest.getName} is contended — not a scaling claim")
    assert(artifact \ "n_failed" == JInt(0),
      s"${newest.getName} recorded store failures")
  }

  test("no unwaived superlinear store (ratio bar on measured lifecycles)") {
    val round = newest.getName
      .stripPrefix("STORE_SCALING_r").stripSuffix(".json").toInt
    val waived = Waivers.getOrElse(round, Map.empty).keySet
    val dataRatio = num(artifact \ "data_ratio")
    assert(dataRatio > 1.0, s"artifact data_ratio $dataRatio is not a scale-up")
    val hits = ScalingGateSpec.outliers(entries,
      ScalingGateSpec.BarOverDataRatio * dataRatio, AbsFloorSec, waived)
    assert(hits.isEmpty,
      f"superlinear store fold vs the $dataRatio%.1fx data ratio (waive " +
        s"with a cause in StoreScalingGateSpec.Waivers($round) or fix " +
        s"the fold):\n${hits.mkString("\n")}")
  }

  test("store waivers only name stores present in the artifact") {
    val round = newest.getName
      .stripPrefix("STORE_SCALING_r").stripSuffix(".json").toInt
    val stale = Waivers.getOrElse(round, Map.empty).keySet -- entries.keySet
    assert(stale.isEmpty, s"waivers for unknown stores: $stale")
  }
}

object StoreScalingGateSpec {
  /** Floor on the MARGINAL big-corpus time: with the zero-row harness
    * baseline already subtracted, a big-side fold under 2 s of actual
    * work is trivially cheap at test scale whatever its ratio reads —
    * recalibrated from the old 5 s raw-lifecycle floor (which, with
    * every r13 t_big under it, made the gate vacuous — the r13 ADVICE
    * finding). StoreScalingBench.MargFloorSec floors the denominator
    * side inside the artifact itself. */
  val AbsFloorSec = 2.0

  /** Waivers keyed by the artifact round; each entry needs a cause. */
  val Waivers: Map[Int, Map[String, String]] = Map()
}
