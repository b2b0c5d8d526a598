package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The bench==HEAD structural gate: the committed idle bench artifact
  * must describe THIS code. Three rounds running, the end-of-round
  * `BENCH_IDLE_r{N}.json` lagged the final commit (r9 missed exactly
  * one query, q182) because "regenerate after the last query" was a
  * habit, not a check. This spec makes the divergence a red test:
  *
  *  - the NEWEST `BENCH_IDLE_r*.json` in the repo root must have
  *    batch-query keys == `SparkEntry.queries` minus the streaming
  *    registry, and streaming keys == `SparkEntry.streamingQueries`
  *    — registering a query without re-running the idle bench fails
  *    here until the artifact is regenerated;
  *  - the artifact must self-certify `"contended": false` (a loaded-
  *    machine artifact is not a performance claim) and `n_failed: 0`;
  *  - `server_rps` must clear [[BenchArtifactGateSpec.ServerRpsFloor]]
  *    — rps drifted 16.5 → 13.55 across r8→r9 with nothing watching;
  *    an accidental 5× regression would previously have passed every
  *    gate.
  */
class BenchArtifactGateSpec extends AnyFunSuite {

  private val repoRoot = new java.io.File(".").getCanonicalFile

  private def newestIdleArtifact: java.io.File = {
    val arts = Option(repoRoot.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("BENCH_IDLE_r\\d+\\.json"))
    assert(arts.nonEmpty, s"no BENCH_IDLE_r*.json under $repoRoot")
    arts.maxBy(f => f.getName.stripPrefix("BENCH_IDLE_r")
      .stripSuffix(".json").toInt)
  }

  private lazy val artifact: JValue = JsonMethods.parse(
    java.nio.file.Files.readString(newestIdleArtifact.toPath))

  private def keysOf(field: String): Set[String] = artifact \ field match {
    case JObject(fields) => fields.map(_._1).toSet
    case other => fail(s"artifact field '$field' is not an object: $other")
  }

  test("idle artifact batch keys == SparkEntry.queries at HEAD") {
    val streaming = SparkEntry.streamingQueries.keySet
    val registry = SparkEntry.queries.keySet -- streaming
    val artifactKeys = keysOf("queries")
    val missing = registry -- artifactKeys
    val stale = artifactKeys -- registry
    assert(missing.isEmpty && stale.isEmpty,
      s"${newestIdleArtifact.getName} diverges from the registry — " +
        s"regenerate the idle bench at HEAD. missing=${missing.toSeq.sorted} " +
        s"stale=${stale.toSeq.sorted}")
  }

  test("idle artifact streaming keys == SparkEntry.streamingQueries at HEAD") {
    val registry = SparkEntry.streamingQueries.keySet
    val artifactKeys = keysOf("streaming")
    val missing = registry -- artifactKeys
    val stale = artifactKeys -- registry
    assert(missing.isEmpty && stale.isEmpty,
      s"${newestIdleArtifact.getName} streaming set diverges — " +
        s"missing=${missing.toSeq.sorted} stale=${stale.toSeq.sorted}")
  }

  test("idle artifact is idle, complete, and failure-free") {
    assert(artifact \ "contended" == JBool(false),
      s"${newestIdleArtifact.getName} is contended — not a performance claim")
    assert(artifact \ "n_failed" == JInt(0),
      s"${newestIdleArtifact.getName} recorded query failures")
  }

  test(s"server_rps clears the floor (${BenchArtifactGateSpec.ServerRpsFloor})") {
    val rps = artifact \ "server_rps" match {
      case JDouble(v) => v
      case JInt(v)    => v.toDouble
      case other      => fail(s"server_rps missing/non-numeric: $other")
    }
    assert(rps >= BenchArtifactGateSpec.ServerRpsFloor,
      f"server_rps $rps%.2f under the ${BenchArtifactGateSpec.ServerRpsFloor} floor " +
        "— concurrent-serving throughput regressed")
  }
}

object BenchArtifactGateSpec {
  /** Conservative idle-box floor: r8 measured 16.5, r9 13.55 (the r9
    * drop tracks the 56-query growth of the registry — the server
    * probe runs LAST, after ~180 queries' session pressure; the r10
    * per-query reap in Bench.timeQuery bounds that pressure). 8 rps
    * flags a ≥2× regression from r9 while staying above scheduler
    * noise on a 32-core box. */
  val ServerRpsFloor = 8.0
}
