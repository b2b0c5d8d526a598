package graft

/** Tag for minute-scale sweep tests excluded from the default
  * `sbt test` run (r15, r14 verdict ask #2: the suite had grown
  * perf-heavy specs until it no longer finished inside the round
  * driver's window — VERIFY_r14 `tests_ok: false` with zero failed
  * assertions, budget expired mid-`PipelineScalingSpec`).
  *
  * Every tagged test keeps a FAST untagged sibling in the default
  * suite covering the same invariant at reduced scale, so default
  * `sbt test` still gates the property; the full-scale sweeps run via
  *
  *   sbt "testOnly * -- -n graft.Slow"
  *
  * (run green at least once per round — quoted in OPTIMIZATION_r15.md).
  */
object Slow extends org.scalatest.Tag("graft.Slow")
