package graft

/** The dedup pipeline's scale curve, gated: doubling the corpus twice
  * (15k → 30k → 60k docs) must grow wall time near-linearly and the
  * planted counts EXACTLY linearly. A quadratic stage (all-pairs
  * candidate blowup, unpruned join) shows up as an exponent toward 2
  * long before it ooms a cluster — this is the LshScalingSpec idiom one
  * level up, over the whole exact→minhash→ngram→CC→decontaminate→kmeans
  * composition. The committed PIPELINE_BENCH.json runs the same sweep
  * at 100k/200k/400k via `runMain graft.PipelineBench sweep`.
  *
  * r15 split (verdict ask #2): the ~2-minute wall-time exponent sweep
  * is tagged [[Slow]] (excluded from default `sbt test`, run per round
  * via `testOnly * -- -n graft.Slow`); the DETERMINISTIC gates — the
  * planted cluster/dup counts and the candidate-volume linearity, the
  * part a broken pruning stage actually fails — stay in the default
  * suite at two sizes (~25 s). */
class PipelineScalingSpec extends SparkTestBase {

  private def checkCounts(r: PipelineBench.Result): Unit = {
    val c = r.counts.toMap
    // planted structure: (n/20 - 1) clusters of exactly 4 members —
    // deterministic, so these gate HARD regardless of machine load
    assert(c("clusters") == r.n / 20 - 1, s"n=${r.n}: ${c("clusters")}")
    assert(c("clustered_docs") == 4L * (r.n / 20 - 1))
    assert(c("exact_dup_groups") == r.n / 20 - 1)
    assert(c("km_clusters") == 100L)
  }

  private def checkCandidateLinearity(rs: Seq[PipelineBench.Result]): Unit = {
    // candidate volume must be linear in n by construction — a
    // superlinear candidate count means a pruning stage broke
    val p0 = rs.head.counts.toMap.apply("ngram_pairs").toDouble
    rs.foreach { r =>
      val expected = p0 * r.n / rs.head.n
      val got = r.counts.toMap.apply("ngram_pairs").toDouble
      assert(math.abs(got - expected) / expected < 0.02,
        s"n=${r.n}: ngram_pairs $got vs linear $expected")
    }
  }

  test("pipeline planted counts and candidate volume stay exactly linear") {
    val results = Seq(4000, 16000).map(n => PipelineBench.runOnce(spark, n))
    results.foreach(checkCounts)
    checkCandidateLinearity(results)
  }

  test("pipeline wall time grows near-linearly over two doublings", Slow) {
    val sizes = Seq(15000, 30000, 60000)
    // JVM/codegen warmup so the smallest run isn't penalized with
    // one-time compilation cost (which would UNDERSTATE the exponent)
    PipelineBench.runOnce(spark, 2000)

    def sweep(): Double = {
      val results = sizes.map(n => PipelineBench.runOnce(spark, n))
      results.foreach(checkCounts)
      checkCandidateLinearity(results)
      val exp = PipelineBench.growthExponent(
        results.map(r => (r.n.toDouble, r.total)))
      info(f"pipeline growth exponent over ${sizes.mkString("/")}: $exp%.3f " +
        s"(totals ${results.map(r => f"${r.total}%.1f").mkString("s, ")}s)")
      exp
    }
    // wall time is contention-sensitive (suites share the JVM): one
    // retry filters a transient-load false positive without weakening
    // the bound — a REAL quadratic stage fails both sweeps
    val exp = { val e1 = sweep(); if (e1 < 1.45) e1 else math.min(e1, sweep()) }
    assert(exp < 1.45,
      f"wall time must stay near-linear, got exponent $exp%.3f twice")
    assert(exp > 0.3, "sub-constant growth means a stage stopped scaling with n")
  }
}
