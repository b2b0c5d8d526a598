package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pca, VectorQueries}

/** q106 — the oracle proves cross-engine bit-equality of the replayed
  * eigensolve; this spec pins the LINEAR-ALGEBRA semantics the hash
  * compare can't express: the moments really are the corpus moments,
  * the components really are (approximate) top eigenvectors, and the
  * projections really decorrelate.
  */
class PcaSpec extends SparkTestBase {

  private lazy val m = Pca.model(spark, sf)

  test("moments match a direct recomputation") {
    val rows = VectorQueries.emb(spark, sf).collect()
      .map(r => r.getSeq[Double](2).toArray)
    val n = rows.length
    assert(m.n == n)
    val dim = rows.head.length
    val mean = Array.tabulate(dim)(i => rows.map(_(i)).sum / n)
    // tolerance-based: the Aggregator's sum order differs from this
    // naive per-coordinate sum, so bits may differ at ~1e-15 relative
    for (i <- 0 until dim)
      assert(math.abs(m.mean(i) - mean(i)) < 1e-9, s"mean($i)")
    for (i <- 0 until dim; j <- 0 until dim) {
      val g = rows.map(x => (x(i) - mean(i)) * (x(j) - mean(j))).sum
      assert(math.abs(m.gram(i)(j) - g) < 1e-6 * (1 + math.abs(g)),
        s"gram($i,$j): ${m.gram(i)(j)} vs $g")
    }
  }

  test("components are unit-norm, near-orthogonal, eigen-like, dominant") {
    val Array(v1, v2) = m.comps
    def dot(a: Array[Double], b: Array[Double]) = Pca.dotSeq(a, b)
    assert(math.abs(dot(v1, v1) - 1.0) < 1e-12, "v1 not unit")
    assert(math.abs(dot(v2, v2) - 1.0) < 1e-12, "v2 not unit")
    assert(math.abs(dot(v1, v2)) < 1e-4,
      s"v1·v2 = ${dot(v1, v2)} — deflated component should be near-orthogonal")
    assert(m.lams(0) >= m.lams(1) && m.lams(1) > 0,
      s"eigenvalue order: ${m.lams.toSeq}")
    // Rayleigh dominance: the top component captures at least as much
    // variance as any single coordinate axis (eᵢᵀGeᵢ = Gᵢᵢ)
    val maxDiag = (0 until v1.length).map(i => m.gram(i)(i)).max
    assert(m.lams(0) >= maxDiag,
      s"λ1 ${m.lams(0)} below best axis variance $maxDiag")
    // eigen residual: ‖Gv − λv‖ small relative to λ after 96 steps
    for ((v, lam) <- m.comps.zip(m.lams)) {
      val gv = Array.tabulate(v.length)(i => dot(m.gram(i), v))
      val res = math.sqrt(dot(
        Array.tabulate(v.length)(i => gv(i) - lam * v(i)),
        Array.tabulate(v.length)(i => gv(i) - lam * v(i))))
      assert(res < 0.01 * lam, s"residual $res vs λ $lam")
    }
  }

  test("projections are centered and variance-ordered") {
    val out = SparkEntry.queries("q106_pca_project")(spark, sf).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val n = out.length
    val mz1 = out.map(_._1).sum / n
    val mz2 = out.map(_._2).sum / n
    assert(math.abs(mz1) < 1e-3 && math.abs(mz2) < 1e-3,
      s"projections not centered: $mz1 / $mz2")
    val var1 = out.map(z => (z._1 - mz1) * (z._1 - mz1)).sum / n
    val var2 = out.map(z => (z._2 - mz2) * (z._2 - mz2)).sum / n
    assert(var1 >= var2, s"z1 variance $var1 below z2 variance $var2")
    // Var(z1) ≈ λ1/n — the eigensolve and the projection agree on
    // what "variance along v1" means
    assert(math.abs(var1 - m.lams(0) / m.n) < 0.05 * (m.lams(0) / m.n),
      s"Var(z1) $var1 vs λ1/n ${m.lams(0) / m.n}")
  }
}
