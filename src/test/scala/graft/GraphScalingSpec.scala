package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, VectorQueries}

/** The scale claim behind q104/q105/q110/q114: the k-NN graph's
  * candidate volume is Σ_cell c·(c−1) — with nlist = ivfNList(n) the
  * cells hold ≈ IvfTargetCellRows members, so candidates PER ROW stay
  * ~flat as the corpus grows, and everything downstream (edges = n·K,
  * PageRank contributions, voting rounds, cluster edges) is linear by
  * construction. A FIXED nlist grows per-row candidates linearly with
  * n (quadratic total) — the graph build that melts at 100 TB.
  * Companion to SemKScalingSpec/LshScalingSpec. */
class GraphScalingSpec extends SparkTestBase {
  import spark.implicits._

  test("ivfNList: floor at test SFs, ∝ n in the middle, capped") {
    assert(VectorQueries.ivfNList(500) == 16)
    assert(VectorQueries.ivfNList(2000) == 16)
    assert(VectorQueries.ivfNList(8192) == 64)
    assert(VectorQueries.ivfNList(16384) == 128)
    assert(VectorQueries.ivfNList(100L * 1000 * 1000 * 1000) == 65536, "cap")
  }

  private def gaussianCorpus(n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(16)(rnd.nextGaussian())))
      .toDF("vec_id", "emb")
  }

  /** Within-cell ordered candidate pairs per corpus row under the
    * q104 cell geometry. */
  private def perRowCandidates(n: Int, nlist: Int): Double = {
    val cells = IvfIndex.cellAssignments(
      gaussianCorpus(n, seed = 71), nlist, Some(n.toLong))
    val total = cells.groupBy(col("cell")).agg(count(lit(1)).as("c"))
      .select(sum(col("c") * (col("c") - 1)).as("pairs"))
      .as[Long].head()
    total.toDouble / n
  }

  test("derived nlist holds per-row graph candidates ~flat; fixed nlist does not") {
    val (n1, n2) = (8192, 16384)
    val adaptive1 = perRowCandidates(n1, VectorQueries.ivfNList(n1))
    val adaptive2 = perRowCandidates(n2, VectorQueries.ivfNList(n2))
    val adaptiveRatio = adaptive2 / adaptive1
    assert(adaptiveRatio < 1.6,
      s"derived-nlist per-row candidates grew ${adaptiveRatio}x on a 2x " +
        s"corpus ($adaptive1 -> $adaptive2) — should stay ~flat")
    val fixed1 = perRowCandidates(n1, 16)
    val fixed2 = perRowCandidates(n2, 16)
    val fixedRatio = fixed2 / fixed1
    assert(fixedRatio > 1.7,
      s"fixed-nlist control should be ~2x per row, was ${fixedRatio}x")
  }
}
