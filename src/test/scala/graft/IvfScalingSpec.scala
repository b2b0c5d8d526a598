package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, VectorQueries}

/** The scale claim behind the corpus-derived IVF geometry: with
  * nlist = ivfNList(n) ∝ n, cells hold ≈ IvfTargetCellRows regardless
  * of corpus size — so a probe's candidate volume (nprobe × cell rows)
  * grows only with the √nlist recall term, not with n. A FIXED nlist
  * makes every cell corpus/nlist: the "pruned" candidate set doubles
  * whenever the corpus does, which is the difference between an ANN
  * search that survives 100 TB and one that degenerates to a near-scan.
  * Companion to SemKScalingSpec / LshScalingSpec. */
class IvfScalingSpec extends SparkTestBase {
  import spark.implicits._

  test("ivfNList: floor at test SFs, ∝ n in the middle, capped") {
    assert(VectorQueries.ivfNList(500) == 16, "test-SF floor (old constant)")
    assert(VectorQueries.ivfNList(2000) == 16)
    assert(VectorQueries.ivfNList(8192) == 64)
    assert(VectorQueries.ivfNList(16384) == 128)
    assert(VectorQueries.ivfNList(1000000) ==
      math.ceil(1000000 / VectorQueries.IvfTargetCellRows.toDouble).toInt)
    assert(VectorQueries.ivfNList(100L * 1000 * 1000 * 1000) == 65536,
      "centroid-matrix / assignment-cost cap")
  }

  test("ivfNProbe: floor at the old constant, ∝ √nlist after") {
    assert(VectorQueries.ivfNProbe(16) == 4, "old 4-of-16 geometry")
    assert(VectorQueries.ivfNProbe(64) == 8)
    assert(VectorQueries.ivfNProbe(128) == 12)
    assert(VectorQueries.ivfNProbe(65536) == 256)
    // the scanned fraction SHRINKS as the grid refines
    assert(VectorQueries.ivfNProbe(65536).toDouble / 65536 <
           VectorQueries.ivfNProbe(16).toDouble / 16)
  }

  private def gaussianCorpus(n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(16)(rnd.nextGaussian())))
      .toDF("vec_id", "emb")
  }

  /** Mean populated-cell size under the given grid — what one probed
    * cell contributes to a probe's candidate set. */
  private def meanCellRows(n: Int, nlist: Int): Double =
    IvfIndex.cellAssignments(gaussianCorpus(n, seed = 53), nlist,
        approxRows = Some(n))
      .groupBy(col("cell")).agg(count(lit(1)).as("c"))
      .agg(avg(col("c"))).as[Double].head()

  test("derived nlist holds per-cell candidate volume ~flat; fixed nlist does not") {
    // sizes where the derivation actually moves: 8192 -> 64, 16384 -> 128
    val (n1, n2) = (8192, 16384)
    assert(VectorQueries.ivfNList(n2) == 2 * VectorQueries.ivfNList(n1))
    val adaptive1 = meanCellRows(n1, VectorQueries.ivfNList(n1))
    val adaptive2 = meanCellRows(n2, VectorQueries.ivfNList(n2))
    val adaptiveRatio = adaptive2 / adaptive1
    assert(adaptiveRatio < 1.3 && adaptiveRatio > 0.7,
      s"derived-nlist cell rows grew ${adaptiveRatio}x on a 2x corpus " +
        s"($adaptive1 -> $adaptive2) — should stay ~flat")
    // control: freeze nlist at the old constant and the same doubling
    // doubles every cell (the candidate set stops being pruned)
    val fixed1 = meanCellRows(n1, 16)
    val fixed2 = meanCellRows(n2, 16)
    val fixedRatio = fixed2 / fixed1
    assert(fixedRatio > 1.7,
      s"fixed-nlist control should be ~2x, was ${fixedRatio}x ($fixed1 -> $fixed2)")
  }
}
