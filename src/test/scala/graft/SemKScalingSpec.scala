package graft

import org.apache.spark.sql.functions._
import graft.operators.{KMeans, VectorQueries}

/** The scale claim behind q89/q92's derived cluster count: with
  * k = semK(n) ∝ n, SemDeDup's within-cluster pair volume PER ROW
  * stays ~flat as the corpus grows (clusters hold ≈ SemTargetClusterRows
  * members), whereas the old hand-set constant k=16 grows it linearly
  * with n (quadratically in total) — the difference between a dedup
  * pass that survives 100 TB and one that melts. Companion to
  * LshScalingSpec's bits/tables assertion. */
class SemKScalingSpec extends SparkTestBase {
  import spark.implicits._

  test("semK: floor at small corpora, ∝ n in the middle, capped") {
    assert(VectorQueries.semK(500) == 16, "test-SF floor (old constant)")
    assert(VectorQueries.semK(2000) == 16)
    assert(VectorQueries.semK(16 * 256) == 16)
    assert(VectorQueries.semK(100000) == math.ceil(100000 / 256.0).toInt)
    assert(VectorQueries.semK(1000L * 1000 * 1000) == 4096, "assignment-cost cap")
  }

  private def gaussianCorpus(n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(16)(rnd.nextGaussian())))
      .toDF("vec_id", "emb")
  }

  /** Within-cluster candidate pairs per corpus row after the same
    * 2-round Lloyd clustering q89 runs. */
  private def perRowPairVolume(n: Int, k: Int): Double = {
    val sizes = KMeans.lloyd(gaussianCorpus(n, seed = 53), k, iters = 2)
      .groupBy(col("cid")).agg(count(lit(1)).as("c"))
      .select((col("c") * (col("c") - 1) / 2).as("pairs"))
      .agg(sum(col("pairs"))).as[Double].head()
    sizes / n
  }

  test("derived k holds per-cluster candidate volume ~flat; fixed k=16 does not") {
    // sizes where semK actually moves: 8192 -> k=32, 16384 -> k=64
    val (n1, n2) = (8192, 16384)
    assert(VectorQueries.semK(n2) == 2 * VectorQueries.semK(n1))
    val adaptive1 = perRowPairVolume(n1, VectorQueries.semK(n1))
    val adaptive2 = perRowPairVolume(n2, VectorQueries.semK(n2))
    val adaptiveRatio = adaptive2 / adaptive1
    assert(adaptiveRatio < 1.6,
      s"derived-k per-row pair volume grew ${adaptiveRatio}x on a 2x corpus " +
        s"($adaptive1 -> $adaptive2) — should stay ~flat")
    // control: freeze k at the old constant and the same doubling
    // doubles the per-row volume (quadratic total)
    val fixed1 = perRowPairVolume(n1, 16)
    val fixed2 = perRowPairVolume(n2, 16)
    val fixedRatio = fixed2 / fixed1
    assert(fixedRatio > 1.7,
      s"fixed-k control should be ~2x per row, was ${fixedRatio}x ($fixed1 -> $fixed2)")
  }
}
