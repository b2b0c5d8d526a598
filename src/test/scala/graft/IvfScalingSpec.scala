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

  // ── past the nlist cap: the two-level SEARCH path ────────────────

  test("subCellCount: 1 through the cap boundary, then ∝ n") {
    val cap = 65536
    val t = VectorQueries.IvfTargetCellRows
    assert(IvfIndex.subCellCount(cap.toLong * t, cap, t) == 1,
      "exactly at saturation the flat path still holds")
    assert(IvfIndex.subCellCount(2L * cap * t, cap, t) == 2)
    assert(IvfIndex.subCellCount(8L * cap * t, cap, t) == 8)
    // below the cap nlist tracks n, so nsub never exceeds 1
    Seq(500L, 8192L, 1000000L).foreach { n =>
      assert(IvfIndex.subCellCount(n, VectorQueries.ivfNList(n), t) == 1,
        s"n=$n must stay on the flat path")
    }
  }

  /** A saturated-cap regime in miniature: nlist FROZEN at 8 while the
    * corpus doubles — cells grow ∝ n, exactly what happens past 65536. */
  private def perProbeCandidates(n: Int, twoLevel: Boolean): Double = {
    val corpus = gaussianCorpus(n, seed = 71).localCheckpoint()
    val probes = gaussianCorpus(8, seed = 99)
      .select(col("vec_id").as("probe_id"), col("emb").as("pemb"))
    val nlist = 8; val nprobe = 2
    val cents = IvfIndex.centroids(corpus, nlist, Some(n))
    val assigned = IvfIndex.withCells(corpus, cents)
    val probed = IvfIndex.probeCellsWith(probes, cents, nprobe)
      .join(probes, "probe_id")
    val cand =
      if (!twoLevel) assigned.join(probed, Seq("cell"))
      else {
        val nsub = IvfIndex.subCellCount(n, nlist,
          VectorQueries.IvfTargetCellRows)
        assert(nsub > 1, s"regime error: n=$n must saturate nlist=$nlist")
        val subs = IvfIndex.subCentroids(assigned, nsub).localCheckpoint()
        IvfIndex.subAssign(assigned, subs)
          .join(IvfIndex.probeSubCells(probed, subs, IvfIndex.SubProbes),
            Seq("cell", "sub"))
      }
    cand.groupBy(col("probe_id")).agg(count(lit(1)).as("c"))
      .agg(avg(col("c"))).as[Double].head()
  }

  test("two-level search holds per-probe candidates ~flat where saturated flat IVF doubles") {
    val (n1, n2) = (4096, 8192)
    val flat1 = perProbeCandidates(n1, twoLevel = false)
    val flat2 = perProbeCandidates(n2, twoLevel = false)
    assert(flat2 / flat1 > 1.6,
      s"control: saturated flat IVF should ~double ($flat1 -> $flat2)")
    val two1 = perProbeCandidates(n1, twoLevel = true)
    val two2 = perProbeCandidates(n2, twoLevel = true)
    val r = two2 / two1
    assert(r < 1.35 && r > 0.65,
      s"two-level candidates grew ${r}x on a 2x corpus ($two1 -> $two2)")
    // and the two-level volume is the promised budget, not a near-scan
    assert(two2 < flat2 * 0.75,
      s"two-level must prune the saturated cell ($two2 vs flat $flat2)")
  }

  test("topK dispatches two-level past the cap; nsub ≤ SubProbes degenerates to the flat answer") {
    // clustered corpus so neighbor structure is real
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(8, 16)(rnd.nextGaussian() * 3)
    val n = 4096
    val corpus = Seq.tabulate(n) { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.3))
    }.toDF("vec_id", "emb").localCheckpoint()
    val probes = corpus.filter(col("vec_id") < 6)
      .select(col("vec_id").as("probe_id"), col("emb").as("pemb"))
    // FLAT baseline: targetRows=n forces subCellCount = 1, so this
    // call genuinely takes the single-level path (the default 128
    // would two-level here too and compare the call to itself)
    assert(IvfIndex.subCellCount(n, 8, n.toLong) == 1,
      "baseline regime error: must be flat")
    val flat = IvfIndex.topK(corpus, probes, 8, 2, 5, Some(n),
        targetRows = n.toLong)
      .select("probe_id", "vec_id", "rn").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // targetRows=128 → nsub = 4096/(8×128) = 4 = SubProbes: every
    // sub-cell of a probed cell is scanned, so the two-level result
    // must equal the flat path EXACTLY (same candidates, same ranks)
    assert(IvfIndex.subCellCount(n, 8, 128L) == IvfIndex.SubProbes,
      "two-level regime error: nsub must equal SubProbes")
    val two = IvfIndex.topK(corpus, probes, 8, 2, 5, Some(n), targetRows = 128L)
      .select("probe_id", "vec_id", "rn").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(two == flat,
      s"nsub == SubProbes must be lossless: ${(two -- flat).take(5)} vs ${(flat -- two).take(5)}")
    // targetRows=64 → nsub = 8 > SubProbes: real pruning; structure
    // holds (k per probe) and recall vs flat stays high on clustered
    // data (the pruned sub-cells are the off-cluster ones)
    val pruned = IvfIndex.topK(corpus, probes, 8, 2, 5, Some(n), targetRows = 64L)
      .select("probe_id", "vec_id").collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet
    assert(pruned.groupBy(_._1).forall(_._2.size == 5), "k rows per probe")
    val flatPairs = flat.map(t => (t._1, t._2))
    val recall = pruned.count(flatPairs.contains).toDouble / flatPairs.size
    assert(recall >= 0.6,
      s"two-level recall vs the flat path collapsed: $recall")
  }
}
