package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q141 — ANN recall@k audit. The oracle proves cross-engine value
  * equality; these specs prove the audit measures what it claims: each
  * method's recall row equals the intersection of that method's OWN
  * registered answer set (q37 / q33) with the brute-force truth (q31),
  * recomputed here independently of q141's join shape.
  */
class AnnRecallSpec extends SparkTestBase {

  private def ids(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)
      .select(col("probe_id"), col("neighbor_id").as("vec_id"))

  private def recallFrom(truth: DataFrame, approx: DataFrame): Map[Long, Long] =
    truth.join(approx, Seq("probe_id", "vec_id"))
      .groupBy("probe_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("q141: shape — 2 methods x 10 probes, truth size AnnK, exact ratios") {
    val rows = SparkEntry.queries("q141_ann_recall")(spark, sf).collect()
    assert(rows.length == 20, s"expected 2x10 rows, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(2) == graft.operators.VectorQueries.AnnK.toLong, r.toString)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(2), r.toString)
      assert(r.getDouble(4) == r.getLong(3).toDouble / r.getLong(2),
        s"recall not the exact ratio: $r")
    }
  }

  test("q170: dcg masses equal the registered queries' own graded-hit fold") {
    import graft.operators.VectorQueries.{AnnK, NdcgMass, NdcgIdealMass}
    val rel = SparkEntry.queries("q31_knn_brute")(spark, sf)
      .select(col("probe_id"), col("neighbor_id"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (AnnK + 1L - r.getLong(2)))
      .toMap
    def dcgOf(name: String): Map[Long, (Long, Long)] =
      SparkEntry.queries(name)(spark, sf)
        .select(col("probe_id"), col("neighbor_id"), col("rn")).collect()
        .flatMap { r =>
          val k = (r.getLong(0), r.getLong(1))
          rel.get(k).map(rl => r.getLong(0) -> (rl * NdcgMass / r.getLong(2), 1L))
        }
        .groupBy(_._1).view
        .mapValues(vs => (vs.map(_._2._1).sum, vs.map(_._2._2).sum)).toMap
    val expect = Map("ivf" -> dcgOf("q37_ann_ivf"), "lsh" -> dcgOf("q33_ann_lsh"))
    val got = SparkEntry.queries("q170_ann_ndcg")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.size == 20)
    got.foreach { case ((method, probe), (nHit, dcg, ndcg, _)) =>
      val (wantDcg, wantHit) = expect(method).getOrElse(probe, (0L, 0L))
      assert(dcg == wantDcg && nHit == wantHit,
        s"$method probe $probe: audit ($nHit, $dcg), own-query ($wantHit, $wantDcg)")
      assert(ndcg == dcg.toDouble / NdcgIdealMass)
    }
    Seq("ivf", "lsh").foreach { m =>
      val rows = got.collect { case ((`m`, _), v) => v }.toSeq
      val mean = rows.map(_._2).sum.toDouble / (rows.length * NdcgIdealMass)
      rows.foreach(v => assert(v._4 == mean, s"$m mean ndcg"))
    }
    // rank-sensitivity is non-vacuous: some probe's dcg differs from
    // the best possible arrangement of the SAME hit count — the
    // information recall@k cannot carry
    val bestFor = (0L to AnnK.toLong).map(h =>
      h -> (1L to h).map(j => (AnnK + 1L - j) * NdcgMass / j).sum).toMap
    assert(got.values.exists(v => v._1 > 0 && v._2 != bestFor(v._1)),
      "every dcg is the best arrangement of its hit count — grading adds nothing")
    assert(got.values.exists(v => v._1 < AnnK), "no probe misses anything")
  }

  test("q171: ladder ordering holds; sq8 arm equals a driver replay; mse is the exact ratio") {
    import graft.operators.VectorQueries.SqLevels
    val got = SparkEntry.queries("q171_recon_audit")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set("pq", "pq_residual", "sq8"))
    val n = graft.operators.VectorQueries.emb(spark, sf).count()
    got.values.foreach { case (nv, sseSum, mse) =>
      assert(nv == n && mse == sseSum / nv)
    }
    // the published ladder ordering, corpus-wide: residual coding beats
    // raw-vector PQ at the same code budget (Jégou §IV), and SQ8's
    // 16× larger codes beat both
    assert(got("pq_residual")._2 < got("pq")._2,
      "residual coding must beat raw-vector PQ")
    assert(got("sq8")._2 < got("pq_residual")._2,
      "sq8 must beat the 4-byte codes")
    // independent driver replay of the SQ8 arm (grid, codes, recon,
    // error dots, decimal-rounded sum)
    val vecs = graft.operators.VectorQueries.emb(spark, sf).collect()
      .map(r => r.getSeq[Double](2).toArray)
    val dim = vecs.head.length
    val lo = (0 until dim).map(i => vecs.map(_(i)).min)
    val hi = (0 until dim).map(i => vecs.map(_(i)).max)
    val sseSum = vecs.map { v =>
      var sse = 0.0
      var i = 0
      while (i < dim) {
        val rec =
          if (hi(i) == lo(i)) lo(i) + 0.5 * (hi(i) - lo(i)) / SqLevels
          else {
            val c = math.min(SqLevels - 1,
              math.max(0, math.floor((v(i) - lo(i)) / (hi(i) - lo(i)) * SqLevels).toInt))
            lo(i) + (c + 0.5) * (hi(i) - lo(i)) / SqLevels
          }
        val e = v(i) - rec
        sse += e * e
        i += 1
      }
      BigDecimal(sse).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    assert(got("sq8")._2 == sseSum.toDouble,
      s"sq8 sse ${got("sq8")._2} != driver replay $sseSum")
  }

  test("q141: each arm equals the registered queries' own intersection") {
    val truth = ids("q31_knn_brute")
    val expect = Map(
      "ivf" -> recallFrom(truth, ids("q37_ann_ivf")),
      "lsh" -> recallFrom(truth, ids("q33_ann_lsh")))
    val got = SparkEntry.queries("q141_ann_recall")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got.size == 20)
    got.foreach { case ((method, probe), nHit) =>
      assert(nHit == expect(method).getOrElse(probe, 0L),
        s"$method probe $probe: audit says $nHit, " +
          s"intersection says ${expect(method).getOrElse(probe, 0L)}")
    }
  }
}
