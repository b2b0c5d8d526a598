package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine
import graft.operators.VectorQueries

/** q98 — SQ8 scalar quantization. The oracle proves the grid, the
  * code/midpoint arithmetic and the top-k cut are cross-engine exact;
  * these specs pin the properties the oracle can't see: the ±½-step
  * reconstruction bound the uniform quantizer guarantees, and that the
  * compressed search stays informative (self is near-perfect, winners
  * beat the corpus mean on TRUE cosine).
  */
class Sq8Spec extends SparkTestBase {

  test("q98: top-k shape, byte-range codes, self scores ≈ 1 at rank 1") {
    val out = SparkEntry.queries("q98_sq8_ann")(spark, sf).collect()
    assert(out.length == VectorQueries.SqTopK)
    assert(out.head.schema.fieldNames.toSeq == Seq("vec_id", "code0", "adc"))
    out.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < VectorQueries.SqLevels, r.toString)
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9, r.toString)
    }
    // 256 levels/dim keep the midpoint reconstruction so close that the
    // query's own code must win at essentially-perfect similarity — if
    // rank 1 isn't the query itself the grid lost the geometry outright
    assert(out.head.getLong(0) == 0L, s"rank 1 was ${out.head}")
    assert(out.head.getDouble(2) >= 0.999, s"self-ADC ${out.head.getDouble(2)}")
  }

  test("q98: every dimension reconstructs within half a grid step") {
    val (lo, hi) = VectorQueries.sqStats(spark, sf)
    val vecs = VectorQueries.emb(spark, sf)
      .select(col("emb")).collect().map(_.getSeq[Double](0))
    val L = VectorQueries.SqLevels
    vecs.foreach { v =>
      v.indices.foreach { d =>
        val step = (hi(d) - lo(d)) / L
        val code =
          if (hi(d) == lo(d)) 0
          else math.min(L - 1, math.max(0,
            math.floor((v(d) - lo(d)) / (hi(d) - lo(d)) * L).toInt))
        val recon = lo(d) + (code + 0.5) * (hi(d) - lo(d)) / L
        assert(math.abs(v(d) - recon) <= step / 2 + 1e-12,
          s"dim $d: x=${v(d)} recon=$recon step=$step")
      }
    }
  }

  test("q98: ADC winners are truly closer to the query than the corpus mean") {
    val e = VectorQueries.emb(spark, sf)
    val q = e.filter(col("vec_id") === 0).select(col("emb"))
      .head.getSeq[Double](0)
    // vec_id 0 IS the query — exclude it on both sides (the q95/q96
    // self-exclusion) so the assertion measures what quantization kept
    val trueCos = e
      .withColumn("cos", cosine(col("emb"), array(q.map(lit): _*)))
      .select(col("vec_id"), col("cos")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      .removed(0L)
    val winners = SparkEntry.queries("q98_sq8_ann")(spark, sf)
      .collect().map(_.getLong(0)).filter(_ != 0L)
    val winMean = winners.map(trueCos).sum / winners.length
    val allMean = trueCos.values.sum / trueCos.size
    assert(winMean > allMean,
      s"SQ8 top-${winners.length} mean true-cosine $winMean should beat " +
        s"the corpus mean $allMean — quantization lost the geometry")
  }
}
