package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorQueries

/** q97 — residual-encoded IVFADC. The oracle proves the coarse-centroid
  * replay, the residual codebooks and the rank cut are cross-engine
  * exact; these specs prove the architectural claim the oracle can't
  * see: coding residuals under the coarse grid reconstructs vectors
  * STRICTLY better than coding the raw vectors with the same codebook
  * budget (Jégou et al. §IV — the reason IVFADC quantizes residuals). */
class PqResidualSpec extends SparkTestBase {

  test("q97: every probe answers a full top-5, never itself") {
    val out = SparkEntry.queries("q97_ivf_pq_residual")(spark, sf).collect()
    val byProbe = out.groupBy(_.getLong(0))
    assert(byProbe.keySet == (0L until 10L).toSet,
      s"expected all 10 probes answered, got ${byProbe.keySet}")
    byProbe.foreach { case (pid, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq ==
        (1L to VectorQueries.IvfPqTopK),
        s"probe $pid ranks: ${rows.map(_.getLong(3)).sorted.toSeq}")
      assert(!rows.exists(_.getLong(1) == pid), s"probe $pid returned itself")
    }
  }

  test("residual reconstruction beats raw-vector PQ at the same code budget") {
    // mean true cosine between each vector and its reconstruction:
    // cell centroid + decoded residual (q97's decoder) vs the plain
    // concatenated-codebook decode (q95's). Same M, same derived K —
    // the residual form must explain the corpus better.
    import graft.functions.VectorFunctions.cosine
    val e = VectorQueries.emb(spark, sf)

    def meanRecon(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg(col("rc"))).head.getDouble(0)

    val (codes, cents) = VectorQueries.pqModel(spark, sf)
    val plain = cents.zipWithIndex.foldLeft(codes) { case (d, (c, i)) =>
      d.join(broadcast(c), s"c$i") }
      .withColumn("recon", concat(cents.indices.map(i => col(s"cv$i")): _*))
      .join(e.select(col("vec_id"), col("emb")), "vec_id")
      .select(cosine(col("emb"), col("recon")).as("rc"))

    val (rcodes, rcents, cellCents) = VectorQueries.pqResidualModel(spark, sf)
    val residual = rcents.zipWithIndex.foldLeft(rcodes) { case (d, (c, i)) =>
      d.join(broadcast(c), s"c$i") }
      .join(broadcast(cellCents), "cell")
      .withColumn("recon",
        zip_with(col("ccv"),
          concat(rcents.indices.map(i => col(s"cv$i")): _*), (a, b) => a + b))
      .join(e.select(col("vec_id"), col("emb")), "vec_id")
      .select(cosine(col("emb"), col("recon")).as("rc"))

    val (p, r) = (meanRecon(plain), meanRecon(residual))
    assert(r > p,
      s"residual coding ($r) must reconstruct better than raw-vector " +
        s"PQ ($p) at the same codebook budget — the residuals didn't help")
  }

  test("q97: residual-ADC picks beat the probed-cell average on true cosine") {
    val e = VectorQueries.emb(spark, sf)
    val n = e.count()
    val vecs = e.select(col("vec_id"), col("emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.lazyZip(b).map(_ * _).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val chosen = SparkEntry.queries("q97_ivf_pq_residual")(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val nlist = VectorQueries.ivfNList(n)
    val cands = graft.operators.IvfIndex.topK(e,
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("emb").as("pemb")),
        nlist = nlist, nprobe = VectorQueries.ivfNProbe(nlist),
        k = Int.MaxValue)
      .select(col("probe_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val (win, base) = chosen.keys.toSeq.sorted.map { pid =>
      val q = vecs(pid)
      val w = chosen(pid).toSeq.map(id => cos(q, vecs(id)))
      val c = cands(pid).toSeq.map(id => cos(q, vecs(id)))
      (w.sum / w.size, c.sum / c.size)
    }.unzip
    assert(win.sum / win.size > base.sum / base.size,
      s"residual-ADC picks (${win.sum / win.size}) must beat the candidate " +
        s"mean (${base.sum / base.size})")
  }
}
