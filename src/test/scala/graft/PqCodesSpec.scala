package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine
import graft.operators.VectorQueries

/** q95 — product quantization. The oracle proves the codebooks and the
  * ADC cut are cross-engine exact; these specs prove the properties the
  * oracle can't see: the code table's shape (every vector coded, codes
  * inside both codebooks) and that the quantized search is INFORMATIVE —
  * ADC winners must be truly closer to the query than the corpus
  * average, else the compression lost the geometry.
  */
class PqCodesSpec extends SparkTestBase {

  test("q95: top-k shape and code ranges") {
    val out = SparkEntry.queries("q95_pq_codes")(spark, sf).collect()
    assert(out.length == VectorQueries.PqTopK)
    out.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < VectorQueries.PqK, r.toString)
      assert(r.getLong(2) >= 0 && r.getLong(2) < VectorQueries.PqK, r.toString)
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9, r.toString)
    }
  }

  test("q96: every probe answers its full top-5 from its pruned cells") {
    val out = SparkEntry.queries("q96_ivf_pq")(spark, sf).collect()
    val byProbe = out.groupBy(_.getLong(0))
    assert(byProbe.keySet == (0L until 10L).toSet,
      s"expected all 10 probes answered, got ${byProbe.keySet}")
    byProbe.foreach { case (pid, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 5L),
        s"probe $pid ranks: ${rows.map(_.getLong(3)).sorted.toSeq}")
      assert(!rows.exists(_.getLong(1) == pid), s"probe $pid returned itself")
    }
  }

  test("q96: ADC-chosen neighbors beat the probed-cell average on true cosine") {
    // the compressed rescore must PICK WELL inside the candidate set:
    // for each probe, the mean exact cosine of its ADC top-5 has to
    // beat the mean over everything its pruned cells offered
    val e = VectorQueries.emb(spark, sf)
    val vecs = e.select(col("vec_id"), col("emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.lazyZip(b).map(_ * _).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val chosen = SparkEntry.queries("q96_ivf_pq")(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val cands = graft.operators.IvfIndex.topK(e,
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("emb").as("pemb")),
        nlist = VectorQueries.IvfNList, nprobe = VectorQueries.IvfNProbe,
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
      s"ADC picks (${win.sum / win.size}) must beat the candidate mean " +
        s"(${base.sum / base.size}) — the codes lost the geometry")
  }

  test("q95: ADC winners are truly closer to the query than the corpus mean") {
    val e = VectorQueries.emb(spark, sf)
    val q = e.filter(col("vec_id") === 0).select(col("emb"))
      .head.getSeq[Double](0)
    val trueCos = e
      .withColumn("cos", cosine(col("emb"), array(q.map(lit): _*)))
      .select(col("vec_id"), col("cos")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val winners = SparkEntry.queries("q95_pq_codes")(spark, sf)
      .collect().map(_.getLong(0))
    val winMean = winners.map(trueCos).sum / winners.length
    val allMean = trueCos.values.sum / trueCos.size
    assert(winMean > allMean,
      s"ADC top-${winners.length} mean true-cosine $winMean should beat " +
        s"the corpus mean $allMean — quantization lost the geometry")
  }
}
