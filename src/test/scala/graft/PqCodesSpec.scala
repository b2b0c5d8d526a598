package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine
import graft.operators.VectorQueries

/** q95 — product quantization. The oracle proves the codebooks and the
  * ADC cut are cross-engine exact; these specs prove the properties the
  * oracle can't see: the code table's shape (every vector coded, all
  * PqM codes inside their codebooks) and that the quantized search is
  * INFORMATIVE — ADC winners must be truly closer to the query than the
  * corpus average, else the compression lost the geometry.
  */
class PqCodesSpec extends SparkTestBase {

  private lazy val n = VectorQueries.emb(spark, sf).count()

  test("q95: top-k shape and code ranges across all PqM subspaces") {
    val k = VectorQueries.pqK(n)
    val out = SparkEntry.queries("q95_pq_codes")(spark, sf).collect()
    assert(out.length == VectorQueries.PqTopK)
    // schema: vec_id, c0..c{M-1}, adc
    assert(out.head.schema.fieldNames.toSeq ==
      "vec_id" +: (0 until VectorQueries.PqM).map(i => s"c$i") :+ "adc")
    out.foreach { r =>
      (1 to VectorQueries.PqM).foreach(i =>
        assert(r.getLong(i) >= 0 && r.getLong(i) < k, r.toString))
      assert(math.abs(r.getDouble(1 + VectorQueries.PqM)) <= 1.0 + 1e-9,
        r.toString)
    }
  }

  test("q96: every probe answers its full top-5 from its pruned cells") {
    val out = SparkEntry.queries("q96_ivf_pq")(spark, sf).collect()
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
      s"ADC picks (${win.sum / win.size}) must beat the candidate mean " +
        s"(${base.sum / base.size}) — the codes lost the geometry")
  }

  test("q95: ADC winners are truly closer to the query than the corpus mean") {
    val e = VectorQueries.emb(spark, sf)
    val q = e.filter(col("vec_id") === 0).select(col("emb"))
      .head.getSeq[Double](0)
    // vec_id 0 IS the query (cosine 1.0) — exclude it from winners and
    // from the corpus mean, like q96's self-exclusion, so the assertion
    // measures what quantization kept, not the trivial self-match
    val trueCos = e
      .withColumn("cos", cosine(col("emb"), array(q.map(lit): _*)))
      .select(col("vec_id"), col("cos")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      .removed(0L)
    val winners = SparkEntry.queries("q95_pq_codes")(spark, sf)
      .collect().map(_.getLong(0)).filter(_ != 0L)
    val winMean = winners.map(trueCos).sum / winners.length
    val allMean = trueCos.values.sum / trueCos.size
    assert(winMean > allMean,
      s"ADC top-${winners.length} mean true-cosine $winMean should beat " +
        s"the corpus mean $allMean — quantization lost the geometry")
  }

  test("pqK: floor at small corpora, ∝ n in the middle, capped at a byte") {
    assert(VectorQueries.pqK(500) == 8, "test-SF floor (old constant)")
    assert(VectorQueries.pqK(2000) == 32)
    assert(VectorQueries.pqK(10000) ==
      math.ceil(10000 / VectorQueries.PqTargetRowsPerCode.toDouble).toInt)
    assert(VectorQueries.pqK(100L * 1000 * 1000) == 256, "one-byte code cap")
  }

  test("pq slices reassemble the vector exactly, any dim vs any M") {
    // concat of the M slice expressions must equal the original vector
    // (the property the ADC reconstruction and both engines' boundary
    // arithmetic depend on), including dims M does not divide
    import spark.implicits._
    for (dim <- Seq(7, 16, 64); m <- Seq(2, 3, 4)) {
      val df = Seq((0L, (1 to dim).map(_.toDouble))).toDF("vec_id", "emb")
      val slices = VectorQueries.pqSliceExprs(m)
      val back = df.select(concat(slices.map(expr): _*).as("r"))
        .head.getSeq[Double](0)
      assert(back == (1 to dim).map(_.toDouble),
        s"dim=$dim m=$m reassembled to $back")
      val sizes = df.select(array(slices.map(sl => size(expr(sl))): _*))
        .head.getSeq[Int](0)
      assert(sizes.sum == dim && sizes.max - sizes.min <= 1,
        s"dim=$dim m=$m slice sizes $sizes must be near-equal")
    }
  }
}
