package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, VectorQueries}

/** The two-level centroid assignment (IvfIndex.corpusCellCol above
  * HierNlistThreshold): deterministic, near-identical to the flat
  * scan, and actually engaged at large nlist. The flat scan is the
  * ground truth the hierarchy approximates — the spec quantifies the
  * approximation instead of assuming it. */
class HierAssignSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(16)(rnd.nextGaussian())))
      .toDF("vec_id", "emb")
  }

  test("below the threshold the path is the flat scan — harness SFs unchanged") {
    val e = VectorQueries.emb(spark, sf)
    val n = e.count()
    assert(VectorQueries.ivfNList(n) <= IvfIndex.HierNlistThreshold,
      "test corpora must stay on the flat path")
  }

  test("above the threshold: deterministic, near-lossless quantization vs the flat scan") {
    val n = 80000
    val e = corpus(n, seed = 31).localCheckpoint()
    val nlist = VectorQueries.ivfNList(n) // 625 > threshold
    assert(nlist > IvfIndex.HierNlistThreshold)
    val cents = IvfIndex.centroids(e, nlist, Some(n.toLong))
    val hier = IvfIndex.assignWith(e, cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // determinism across a different shuffle partitioning
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    spark.conf.set(key, "7")
    val hier2 =
      try IvfIndex.assignWith(e, cents)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      finally spark.conf.set(key, orig)
    assert(hier == hier2, "hier assignment must be deterministic")
    // flat ground truth (driver-side, same cosine semantics)
    val rows = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val m = math.min(a.length, b.length)
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < m) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val dn = math.sqrt(na) * math.sqrt(nb)
      if (dn == 0.0) 0.0 else d / dn
    }
    // sample 2000 vectors for the flat comparison (full flat is the
    // O(n·nlist) cost the hierarchy exists to avoid). The quality
    // metric is QUANTIZATION quality — cosine to the assigned
    // centroid vs cosine to the true argmax — not argmax identity:
    // random 16-dim gaussians are the worst case for a coarse
    // quantizer (near-uniform cosines, so many centroids tie closely
    // and the exact winner is unstable), and what IVF needs is a
    // NEARBY centroid, which is what cprobe buys. This is the same
    // acceptance FAISS's approximate coarse quantizers (IVF-HNSW)
    // work under.
    val sample = rows.filter(_._1 % 40 == 0)
    var flatSum = 0.0; var hierSum = 0.0; var agree = 0
    sample.foreach { case (id, v) =>
      var best = Double.NegativeInfinity; var bi = 0
      var i = 0
      while (i < cents.length) {
        val s = cos(v, cents(i))
        if (s > best || (s == best && i > bi)) { best = s; bi = i }
        i += 1
      }
      flatSum += best
      hierSum += cos(v, cents(hier(id)))
      if (hier(id) == bi) agree += 1
    }
    val gap = (flatSum - hierSum) / sample.length
    assert(gap <= 0.1,
      f"mean assigned-cosine gap $gap%.4f vs the flat argmax exceeds 0.1 — " +
        "coarse probing too lossy")
    assert(agree.toDouble / sample.length >= 0.5,
      "hier should still find the exact argmax for most vectors")
    // and every assigned cell id must be a valid fine centroid
    assert(hier.values.forall(c => c >= 0 && c < nlist))
  }
}
