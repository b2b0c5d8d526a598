package graft

import org.apache.spark.sql.functions._

/** q137–q138 — corpus/model diagnostics (Zipf power-law fit,
  * cluster-quality metrics). The DuckDB oracles prove cross-engine
  * equality; these specs recompute each diagnostic driver-side from the
  * raw tables (own tokenization, own Lloyd, own OLS — plain doubles,
  * compared within the decimal-routing tolerance) and pin the
  * metric-theoretic shape: a Zipfian slope is negative with r² in
  * (0, 1]; silhouettes live in [-1, 1]; member counts are exact.
  */
class CorpusDiagnosticsSpec extends SparkTestBase {

  test("q137: OLS moments match a driver-side fit; slope negative, r2 in (0,1]") {
    val counts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .flatMap(_.getString(1).trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, o) => (t, o.length.toLong) }
    val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(operators.TextQueries.ZipfV)
    val xy = top.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble)) }
    val n = xy.size.toDouble
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val num = n * sxy - sx * sy
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    val slope = num / denx
    val r = SparkEntry.queries("q137_zipf_fit")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == xy.size) // n_fit
    assert(math.abs(row.getDouble(2) - slope) < 1e-9)
    assert(math.abs(row.getDouble(3) - (sy - slope * sx) / n) < 1e-9)
    assert(math.abs(row.getDouble(4) - (num * num) / (denx * deny)) < 1e-9)
    assert(row.getDouble(2) < 0.0, "token frequencies must decay with rank")
    assert(row.getDouble(4) > 0.0 && row.getDouble(4) <= 1.0)
  }

  test("q138: silhouette/sigma/DB match a driver-side Lloyd replay") {
    val pts = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    val k = operators.VectorQueries.KmK
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def assignTo(cents: Seq[(Int, Array[Double])], v: Array[Double]): Int =
      // ties to the larger cid — the NearestCentroid contract
      cents.map { case (cid, c) => (cos(v, c), cid) }.max._2
    // round 1: seeds are vec_id < k
    val seeds = pts.take(k).map { case (id, v) => (id.toInt, v) }.toSeq
    val a1 = pts.map { case (id, v) => (id, v, assignTo(seeds, v)) }
    // round 2: component means of the round-1 assignment
    val cents2 = a1.groupBy(_._3).map { case (cid, rows) =>
      val dim = rows.head._2.length
      cid -> Array.tabulate(dim)(j => rows.map(_._2(j)).sum / rows.length)
    }.toSeq.sortBy(_._1)
    val a2 = pts.map { case (id, v) => (id, v, assignTo(cents2, v)) }
    val centMap = cents2.toMap
    val perPoint = a2.map { case (_, v, cid) =>
      val a = 1.0 - cos(v, centMap(cid))
      val b = 1.0 - centMap.collect { case (c, cv) if c != cid => cos(v, cv) }.max
      val sil = if (math.max(a, b) > 0) (b - a) / math.max(a, b) else 0.0
      (cid, a, sil)
    }
    val perCluster = perPoint.groupBy(_._1).map { case (cid, rows) =>
      cid -> (rows.length.toLong, rows.map(_._3).sum / rows.length,
        rows.map(_._2).sum / rows.length)
    }
    val db = perCluster.map { case (i, (_, _, si)) =>
      i -> perCluster.collect { case (j, (_, _, sj)) if j != i =>
        (si + sj) / (1.0 - cos(centMap(i), centMap(j))) }.max
    }
    val got = SparkEntry.queries("q138_cluster_quality")(spark, sf).collect()
      .map(r => r.getLong(0).toInt ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == perCluster.keySet)
    got.foreach { case (cid, (n, meanSil, sigma, dbv)) =>
      val (en, eSil, eSigma) = perCluster(cid)
      assert(n == en, s"cluster $cid member count")
      assert(math.abs(meanSil - eSil) < 1e-6, s"cluster $cid silhouette")
      assert(math.abs(sigma - eSigma) < 1e-6, s"cluster $cid sigma")
      assert(math.abs(dbv - db(cid)) < 1e-6, s"cluster $cid DB")
      assert(meanSil >= -1.0 - 1e-9 && meanSil <= 1.0 + 1e-9)
      assert(sigma >= -1e-9)
    }
  }
}
