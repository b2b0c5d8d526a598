package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeans

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  /** Three tight planted blobs around orthogonal unit directions, with
    * the first 3 ids one per blob (so the deterministic seeds start one
    * centroid inside each blob). */
  private def blobs = {
    val dirs = Seq(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0))
    val rnd = new scala.util.Random(7)
    (0 until 90).map { i =>
      val d = dirs(i % 3)
      val v = d.map(x => x + rnd.nextGaussian() * 0.05)
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n))
    }.toDF("vec_id", "emb")
  }

  test("planted blobs are recovered exactly after two Lloyd rounds") {
    val assigned = KMeans.lloyd(blobs, k = 3, iters = 2)
      .select($"vec_id", $"cid").as[(Long, Int)].collect()
    // id i belongs to blob i%3, and seed i (= vec_id i) started in blob i
    assert(assigned.length == 90)
    assert(assigned.forall { case (id, cid) => cid == (id % 3).toInt })
  }

  test("a Lloyd round strictly improves within-cluster cosine") {
    def meanCos(assigned: org.apache.spark.sql.DataFrame): Double = {
      val cents = KMeans.meanCentroids(assigned)
      val bc = spark.sparkContext.broadcast(cents)
      assigned.select($"emb", $"cid").as[(Array[Double], Int)].collect().map {
        case (v, cid) =>
          val c = bc.value(cid)
          val dot = v.zip(c).map { case (a, b) => a * b }.sum
          val nc = math.sqrt(c.map(x => x * x).sum)
          dot / nc // |v| == 1
      }.sum / 90.0
    }
    // a deliberately bad start: all three seeds inside blob 0
    val seeds = blobs.filter($"vec_id".isin(0L, 3L, 6L))
      .orderBy($"vec_id").select($"emb").as[Array[Double]].collect()
    val round1 = KMeans.assign(blobs, seeds)
    val round2 = KMeans.assign(blobs, {
      val m = KMeans.meanCentroids(round1)
      m.keys.toArray.sorted.map(m)
    })
    assert(meanCos(round2) > meanCos(round1))
  }

  test("an emptied cluster disappears and survivors keep their cids") {
    // Seeds 0 and 1 are identical vectors: every point ties and the
    // larger-cid rule sends it to cluster 1, so cluster 0 is empty
    // after round 1 and must be COMPACTED out before round 2 (a stale
    // centroid array would re-admit it; the oracle's relational form
    // cannot).
    val pts = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(1.0, 0.0)),
      (2L, Array(0.9, 0.4359)), (3L, Array(0.9, -0.4359))
    ).toDF("vec_id", "emb")
    val out = KMeans.lloyd(pts, k = 2, iters = 2)
      .select($"cid").distinct().as[Int].collect().toSet
    assert(out == Set(1), s"expected all points in surviving cluster 1, got $out")
  }

  test("q68 topic profile partitions every embedded doc exactly once") {
    val prof = SparkEntry.queries("q68_topic_profile")(spark, sf)
    val rows = prof.select($"topic_id", $"n_docs").as[(Long, Long)].collect()
    assert(rows.map(_._2).sum == 500, "each (vec, doc) pair lands in one topic")
    assert(rows.forall { case (t, _) => t >= 0 && t < 8 })
  }

  test("q65 cluster profile covers the corpus with k clusters at most") {
    val prof = SparkEntry.queries("q65_kmeans")(spark, sf)
    val rows = prof.select($"cluster_id", $"n_members").as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 8)
    assert(rows.map(_._2).sum == 500) // every embedding assigned exactly once
    assert(rows.forall { case (cid, _) => cid >= 0 && cid < 8 })
  }
}
