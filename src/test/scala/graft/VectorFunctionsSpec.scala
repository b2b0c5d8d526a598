package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.VectorQueries

class VectorFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("dot, norm, cosine on known vectors") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
      .select(dot(col("a"), col("b")).as("d"),
              l2Norm(col("a")).as("na"),
              cosine(col("a"), col("b")).as("c"))
    val r = df.as[(Double, Double, Double)].head()
    assert(r._1 == 32.0)
    assert(math.abs(r._2 - math.sqrt(14.0)) < 1e-12)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(r._3 - expected) < 1e-12)
  }

  test("hyperplane bucket is deterministic and within range") {
    val planes = VectorQueries.hyperplanes(8, 4)
    val df = Seq(Tuple1(Array(0.1, -0.2, 0.3, 0.4)),
                 Tuple1(Array(-1.0, 2.0, -3.0, 0.5))).toDF("v")
      .select(hyperplaneBucket(col("v"), planes).as("b"))
    val bs = df.as[Long].collect()
    assert(bs.forall(b => b >= 0 && b < 256))
    val again = Seq(Tuple1(Array(0.1, -0.2, 0.3, 0.4))).toDF("v")
      .select(hyperplaneBucket(col("v"), planes).as("b")).as[Long].head()
    assert(again == bs(0))
  }

  test("ANN results are a subset-quality match of brute force (recall)") {
    val brute = SparkEntry.queries("q31_knn_brute")(spark, sf)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = SparkEntry.queries("q33_ann_lsh")(spark, sf)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ann.nonEmpty, "ANN should return candidates")
    val recall = (ann & brute).size.toDouble / brute.size
    // 4-table×5-bit LSH on near-uniform random synthetic vectors (the
    // LSH worst case; real embeddings cluster): expect ~0.3 recall.
    assert(recall > 0.1, s"ANN recall vs brute force was $recall")
  }

  test("cosine near-dup finds planted duplicates, skips unrelated") {
    import org.apache.spark.sql.functions.{col, lit}
    val rnd = new scala.util.Random(5)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val base = vec()
    val nearDup = base.zipWithIndex.map { case (v, i) => if (i == 0) v + 0.01 else v }
    val rows = Seq((0L, base), (1L, nearDup), (2L, vec()), (3L, vec()),
                   (4L, base)) // exact dup of 0
    val df = rows.toDF("vec_id", "emb")
    val pairs = graft.operators.VectorQueries
      .cosineNearDupPairs(df, minCos = 0.95)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 4L)), "exact dup must be found")
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 4L)), "near dup must be found")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L || p._1 == 3L || p._2 == 3L),
      "random vectors must not pair at cos>=0.95")
  }

  test("IVF plan stays O(1) in nlist: broadcast centroids, no plan literals") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("emb"))
    val n = e.count()
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("emb").as("pemb"))
    // nlist=64: the old literal-array formulation put 64×64 doubles in
    // the projection (~100KB of plan text and growing with nlist); the
    // broadcast-expression plan is constant-size.
    val df = graft.operators.IvfIndex.topK(e, probes,
      nlist = 64, nprobe = 8, k = 3, approxRows = Some(n))
    val planText = df.queryExecution.optimizedPlan.toString
    assert(planText.length < 20000,
      s"plan text is ${planText.length} chars — centroids leaked into the plan?")
    // k is honored: no probe returns more than k neighbors
    val perProbe = df.groupBy(col("probe_id")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(perProbe <= 3)
  }

  test("IVF ANN recall vs brute force (nprobe=4 of nlist=16 cells)") {
    val brute = SparkEntry.queries("q31_knn_brute")(spark, sf)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = SparkEntry.queries("q37_ann_ivf")(spark, sf)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    val recall = (ivf & brute).size.toDouble / brute.size
    // searching 1/4 of the cells on near-uniform vectors: modest floor
    assert(recall > 0.15, s"IVF recall vs brute force was $recall")
  }
}
