package graft

import graft.operators.ConnectedComponents

/** Large-star/small-star connected components vs a driver-side
  * union-find reference. */
class ConnectedComponentsSpec extends SparkTestBase {

  /** Both execution paths must agree: driver union-find (default
    * threshold) and distributed star contraction (threshold 0). */
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    val driver = ConnectedComponents.labels(spark, df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = ConnectedComponents.labels(spark, df, driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver == dist, "driver and distributed paths must agree")
    dist
  }

  /** Union-find reference with min-id labels. */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain, clique, star, and separate components all label to the min id") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    assert(cc(chain) == (0L to 9L).map(_ -> 0L).toMap)

    val clique = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    assert(cc(clique) == (10L to 14L).map(_ -> 10L).toMap)

    val star = (21L to 26L).map(i => (20L, i))
    assert(cc(star) == (20L to 26L).map(_ -> 20L).toMap)

    val two = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    assert(cc(two) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("random graphs match union-find across seeds") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val edges = (0 until 160).map(_ =>
        (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
        .filter { case (a, b) => a != b }
      assert(cc(edges) == reference(edges), s"seed $seed")
    }
  }

  test("a 1000-node path graph converges within the default round cap") {
    // the adversarial case for star contraction: maximum diameter per
    // edge count. Kiveris et al. bound rounds by O(log^2 n); in
    // practice each large/small-star round roughly squares the
    // contraction, so 1000 nodes must fit the default 50 cap easily.
    val n = 1000L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    assert(cc(chain) == (0L until n).map(_ -> 0L).toMap)
  }

  test("edge order and duplicate/reversed edges do not change the labels") {
    val edges = Seq((5L, 3L), (3L, 5L), (5L, 3L), (7L, 5L), (9L, 8L))
    assert(cc(edges) == Map(3L -> 3L, 5L -> 3L, 7L -> 3L, 8L -> 8L, 9L -> 8L))
  }

  test("empty and self-loop-only edge sets produce no labels") {
    assert(cc(Seq.empty) == Map.empty)
    assert(cc(Seq((4L, 4L))) == Map.empty)
  }
}
