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

  test("labels are identical one edge below, at, and above the path threshold") {
    import spark.implicits._
    // 40 deduped edges: two 11-node chains + an 18-edge clique remainder
    val edges = ((0L until 10L).map(i => (i, i + 1)) ++
      (100L until 110L).map(i => (i, i + 1)) ++
      (for (a <- 200L to 205L; b <- (a + 1) to 205L) yield (a, b)).take(20)).toSeq
    val df = edges.toDF("src", "dst")
    val n = edges.distinct.size.toLong
    val runs = Seq(n - 1, n, n + 1).map { thr =>
      val (lab, rounds) = ConnectedComponents.labelsWithRounds(
        spark, df, driverThreshold = thr)
      (lab.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
    }
    // below the threshold: distributed (rounds > 0); at and above: driver
    assert(runs(0)._2 > 0, "thr = n-1 must take the distributed path")
    assert(runs(1)._2 == 0, "thr = n must take the driver path")
    assert(runs(2)._2 == 0, "thr = n+1 must take the driver path")
    assert(runs.map(_._1).distinct.size == 1,
      "the boundary must never change the labels")
  }

  test("conf key selects the path when no explicit threshold is passed") {
    import spark.implicits._
    val df = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val key = ConnectedComponents.ThresholdConf
    try {
      spark.conf.set(key, "0")
      assert(ConnectedComponents.labelsWithRounds(spark, df)._2 > 0)
      spark.conf.set(key, "1000")
      assert(ConnectedComponents.labelsWithRounds(spark, df)._2 == 0)
    } finally spark.conf.unset(key)
  }

  // Slow (r15): the 1M-edge closed-form sweep is ~20 s of pure volume;
  // the same exact-labels + pinned-round-count invariant gates at 100k
  // edges in the untagged sibling below.
  test("distributed path at 1M edges: exact labels, pinned round count", Slow) {
    // 100k disjoint 10-edge chains — 1M edges of the ADVERSARIAL regime
    // (maximum diameter per edge count; dense graphs contract faster by
    // construction). Labels are known in closed form (each node joins
    // its chain head), so no union-find reference is needed.
    import spark.implicits._
    val chains = spark.range(1000000L)
      .selectExpr("(id div 10) * 11 + (id % 10) as src",
                  "(id div 10) * 11 + (id % 10) + 1 as dst")
    val (lab, rounds) = ConnectedComponents.labelsWithRounds(
      spark, chains, driverThreshold = 0L)
    val bad = lab.filter(org.apache.spark.sql.functions.expr(
      "comp_id != (doc_id div 11) * 11")).count()
    assert(bad == 0L, "every node must label to its chain head")
    assert(lab.count() == 1100000L)
    // diameter-10 chains contract in a handful of rounds; pin the
    // envelope so a regression to linear convergence is loud
    info(s"1M-edge distributed CC converged in $rounds rounds")
    assert(rounds <= 6, s"expected <=6 contraction rounds, got $rounds")
  }

  test("distributed path at 100k edges: exact labels, pinned round count") {
    // the untagged sibling of the 1M sweep above: same adversarial
    // disjoint-chain geometry and closed-form labels at a tenth the
    // volume, so the default suite still gates the distributed path's
    // exactness and contraction envelope
    import spark.implicits._
    val chains = spark.range(100000L)
      .selectExpr("(id div 10) * 11 + (id % 10) as src",
                  "(id div 10) * 11 + (id % 10) + 1 as dst")
    val (lab, rounds) = ConnectedComponents.labelsWithRounds(
      spark, chains, driverThreshold = 0L)
    val bad = lab.filter(org.apache.spark.sql.functions.expr(
      "comp_id != (doc_id div 11) * 11")).count()
    assert(bad == 0L, "every node must label to its chain head")
    assert(lab.count() == 110000L)
    info(s"100k-edge distributed CC converged in $rounds rounds")
    assert(rounds <= 6, s"expected <=6 contraction rounds, got $rounds")
  }
}
