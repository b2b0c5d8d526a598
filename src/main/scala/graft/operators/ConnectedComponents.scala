package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star / small-star
  * contractions (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14 — public literature). The dedup-pipeline step that
  * turns near-dup PAIRS into dup CLUSTERS so one representative per
  * cluster can be kept.
  *
  * Each round is two pure groupBy+join stages over the edge set — no
  * driver-side graph state, no vertex program — and the edge set
  * monotonically contracts toward a forest of stars whose centers are
  * the component minima. Convergence is O(log² n) rounds on adversarial
  * graphs and 2–3 rounds on dedup graphs (small-diameter clusters);
  * each round shuffles only the current edge set, so the operator's
  * peak cost is bounded by the near-dup pair volume, not the corpus.
  *
  * The driver loop watches a cheap (count, sum) checksum per round and
  * confirms an apparent fixpoint with one exact set comparison — at
  * 100 TB that exactness costs a single extra join on the final
  * (maximally contracted) edge set.
  */
object ConnectedComponents {

  /** large-star: every neighbor v > u links to m = min(N(u) ∪ {u}). */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbr = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val m = nbr.groupBy(col("u")).agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    nbr.join(m, "u").filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** small-star: orient edges high→low; every low neighbor (and u
    * itself) links to the minimum. */
  private def smallStar(e: DataFrame): DataFrame = {
    val nbr = e.select(greatest(col("u"), col("v")).as("u"),
                       least(col("u"), col("v")).as("v"))
    val m = nbr.groupBy(col("u")).agg(min(col("v")).as("m"))
    nbr.join(m, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(m.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), coalesce(sum(col("u") + col("v")), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Conf key for the driver-vs-distributed switchover (edge count).
    * Below it the deduped edge list (≤ threshold × 16 B) is collected
    * and union-found on the driver; above it the log-round contraction
    * runs. Tunable per deployment like a broadcast threshold. */
  val ThresholdConf = "spark.graft.cc.driverThreshold"
  val DefaultDriverThreshold = 100000L

  /** Component labels for every endpoint of `edges` (src, dst):
    * (doc_id, comp_id) with comp_id = the component's minimum id.
    * Isolated vertices never appear in an edge list, so callers decide
    * their fate (a dedup pipeline keeps them as-is).
    *
    * Hybrid execution, same spirit as Catalyst's broadcast-vs-shuffle
    * choice: below the threshold (the `driverThreshold` arg, or
    * `spark.graft.cc.driverThreshold` when the arg is negative) the
    * graph is union-found on the driver in one pass (each
    * star-contraction ROUND costs several scheduled jobs — pure
    * overhead for a graph that fits in memory); above it, the
    * distributed log-round contraction runs. A 100 TB corpus's near-dup
    * edge list lands in the distributed path; a per-batch incremental
    * run lands in the driver path. Both paths are asserted equal in
    * ConnectedComponentsSpec, including exactly at the boundary. */
  def labels(spark: SparkSession, edges: DataFrame, maxRounds: Int = 50,
             driverThreshold: Long = -1L): DataFrame =
    labelsWithRounds(spark, edges, maxRounds, driverThreshold)._1

  /** `labels` plus the number of contraction rounds run (0 = driver
    * path) — lets specs/ops pin convergence behavior at scale. */
  def labelsWithRounds(spark: SparkSession, edges: DataFrame,
                       maxRounds: Int = 50,
                       driverThreshold: Long = -1L): (DataFrame, Int) = {
    val thr =
      if (driverThreshold >= 0L) driverThreshold
      else spark.conf.get(ThresholdConf, DefaultDriverThreshold.toString).toLong
    val e0 = edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    if (e0.count() <= thr) (labelsDriver(spark, e0), 0)
    else labelsDistributed(e0, maxRounds)
  }

  /** Driver union-find with path compression; min id becomes the root.
    * find() is ITERATIVE (path halving): a recursive walk overflows the
    * driver stack on a ~100k-edge path whose parent chain never got
    * compressed during construction. */
  private def labelsDriver(spark: SparkSession, e: DataFrame): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElseUpdate(x, x)
      while (p != x) {
        val gp = parent.getOrElseUpdate(p, p)
        parent(x) = gp // path halving
        x = gp
        p = parent.getOrElseUpdate(x, x)
      }
      x
    }
    e.select(col("u"), col("v")).as[(Long, Long)].collect().foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.toSeq.map(k => (k, find(k))).toDF("doc_id", "comp_id")
  }

  private def labelsDistributed(e0: DataFrame, maxRounds: Int): (DataFrame, Int) = {
    // localCheckpoint (eager) after every round: an iterative DataFrame
    // algorithm must TRUNCATE LINEAGE or the logical plan nests a copy
    // of the previous round's plan per self-reference and grows
    // exponentially — planning itself OOMs near round 10. On a real
    // cluster with executor loss concerns, swap for reliable
    // checkpoint(); the algorithm is unchanged.
    var e = e0
    var prev = checksum(e)
    var rounds = 0
    var done = e.isEmpty
    while (!done && rounds < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val cur = checksum(next)
      if (cur == prev) {
        // checksum collision is possible in theory — confirm exactly
        done = next.exceptAll(e).isEmpty && e.exceptAll(next).isEmpty
      }
      e = next
      prev = cur
      rounds += 1
    }
    require(done || rounds < maxRounds, s"CC did not converge in $maxRounds rounds")
    // converged: e is a forest of stars (u -> component minimum)
    (e.select(col("u").as("doc_id"), col("v").as("comp_id"))
      .union(e.select(col("v").as("doc_id"), col("v").as("comp_id")))
      .distinct(), rounds)
  }
}
