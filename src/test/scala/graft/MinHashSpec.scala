package graft

import org.apache.spark.sql.functions._
import graft.operators.MinHashLSH

class MinHashSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
  private val nearDup = base.replace("tonight", "today") // high Jaccard
  private val unrelated = "completely different content about databases query engines and distributed aggregation frameworks at scale"

  private def docs = Seq(
    (0L, base), (1L, nearDup), (2L, unrelated),
    (3L, "short text"), (4L, base) // exact dup of 0
  ).toDF("doc_id", "text")

  test("near-dup and exact-dup pairs are found; unrelated are not") {
    val pairs = MinHashLSH.verifiedPairs(docs, minJaccard = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 4L)), "exact dup must be a candidate pair")
    assert(pairs.contains((0L, 1L)), "near dup must be a candidate pair")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), "unrelated doc must not pair")
  }

  test("exact duplicates have jaccard 1.0") {
    val j = MinHashLSH.verifiedPairs(docs, 0.5)
      .filter(col("doc_a") === 0L && col("doc_b") === 4L)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("shingles of short docs degrade to whole text") {
    val sh = docs.filter(col("doc_id") === 3L)
      .select(MinHashLSH.shingles(col("text")).as("sh"))
      .as[Seq[String]].head()
    assert(sh == Seq("short text"))
  }

  test("candidatePairs summary always returns one row") {
    val noDups = Seq((0L, "alpha beta gamma delta epsilon zeta"),
                     (1L, "one two three four five six")).toDF("doc_id", "text")
    val row = MinHashLSH.candidatePairs(noDups, 0.5).collect()
    assert(row.length == 1)
    assert(row.head.getLong(0) == 0L)
  }

  test("q178: combo counts equal a driver tagging of the verified pairs; leakage is real") {
    import graft.operators.ApproxOracle
    def splitOf(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bkt = Integer.parseInt(h.substring(0, 2), 16)
      if (bkt < 204) "train" else if (bkt < 230) "val" else "test"
    }
    val pairs = MinHashLSH.verifiedPairs(
        Tables.documents(spark, sf).select(col("doc_id"), col("text")),
        ApproxOracle.MinJaccard)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = pairs.map { case (a, b) =>
      val (sa, sb) = (splitOf(a), splitOf(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("q178_split_leakage")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3), r.getDouble(4)))).toMap
    assert(got.keySet == want.keySet)
    val total = pairs.length.toLong
    got.foreach { case ((lo, hi), (n, cross, frac)) =>
      assert(n == want((lo, hi)) && cross == (lo != hi) &&
        frac == n.toDouble / total, s"($lo,$hi)")
      assert(lo <= hi, "combos must be canonicalized")
    }
    assert(got.values.map(_._1).sum == total, "pairs lost or double-counted")
    // the audit's reason to exist: this corpus DOES leak across splits
    assert(got.exists { case ((lo, hi), _) => lo != hi },
      "no cross-split near-dup — leakage untestable here")
    assert(got.exists { case ((lo, hi), _) => lo == hi })
  }

  test("q180: cluster-aware split equals a driver replay and zeroes the leakage q178 measures") {
    import graft.operators.ApproxOracle
    def bucketSplit(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bkt = Integer.parseInt(h.substring(0, 2), 16)
      if (bkt < 204) "train" else if (bkt < 230) "val" else "test"
    }
    val pairs = MinHashLSH.verifiedPairs(
        Tables.documents(spark, sf).select(col("doc_id"), col("text")),
        ApproxOracle.MinJaccard)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // driver union-find over the pairs, min-root convention
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
        parent(hi) = lo }
    }
    val docIds = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val rootOf = docIds.map(d => d -> find(d)).toMap
    val splitOf = rootOf.view.mapValues(bucketSplit).toMap
    val want = docIds.groupBy(splitOf).view.mapValues { ds =>
      (ds.length.toLong, ds.count(d => rootOf(d) != d).toLong)
    }.toMap
    val wantWithin = pairs.groupBy(p => splitOf(p._1))
      .view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("q180_cluster_split")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (split, (nd, nnr, npw, npc)) =>
      assert((nd, nnr) == want(split), s"$split docs")
      assert(npw == wantWithin.getOrElse(split, 0L), s"$split within pairs")
      assert(npc == 0L, "the fix must zero cross-split pairs")
    }
    // the fix is non-vacuous in both directions: clusters exist (some
    // doc was re-rooted), and the PROBLEM exists (q178 measures real
    // leakage under doc-level splits on this same corpus)
    assert(got.values.map(_._2).sum > 0, "no doc re-rooted — fix vacuous")
    assert(pairs.exists { case (a, b) =>
        bucketSplit(a) != bucketSplit(b) },
      "doc-level splits leak nothing here — the fix fixes nothing")
    // twins always share a split under the fix
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b)) }
  }
}
