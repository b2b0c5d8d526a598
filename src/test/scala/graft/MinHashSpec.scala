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
}
