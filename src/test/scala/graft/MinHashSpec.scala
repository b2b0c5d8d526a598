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
}
