package graft

import org.apache.spark.sql.functions._
import graft.operators.SimHash

class SimHashSpec extends SparkTestBase {
  import spark.implicits._

  test("identical texts get identical signatures; near texts low hamming") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (0L, base),
      (1L, base),                                  // identical -> hamming 0
      (2L, base.replace("today", "tomorrow")),     // near -> small hamming
      (3L, "totally unrelated corpus about spark catalyst optimizer rules and shuffle exchanges")
    ).toDF("doc_id", "text")

    val h = SimHash.hammingAdjacent(docs)
      .select("doc_a", "hamming").as[(Long, Long)].collect().toMap
    assert(h(0L) == 0L, s"identical docs must have hamming 0, got ${h(0L)}")
    assert(h(1L) < 16L, s"near-dup should be close, got ${h(1L)}")
    assert(h(2L) > h(1L), "unrelated doc should be farther than near-dup")
  }

  test("banded all-pairs finds every pair within hamming 3, never misses") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today and stays"
    val docs = Seq(
      (0L, base), (7L, base),                           // exact dup, non-adjacent ids
      (3L, base.replace("stays", "sleeps")),            // near
      (5L, "completely unrelated words about query optimizers shuffles and codegen stages")
    ).toDF("doc_id", "text")
    val pairs = SimHash.nearDupPairs(docs, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 7L)), "exact dup pair (hamming 0) must be found")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), "unrelated doc must not pair")
    // exhaustive check: banding found exactly the pairs brute force finds
    val sigs = SimHash.signatures(docs).as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    assert(pairs == brute, s"banding=$pairs brute=$brute")
  }
}
