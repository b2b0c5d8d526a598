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

  /** The pre-r15 per-bit aggregate majority, verbatim — the executable
    * definition the bit-sliced counter is pinned against. */
  private def oldFormSignatures(docs: org.apache.spark.sql.DataFrame) = {
    val hashed = docs.select(col("doc_id"),
      transform(array_distinct(split(trim(col("text")), "\\s+")),
        t => xxhash64(t)).as("hs"))
    val hs = col("hs")
    val nTok = size(hs)
    val bits = (0 until 64).map { i =>
      val ones = aggregate(hs, lit(0L),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(lit(1L)))
      when(ones * 2 > nTok, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    hashed.select(col("doc_id"),
      bits.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  test("compiled kernel signatures are bit-equal to the per-bit aggregate form") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 400).map(i => s"tok$i")
    val random = (0L until 60L).map { id =>
      val n = 1 + rnd.nextInt(120)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // plus exact tie/edge shapes: 1-token docs (every ones_i ∈ {0,1},
    // majority = the hash itself), even-count exact-tie docs (ones = n/2
    // must NOT set the bit), and a wide doc (5k distinct tokens)
    val edges = Seq(
      (1000L, "solo"),
      (1001L, "alpha beta"),
      (1002L, (0 until 5000).map(i => s"wide$i").mkString(" ")))
    val docs = (random ++ edges).toDF("doc_id", "text")
    val got = SimHash.signatures(docs).as[(Long, Long)].collect().toMap
    val want = oldFormSignatures(docs).as[(Long, Long)].collect().toMap
    assert(got === want, "compiled kernel vs per-bit aggregate majority")
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
