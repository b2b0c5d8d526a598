package graft

import org.apache.spark.sql.functions._
import graft.operators.NgramJoin

/** Prefix-filtered n-gram Jaccard join (NgramJoin.scala): the filter
  * must be LOSSLESS (same pairs as the naive all-pairs rescore) while
  * actually pruning the candidate space. */
class NgramJoinSpec extends SparkTestBase {

  private val words =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu".split(" ")

  /** Synthetic corpus: `nBase` independent random docs, plus a near-dup
    * of every 10th doc (one word substituted — high but non-1 Jaccard). */
  private def corpus(nBase: Int, seed: Int = 7) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val base = (0 until nBase).map { id =>
      (id.toLong, (0 until 30).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }
    val dups = base.filter(_._1 % 10 == 0).map { case (id, text) =>
      val t = text.split(" "); t(15) = "substituted"
      (id + 100000L, t.mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  /** Naive reference: full cross-product rescore on collected sets. */
  private def naivePairs(docs: org.apache.spark.sql.DataFrame, n: Int, t: Double) = {
    val sets = NgramJoin.shingleSets(docs, n)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      j = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if j >= t
    } yield (a, b, math.round(j * 10000) / 10000.0)).toSet
  }

  test("prefix filter is lossless vs the naive all-pairs join") {
    val docs = corpus(60)
    val got = NgramJoin.similarPairs(docs, 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = naivePairs(docs, 3, 0.5)
    assert(got == want)
    assert(got.nonEmpty, "planted near-dups must surface")
  }

  test("identical docs score jaccard 1.0; short docs never pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five"),
      (2L, "one two three four five"),
      (3L, "too short"),                 // < 3 tokens -> no shingles
      (4L, "completely different words here entirely")
    ).toDF("doc_id", "text")
    val got = NgramJoin.similarPairs(docs, 3, 0.5).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ==
      Set((1L, 2L, 1.0)))
  }

  test("prefix index prunes: candidates well below the all-pairs space") {
    val docs = corpus(80)
    val nDocs = NgramJoin.shingleSets(docs, 3).count()
    val allPairs = nDocs * (nDocs - 1) / 2
    val cands = NgramJoin.candidatePairs(docs, 3, 0.8).count()
    // at t=0.8 only near-identical pairs may collide on a rare-prefix
    // shingle; random 30-word docs share plenty of shingles overall,
    // so the bound demonstrates the PREFIX is doing the pruning
    assert(cands < allPairs / 10, s"$cands candidates vs $allPairs pairs")
    // and every planted dup pair must still be a candidate (losslessness
    // is already asserted above; this pins it at the candidate stage)
    val got = NgramJoin.similarPairs(docs, 3, 0.8).count()
    assert(got >= 8) // one dup per 10 base docs
  }

  test("candidate volume grows linearly, not quadratically") {
    val c1 = NgramJoin.candidatePairs(corpus(50), 3, 0.8).count()
    val c2 = NgramJoin.candidatePairs(corpus(100), 3, 0.8).count()
    assert(c2 <= c1 * 3 + 20, s"doubling the corpus took candidates $c1 -> $c2")
  }
}
