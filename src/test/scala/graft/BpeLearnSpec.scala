package graft

import graft.operators.BpeLearn

class BpeLearnSpec extends SparkTestBase {
  import spark.implicits._

  test("applyMerge is greedy left-to-right and non-overlapping") {
    assert(BpeLearn.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(BpeLearn.applyMerge(Seq("l", "o", "w"), "l", "o") == Seq("lo", "w"))
    assert(BpeLearn.applyMerge(Seq("x"), "a", "b") == Seq("x"))
    assert(BpeLearn.applyMerge(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
  }

  test("learns the textbook merges on Sennrich's example corpus") {
    // weighted vocab: low x5, lower x2, newest x6, widest x3
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "n")
    val merges = BpeLearn.learn(spark, vocab, 4).map(_._1)
    // round 1: (e,s) 9 beats everything (ties broken lexicographically);
    // then (es,t) 9, then (est and the next most frequent pairs)
    assert(merges.head == ("e", "s"), s"got $merges")
    assert(merges(1) == ("es", "t"), s"got $merges")
    // 'lo' appears in low+lower = 7 — it must surface within 4 merges
    assert(merges.take(4).contains(("l", "o")), s"got $merges")
  }

  test("merge counts are non-increasing and deterministic across runs") {
    val docs = Tables.documents(spark, sf)
    val m1 = BpeLearn.learnFromDocs(docs, 6)
    val m2 = BpeLearn.learnFromDocs(docs, 6)
    assert(m1 == m2, "BPE learning must be deterministic")
    assert(m1.nonEmpty && m1.length == 6)
    // greedy property: each round's winning count can exceed a later
    // round's only via newly-created symbols, but the FIRST count is max
    assert(m1.head._2 == m1.map(_._2).max)
  }

  test("learned merges build multi-char tokens that tokenize the corpus") {
    val docs = Tables.documents(spark, sf)
    val merges = BpeLearn.learnFromDocs(docs, 8).map(_._1)
    // apply all merges to a sample word and check tokens are multi-char
    val word = "table"
    val out = merges.foldLeft(word.map(_.toString): Seq[String]) {
      case (syms, (a, b)) => BpeLearn.applyMerge(syms, a, b)
    }
    assert(out.mkString == word, "merging never changes the underlying text")
    assert(out.length <= word.length)
  }
}
