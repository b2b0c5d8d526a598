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

  test("encodeWords applies the merge list in learned order") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "n")
    // after (e,s) then (es,t): newest -> n e w est, widest -> w i d est
    val enc = BpeLearn.encodeWords(spark, vocab, Seq(("e", "s"), ("es", "t")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(enc("newest") == (4L, "n e w est"), enc.toString)
    assert(enc("widest") == (4L, "w i d est"), enc.toString)
    assert(enc("low") == (3L, "l o w"), enc.toString)
  }

  test("encode path matches learn's checkpointed word-states at every round") {
    // learn applies merges incrementally through localCheckpoints;
    // encodeWords folds the full list over the raw vocab. The two
    // paths must agree on every intermediate state — this pins the
    // fold-through-checkpoint equivalence the q87 oracle can't see.
    val docs = Tables.documents(spark, sf)
    val vocab = BpeLearn.wordVocab(docs).localCheckpoint()
    val states = scala.collection.mutable.Map.empty[Int, Map[String, Int]]
    val merges = BpeLearn.learn(spark, vocab, 4, (i, words) =>
      states(i) = words.as[(Seq[String], Long)].collect()
        .map { case (syms, _) => syms.mkString -> syms.length }.toMap)
      .map(_._1)
    states.foreach { case (i, st) =>
      val enc = BpeLearn.encodeWords(spark, vocab, merges.take(i))
        .as[(String, Long, String)].collect()
        .map { case (w, n, _) => w -> n.toInt }.toMap
      assert(enc == st, s"state diverged at round $i")
    }
  }

  test("q87 stage: token concatenation reproduces every corpus word") {
    val enc = graft.operators.TextQueries.bpeEncodedStage(
      spark, "/root/testdata/sf0.01")
    import org.apache.spark.sql.functions._
    val broken = enc.filter(
      regexp_replace(col("tokens"), " ", "") =!= col("word") ||
      size(split(col("tokens"), " ")) =!= col("n_tokens")).count()
    assert(broken == 0, "encoding must be lossless and count-consistent")
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
