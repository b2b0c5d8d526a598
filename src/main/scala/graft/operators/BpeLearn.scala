package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (SURVEY.md §2.11 L5 — the tokenizer
  * TRAINING op; q62 counts with a learned-tokenizer-shaped regex, this
  * is how such a tokenizer is learned from the corpus).
  *
  * Classic word-level BPE (Sennrich ACL'16): start from characters,
  * repeatedly merge the most frequent adjacent symbol pair. The
  * algorithm is inherently sequential ACROSS merges, but each round is
  * fully distributed:
  *
  *   1. ONE corpus pass builds the weighted word vocabulary
  *      (distinct word, occurrence count) — the only corpus-scale step.
  *   2. Each round: explode adjacent symbol pairs weighted by word
  *      count → hash-agg → global top-1 by (count desc, pair asc — a
  *      TOTAL order, so runs are deterministic) → apply the merge to
  *      the symbol arrays.
  *
  * Scale posture: rounds operate on the WORD VOCABULARY, which is
  * language-bounded (millions), not corpus-bounded (trillions of
  * tokens) — at 100 TB the corpus pass dominates and rounds are
  * small-table jobs. The merge application is a per-word sequential
  * fold (the defining data dependence of BPE), so it runs as a typed
  * map over the vocab table — NOT over the corpus.
  *
  * The vocab table localCheckpoints once per round: like
  * ConnectedComponents, iterative lineage otherwise grows without
  * bound and planning cost explodes.
  */
object BpeLearn {

  /** (word, n) weighted vocabulary — the one corpus-scale aggregation. */
  def wordVocab(docs: DataFrame): DataFrame =
    docs.select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Merge one (a, b) pair left-to-right in a symbol sequence —
    * greedy, non-overlapping, exactly Sennrich's reference behavior
    * ("aaa" with merge (a,a) -> ["aa", "a"]). */
  def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `nMerges` merges from a weighted word vocabulary.
    * Returns the ordered merge list ((a, b), pairCount).
    *
    * `onRound` sees each round's word-state BEFORE that round's pair
    * count — the oracle hook: Verify exports the states and DuckDB
    * recomputes every round's argmax independently (q70), so the
    * distributed half is hash-gated and only the sequential per-word
    * applyMerge stays spec-gated. */
  def learn(spark: SparkSession, vocab: DataFrame, nMerges: Int,
            onRound: (Int, DataFrame) => Unit = (_, _) => ()): Seq[((String, String), Long)] = {
    import spark.implicits._
    // split(w, "") keeps a trailing "" (Java split with limit -1) —
    // drop empties so symbol sequences are exactly the characters
    var words = vocab
      .select(filter(split(col("word"), ""), s => length(s) > 0).as("syms"),
              col("n"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[((String, String), Long)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      onRound(round, words)
      val pairs = words
        .filter(size(col("syms")) >= 2) // 1-symbol words have no pairs
        .select(explode(transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("a"),
                      element_at(col("syms"), i + 2).as("b")))).as("p"),
          col("n"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
      val top = pairs
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).as[(String, String, Long)].collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, cnt) = top.head
        merges += (((a, b), cnt))
        // previous rounds' checkpointed blocks are reclaimed by the
        // ContextCleaner once the Dataset reference drops out of scope;
        // DataFrame.unpersist would be a no-op for a localCheckpoint
        words = words.as[(Seq[String], Long)]
          .map { case (syms, n) => (applyMerge(syms, a, b), n) }
          .toDF("syms", "n")
          .localCheckpoint()
        round += 1
      }
    }
    merges.toSeq
  }

  /** End-to-end: learn merges from a document corpus. */
  def learnFromDocs(docs: DataFrame, nMerges: Int): Seq[((String, String), Long)] =
    learn(docs.sparkSession, wordVocab(docs), nMerges)

  /** The APPLY half of the tokenizer lifecycle (q87): tokenize each
    * distinct word with an ordered merge list — the same per-word
    * sequential fold `learn` uses, run once over the language-bounded
    * word VOCAB. The corpus never sees the fold: it joins against the
    * resulting (word → tokens) table. Returns
    * (word, n_tokens, tokens space-joined — unambiguous since
    * whitespace-split words contain no whitespace). */
  def encodeWords(spark: SparkSession, words: DataFrame,
                  merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val ms = merges.toArray
    words.select(col("word")).distinct().as[String].map { w =>
      var syms: Seq[String] = w.split("").toSeq.filter(_.nonEmpty)
      var i = 0
      while (i < ms.length) {
        syms = applyMerge(syms, ms(i)._1, ms(i)._2); i += 1
      }
      (w, syms.length.toLong, syms.mkString(" "))
    }.toDF("word", "n_tokens", "tokens")
  }
}
