package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (SURVEY.md §2.11 L2).
  *
  * Pipeline: 3-word shingles → NumHashes minhash signature → Bands
  * bands of Rows rows → band-bucket self-join → exact shingle-Jaccard
  * rescore of candidates.
  *
  * The signature is computed by a typed Scala UDF, NOT higher-order
  * column functions: `transform`/`aggregate` are CodegenFallback
  * (interpreted per element), and 32 interpreted passes over every
  * shingle array measured ~10s at sf0.1 vs ~1s for the single-pass
  * native loop (one FNV-1a string hash per shingle + 32 splitmix
  * re-mixes). Seeds are fixed constants — signatures are stable across
  * JVMs and executors.
  *
  * Scale: the only shuffle is the band-bucket join whose buckets stay
  * O(dup-cluster size); the exact rescore re-shingles ONLY candidate
  * pairs — never the n² cross product, never a full-corpus array cache.
  */
object MinHashLSH {
  val NumHashes = 32
  val Bands     = 8
  val Rows      = 4 // NumHashes / Bands

  // --- native core (pure Scala, deterministic) ---

  /** Word 3-gram shingles; docs shorter than 3 tokens get one
    * whole-text shingle. */
  def shingleStrings(text: String): Array[String] = {
    val toks = text.trim.split("\\s+")
    if (toks.length < 3) Array(toks.mkString(" "))
    else Array.tabulate(toks.length - 2)(i =>
      s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").distinct
  }

  @inline private def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  @inline private def mix(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private val seeds: Array[Long] =
    Array.tabulate(NumHashes)(k => mix(0x9e3779b97f4a7c15L * (k + 1)))

  /** One-pass NumHashes-way minhash signature of a text. */
  def signature(text: String): Array[Long] = {
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val sh = shingleStrings(text)
    var i = 0
    while (i < sh.length) {
      val h = fnv1a(sh(i))
      var k = 0
      while (k < NumHashes) {
        val m = mix(h ^ seeds(k))
        if (m < mins(k)) mins(k) = m
        k += 1
      }
      i += 1
    }
    mins
  }

  /** Exact shingle-set Jaccard of two texts. */
  def jaccard(a: String, b: String): Double = {
    val sa = shingleStrings(a).toSet
    val sb = shingleStrings(b).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else (sa & sb).size.toDouble / (sa | sb).size
  }

  // --- Spark surface ---

  private val sigUdf = udf(signature _)
  private val jacUdf = udf(jaccard _)

  /** Column-level shingles (kept for composition/tests; the hot path
    * uses the native signature UDF instead). */
  def shingles(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) < 3, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2))))
  }

  private val shingleHashUdf = udf((t: String) => shingleStrings(t).map(fnv1a))

  /** doc_id, sig (NumHashes minhash values). */
  def signatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), sigUdf(col("text")).as("sig"))

  /** One row per (doc_id, band_idx, band_hash) — the LSH bucket keys.
    * Shared by the candidate join AND the oracle export (the oracle SQL
    * recomputes the band self-join + Jaccard rescore relationally from
    * these plus `shingleHashes`). */
  def bandsOf(docs: DataFrame): DataFrame =
    signatures(docs).select(col("doc_id"),
      explode(array((0 until Bands).map(b =>
        struct(lit(b).as("band_idx"),
          xxhash64(slice(col("sig"), b * Rows + 1, Rows)).as("band_hash"))): _*))
        .as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.band_hash"))

  /** One row per (doc_id, sh): the doc's distinct shingle hashes —
    * exact set Jaccard is then pure relational algebra over this. */
  def shingleHashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(shingleHashUdf(col("text"))).as("sh"))

  /** Candidate near-dup pairs (doc_a < doc_b) with exact Jaccard >= min. */
  def verifiedPairs(docs: DataFrame, minJaccard: Double): DataFrame = {
    val bands = bandsOf(docs)

    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    // exact rescore on candidates only: re-attach the two texts and
    // re-shingle natively (candidate count is O(near-dup pairs))
    val ta = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val tb = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    cand.join(ta, "doc_a").join(tb, "doc_b")
      .withColumn("jaccard", round(jacUdf(col("text_a"), col("text_b")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Degenerate-safe summary for the harness (always >=1 row, even on a
    * corpus with no near-dups). */
  def candidatePairs(docs: DataFrame, minJaccard: Double): DataFrame =
    verifiedPairs(docs, minJaccard)
      .agg(count(lit(1)).as("n_near_dup_pairs"),
           coalesce(round(avg(col("jaccard")), 4), lit(0.0)).as("avg_jaccard"))
}
