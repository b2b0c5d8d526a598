package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (SURVEY.md §2.11 L2).
  *
  * Pipeline: 3-word shingles → NUM_HASHES seeded xxhash64 minima
  * (minhash signature) → BANDS bands of ROWS rows → band-bucket
  * self-join → exact shingle-Jaccard rescore of candidates.
  *
  * Scale: signatures are computed in one projection (no explode of the
  * corpus), the only shuffle is the band-bucket join whose buckets stay
  * O(dup-cluster size), and the exact rescore touches candidate pairs
  * only — never the n² cross product. All expressions are codegen'd
  * built-ins (transform/array_min/xxhash64).
  */
object MinHashLSH {
  val NumHashes = 32
  val Bands     = 8
  val Rows      = 4 // NumHashes / Bands

  /** Word 3-gram shingles of `text`; docs shorter than 3 tokens get one
    * whole-text shingle. Guarded so sequence() never sees stop<start
    * (which would generate a descending range). */
  def shingles(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) < 3, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2))))
  }

  /** doc_id, sh (distinct shingles), sig (NumHashes minhash values). */
  def signatures(docs: DataFrame): DataFrame = {
    val withSh = docs.select(col("doc_id"),
      array_distinct(shingles(col("text"))).as("sh"))
    withSh.withColumn("sig",
      array((0 until NumHashes).map(k =>
        array_min(transform(col("sh"), s => xxhash64(s, lit(k))))): _*))
  }

  /** Candidate near-dup pairs (doc_a < doc_b) with exact Jaccard >= min. */
  def verifiedPairs(docs: DataFrame, minJaccard: Double): DataFrame = {
    val sigs = signatures(docs).cache()
    val bands = sigs.select(col("doc_id"),
      explode(array((0 until Bands).map(b =>
        struct(lit(b).as("band_idx"),
          xxhash64(slice(col("sig"), b * Rows + 1, Rows)).as("band_hash"))): _*))
        .as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.band_hash"))

    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    val sa = sigs.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
    val inter = size(array_intersect(col("sha"), col("shb"))).cast("double")
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jaccard", round(inter /
        (size(col("sha")) + size(col("shb")) - inter), 4))
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
