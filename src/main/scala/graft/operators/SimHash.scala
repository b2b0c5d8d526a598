package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash 64-bit document signatures (SURVEY.md §2.11 L2 family).
  *
  * Classic Charikar simhash over distinct tokens: each token hashes to
  * 64 bits; bit i of the signature is 1 iff more token-hashes have bit i
  * set than not. Near-dups then cluster by low Hamming distance.
  *
  * Computed entirely in one codegen'd projection per doc (an array of
  * token hashes + 64 filter/size reductions) — no explode, no shuffle.
  */
object SimHash {
  def signatures(docs: DataFrame): DataFrame = {
    val toks = array_distinct(split(trim(col("text")), "\\s+"))
    val hs = transform(toks, t => xxhash64(t))
    val nTok = size(hs)
    // bit i set iff 2 * |{h : bit_i(h)=1}| > |tokens|
    val bits: Seq[Column] = (0 until 64).map { i =>
      val ones = size(filter(hs, h => shiftright(h, i).bitwiseAND(lit(1L)) === 1L))
      when(ones * 2 > nTok, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    docs.select(col("doc_id"),
      bits.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** All-pairs near-dup candidates at Hamming distance <= maxHamming.
    * Pigeonhole banding: split the 64-bit signature into 4 x 16-bit
    * bands — any pair within Hamming 3 agrees EXACTLY on at least one
    * band, so the band-equality self-join finds every such pair while
    * touching only same-band buckets (never n²). Exact popcount
    * rescore filters false candidates. Same shuffle shape as
    * MinHashLSH.verifiedPairs, so it scales identically.
    */
  def nearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole guarantees recall only to Hamming 3")
    val sigs = signatures(docs)
    val bands = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_idx"),
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))
            .as("band_val"))): _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band_idx"), col("b.band_val"))
    bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Pairs of id-adjacent docs with Hamming distance of signatures —
    * bounded demo surface; all-pairs clustering goes via nearDupPairs. */
  def hammingAdjacent(docs: DataFrame): DataFrame = {
    val s = signatures(docs)
    val a = s.select(col("doc_id"), col("simhash").as("sh_a"))
    val b = s.select((col("doc_id") - 1).as("doc_id"), col("simhash").as("sh_b"))
    a.join(b, "doc_id")
      .select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
  }
}
