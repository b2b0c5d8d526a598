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

  /** Pairs of id-adjacent docs with Hamming distance of signatures —
    * bounded demo surface; all-pairs clustering goes via band-join on
    * signature prefixes like MinHashLSH. */
  def hammingAdjacent(docs: DataFrame): DataFrame = {
    val s = signatures(docs)
    val a = s.select(col("doc_id"), col("simhash").as("sh_a"))
    val b = s.select((col("doc_id") - 1).as("doc_id"), col("simhash").as("sh_b"))
    a.join(b, "doc_id")
      .select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
  }
}
