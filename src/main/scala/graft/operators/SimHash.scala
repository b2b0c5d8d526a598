package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash 64-bit document signatures (SURVEY.md §2.11 L2 family).
  *
  * Classic Charikar simhash over distinct tokens: each token hashes to
  * 64 bits; bit i of the signature is 1 iff more token-hashes have bit i
  * set than not. Near-dups then cluster by low Hamming distance.
  *
  * Computed in one projection per doc — no explode, no shuffle: the
  * token-hash array feeds the compiled [[graft.functions.SimHashSig]]
  * kernel, which references it exactly ONCE (r15 — the historic
  * stacked-projection guard existed because the old 64 per-bit votes
  * referenced the array 128 times and lambda-scoped subtrees defeat
  * CSE; with a single reference CollapseProject may safely inline the
  * tokenize+hash producer).
  */
object SimHash {

  import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}

  /** r15: the 64 per-bit majority `aggregate` passes became ONE
    * compiled expression ([[graft.functions.SimHashSig]]). Higher-order
    * array functions are CodegenFallback, so the old form paid 64
    * interpreted traversals of each doc's token-hash array (the r14
    * `aggregate` rewrite had already removed the 64 per-bit array
    * ALLOCATIONS, but not the 64 interpreted passes); the kernel does
    * the exact count-and-compare in one primitive-long loop. A
    * bit-sliced SQL-expression variant (ripple-carry planes +
    * bit-sliced compare) was built and MEASURED SLOWER than the
    * aggregate form at sf0.1 (array-accumulator boxing per token ate
    * the pass savings) — discarded per guide §1; the compiled kernel
    * is the form that wins. Signatures are bit-equal (SimHashSpec pins
    * the kernel against the old expression form; q26/q100/q102 oracle
    * rows re-prove it every round). */
  def signatures(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("doc_id"),
      transform(array_distinct(split(trim(col("text")), "\\s+")),
        t => xxhash64(t)).as("hs"))
    hashed.select(col("doc_id"),
      toCol(graft.functions.SimHashSig(toExpr(col("hs")))).as("simhash"))
  }

  /** All-pairs near-dup candidates at Hamming distance <= maxHamming,
    * via block-combination keys (the construction Manku et al. used for
    * web-scale simhash dedup, WWW'07): split the 64-bit signature into
    * `blocks` blocks; a pair within Hamming k differs in at most k
    * blocks, so it agrees EXACTLY on some (blocks−k)-subset — keying
    * one table per C(blocks, blocks−k) subset finds every such pair.
    *
    * Scale: key width is (blocks−k)/blocks × 64 bits — the default
    * (6 blocks, k=3) gives ~32-bit keys ≈ 4·10⁹ buckets per table, so
    * bucket population (and candidate volume) stays linear far past
    * 10⁹ docs, where the old fixed 16-bit bands (a 4-block instance of
    * the same scheme) capped at 65k buckets and went ~n²/65k. The cost
    * is C(6,3)=20 exploded rows per doc instead of 4 — linear, and the
    * shuffle rows are (doc_id, simhash, key) triples, not documents.
    * Exact popcount rescore filters false candidates.
    */
  def nearDupPairs(docs: DataFrame, maxHamming: Int = 3,
                   blocks: Int = 6): DataFrame =
    bandedCandidates(signatures(docs), maxHamming, blocks)
      .filter(col("hamming") <= maxHamming)

  /** Candidate pairs (exact Hamming attached) from the block-combination
    * self-join — exposed separately so LshScalingSpec can assert total
    * recall at Hamming<=k (pigeonhole) and linear candidate volume vs
    * the 4-block control. */
  def bandedCandidates(sigs: DataFrame, maxHamming: Int, blocks: Int): DataFrame = {
    require(maxHamming < blocks,
      "pigeonhole needs more blocks than differing bits")
    require(blocks <= 16, "key construction packs block values into one long")
    val base = 64 / blocks; val rem = 64 % blocks
    val sizes = Array.tabulate(blocks)(i => base + (if (i < rem) 1 else 0))
    val offsets = sizes.scanLeft(0)(_ + _)
    def blockVal(b: Int): Column =
      shiftright(col("simhash"), offsets(b))
        .bitwiseAND(lit((1L << sizes(b)) - 1L))
    val combos = (0 until blocks).combinations(blocks - maxHamming).toSeq
    val keys = combos.zipWithIndex.map { case (combo, ci) =>
      val key = combo.foldLeft(lit(0L): Column) { (acc, b) =>
        shiftleft(acc, sizes(b)).bitwiseOR(blockVal(b))
      }
      struct(lit(ci).as("band_idx"), key.as("band_val"))
    }
    val bands = sigs.select(col("doc_id"), col("simhash"),
        explode(array(keys: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band_idx"), col("b.band_val"))
    bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .cast("long").as("hamming"))
      .distinct()
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
