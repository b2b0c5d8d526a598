package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash 64-bit document signatures (SURVEY.md §2.11 L2 family).
  *
  * Classic Charikar simhash over distinct tokens: each token hashes to
  * 64 bits; bit i of the signature is 1 iff more token-hashes have bit i
  * set than not. Near-dups then cluster by low Hamming distance.
  *
  * Computed in two stacked projections per doc — no explode, no
  * shuffle. The split is load-bearing: the token-hash array MUST
  * materialize in its own projection, because the 64 majority votes
  * reference it 128 times and Catalyst's lambda-scoped subtrees defeat
  * common-subexpression elimination — inlining (the old one-projection
  * form) re-tokenized and re-hashed every doc 128×, which showed up as
  * 10× wall on the q100 probe join (where the fused stage also fell
  * out of whole-stage codegen). CollapseProject keeps the producer
  * separate precisely because the reference is non-cheap and
  * multiply-used.
  */
object SimHash {
  def signatures(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("doc_id"),
      transform(array_distinct(split(trim(col("text")), "\\s+")),
        t => xxhash64(t)).as("hs"))
    val hs = col("hs")
    val nTok = size(hs)
    // bit i set iff 2 * |{h : bit_i(h)=1}| > |tokens|. The per-bit one
    // count is aggregate(+bit), not size(filter(...)): filter
    // materializes a fresh token-sized array per bit — 64 array
    // allocations per document of pure GC pressure in the hottest map
    // stage (guide §1.2 step 2: per-task work) — while the aggregate
    // form folds the same bit tests into a long with zero allocation.
    // ones_i is identical arithmetic, so signatures are bit-equal.
    val bits: Seq[Column] = (0 until 64).map { i =>
      val ones = aggregate(hs, lit(0L),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(lit(1L)))
      when(ones * 2 > nTok, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    hashed.select(col("doc_id"),
      bits.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
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
