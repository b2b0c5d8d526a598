package graft

import org.apache.spark.sql.functions._
import graft.operators.{SimHash, VectorQueries}

/** The scale claims behind the all-pairs near-dup operators, asserted:
  *
  *  - `VectorQueries.lshParams` grows bucket bits with the corpus, so
  *    candidate volume from `cosineNearDupCandidates` grows LINEARLY
  *    when the corpus doubles — where FIXED bits grow it quadratically
  *    (~4× per doubling). Both directions are measured here.
  *  - `SimHash.bandedCandidates`' block-combination keys (6 blocks,
  *    k=3, ~32-bit keys) keep random collisions ~zero so candidates
  *    track the true near-dup population linearly — where the 4-block
  *    (16-bit-key) instance goes ~n²/65k. Pigeonhole also makes its
  *    recall at Hamming<=k EXACT, not probabilistic — asserted total.
  */
class LshScalingSpec extends SparkTestBase {
  import spark.implicits._

  private def gaussianCorpus(n: Int, seed: Long): Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(64)(rnd.nextGaussian())))
  }

  private def candCount(rows: Seq[(Long, Array[Double])],
                        nTables: Int, bits: Int): Long =
    VectorQueries.cosineNearDupCandidates(
      rows.toDF("vec_id", "emb"), nTables, bits).count()

  test("lshParams-scaled buckets keep cosine candidate volume linear; fixed bits do not") {
    // random corpus = the adversarial case: no true near-dups, every
    // candidate is bucket-collision noise whose volume the geometry
    // must control. targetBucketRows=32 so bits actually move at test
    // sizes (1024 -> 5 bits, 2048 -> 6 bits).
    val small = gaussianCorpus(1024, seed = 11)
    val big   = gaussianCorpus(2048, seed = 12)
    val (tS, bS) = VectorQueries.lshParams(1024, 0.95, targetBucketRows = 32)
    val (tB, bB) = VectorQueries.lshParams(2048, 0.95, targetBucketRows = 32)
    assert(bB == bS + 1, "doubling the corpus must add one bucket bit")
    val cS = candCount(small, tS, bS)
    val cB = candCount(big, tB, bB)
    val scaledRatio = cB.toDouble / cS
    assert(scaledRatio < 2.6 && scaledRatio > 1.4,
      s"scaled-bits candidates grew ${scaledRatio}x on a 2x corpus ($cS -> $cB)")
    // contrast: freeze bits at the small-corpus value and the same
    // doubling goes quadratic (~4x)
    val cFixed = candCount(big, tS, bS)
    val fixedRatio = cFixed.toDouble / cS
    assert(fixedRatio > 3.2,
      s"fixed-bits control should be ~4x, was ${fixedRatio}x ($cS -> $cFixed)")
  }

  test("cosineNearDupPairs recall on planted near-duplicates") {
    val rnd = new scala.util.Random(21)
    val base = gaussianCorpus(1000, seed = 22).toBuffer
    // plant 25 near-dup pairs: id >= 10000 is a jittered copy (cos ~0.999)
    val planted = (0 until 25).map { i =>
      val (origId, v) = base(i * 17)
      val dup = v.map(x => x + rnd.nextGaussian() * 0.02)
      base += ((10000L + i, dup))
      (origId, 10000L + i)
    }
    val found = VectorQueries.cosineNearDupPairs(
        base.toSeq.toDF("vec_id", "emb"), minCos = 0.95)
      .select(col("vec_a"), col("vec_b")).as[(Long, Long)].collect().toSet
    val hit = planted.count(p => found.contains(p))
    assert(hit >= 23, s"recall ${hit}/25 on planted near-dups")
  }

  test("simhash block-combination recall at Hamming<=3 is total (pigeonhole)") {
    val rnd = new scala.util.Random(31)
    val sigs = Seq.tabulate(500) { i => (i.toLong, rnd.nextLong()) }
    // id+1000 copies id's signature with exactly 3 random bits flipped
    val planted = sigs.take(40).map { case (id, s) =>
      var flipped = s
      rnd.shuffle((0 until 64).toList).take(3)
        .foreach(b => flipped ^= (1L << b))
      ((id, id + 1000L), flipped)
    }
    val df = (sigs ++ planted.map { case ((_, did), s) => (did, s) })
      .toDF("doc_id", "simhash")
    val found = SimHash.bandedCandidates(df, maxHamming = 3, blocks = 6)
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    planted.foreach { case (pair, _) =>
      assert(found.contains(pair), s"pigeonhole guarantees $pair is found")
    }
  }

  test("simhash candidate volume: linear with 6 blocks, quadratic with 4") {
    def corpus(n: Int, seed: Long) = {
      val rnd = new scala.util.Random(seed)
      val base = Seq.tabulate(n)(i => (i.toLong, rnd.nextLong()))
      // near-dup population proportional to n: every 50th doc has a
      // 2-bit-flipped twin
      val dups = base.grouped(50).map(_.head).map { case (id, s) =>
        (id + 1000000L, s ^ 3L)
      }
      (base ++ dups).toDF("doc_id", "simhash")
    }
    def count(n: Int, seed: Long, blocks: Int): Long =
      SimHash.bandedCandidates(corpus(n, seed), maxHamming = 3, blocks = blocks)
        .count()
    val c1 = count(3000, 41, 6)
    val c2 = count(6000, 42, 6)
    val linRatio = c2.toDouble / c1
    assert(linRatio < 2.5,
      s"6-block (32-bit-key) candidates grew ${linRatio}x on a 2x corpus ($c1 -> $c2)")
    // the old fixed-16-bit-band construction = 4 blocks; random
    // collisions dominate and double the corpus -> ~4x the candidates
    val f1 = count(3000, 41, 4)
    val f2 = count(6000, 42, 4)
    val quadRatio = f2.toDouble / f1
    assert(quadRatio > 3.0,
      s"4-block (16-bit-key) control should be ~4x, was ${quadRatio}x ($f1 -> $f2)")
  }
}
