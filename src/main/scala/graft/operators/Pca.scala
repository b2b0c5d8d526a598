package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA over the embedding corpus (L3 family): one-pass
  * second-moment aggregation + driver-side power iteration — the
  * architecture large-scale PCA actually uses (e.g. MLlib's
  * computeGramianMatrix + local eigendecomposition): the CORPUS is
  * touched exactly once by a d²-state typed Aggregator (map-side
  * combined, O(n·d²) flops, model size independent of n), and the
  * O(d²) eigensolve runs where an O(d²) object belongs — on the
  * driver, deterministically.
  *
  * Determinism contract (what the DuckDB oracle replays): the
  * aggregated moments are exported as parquet doubles, and EVERYTHING
  * downstream — [[PcaIters]] power-iteration steps per component,
  * normalization, max-|coordinate| sign fix, Rayleigh λ, rank-1
  * deflation, projection — is sequential left-to-right arithmetic
  * mirrored op-for-op by DuckDB's `list_dot_product` (the same
  * bit-identity the cosine kernels established), so the replayed
  * components and projections match bit-for-bit. The float SUMS in the
  * Aggregator itself are the one order-dependent stage; they live
  * BEFORE the export cut, and the query reads the same memoized model,
  * so both engines consume identical moment bits.
  */
object Pca {

  /** Components extracted and power-iteration steps per component —
    * interpolated into the q106 oracle. Fixed iteration count (not a
    * convergence test) so both engines run the identical recurrence;
    * 96 steps drive the residual/orthogonality below 1e-5 even at the
    * corpus's modest λ2/λ1 ≈ 0.87 eigengap ((λ2/λ1)^96 ≈ 1e-6), and
    * each step is one 64×64 matvec on the driver / one 64-row
    * materialized CTE in the oracle — cost is negligible on both. */
  val PcaComps = 2
  val PcaIters = 96

  case class GramBuf(var n: Long, var sums: Array[Double],
                     var prods: Array[Double])

  /** One-pass count + Σx + Σxxᵀ in a single 1+d+d² doubles buffer. */
  val gramAgg: Aggregator[Seq[Double], GramBuf, GramBuf] =
    new Aggregator[Seq[Double], GramBuf, GramBuf] {
      def zero: GramBuf = GramBuf(0L, Array.empty, Array.empty)
      def reduce(b: GramBuf, x: Seq[Double]): GramBuf = {
        val xa = x.toArray
        val d = xa.length
        if (b.sums.isEmpty) {
          b.sums = new Array[Double](d); b.prods = new Array[Double](d * d)
        }
        b.n += 1
        var i = 0
        while (i < d) {
          b.sums(i) += xa(i)
          val off = i * d
          var j = 0
          while (j < d) { b.prods(off + j) += xa(i) * xa(j); j += 1 }
          i += 1
        }
        b
      }
      def merge(a: GramBuf, b: GramBuf): GramBuf =
        if (a.sums.isEmpty) b
        else if (b.sums.isEmpty) a
        else {
          a.n += b.n
          var i = 0
          while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
          i = 0
          while (i < a.prods.length) { a.prods(i) += b.prods(i); i += 1 }
          a
        }
      def finish(b: GramBuf): GramBuf = b
      def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
      def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
    }

  final case class Model(n: Long, mean: Array[Double],
                         gram: Array[Array[Double]],
                         comps: Array[Array[Double]], lams: Array[Double])

  /** Sequential dot — the same left-to-right loop as DotProduct /
    * DuckDB's list_dot_product, so driver math matches both engines. */
  def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def matvec(g: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    Array.tabulate(v.length)(i => dotSeq(g(i), v))
  }

  /** Fixed-step power iteration from the uniform unit start, then one
    * explicit Gram-Schmidt pass against the already-extracted
    * components (deflation alone leaves ~(λ2/λ1)^iters of the previous
    * direction in the iterate; the re-orthogonalization makes
    * v_c ⊥ v_{<c} exact by construction — standard practice, and one
    * extra CTE in the oracle), renormalized, sign fixed to the
    * max-|coordinate| (ties → lowest index), Rayleigh λ = vᵀGv AFTER
    * the flip — each step mirrored op-for-op in the oracle SQL. */
  private def powerIterate(g: Array[Array[Double]],
                           prev: Seq[Array[Double]]): (Array[Double], Double) = {
    val d = g.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to PcaIters) {
      val w = matvec(g, v)
      val norm = math.sqrt(dotSeq(w, w))
      v = w.map(_ / norm)
    }
    prev.foreach { p =>
      val proj = dotSeq(p, v)
      v = Array.tabulate(d)(i => v(i) - proj * p(i))
      val norm = math.sqrt(dotSeq(v, v))
      v = v.map(_ / norm)
    }
    var mi = 0
    var i = 1
    while (i < d) { if (math.abs(v(i)) > math.abs(v(mi))) mi = i; i += 1 }
    if (v(mi) < 0) v = v.map(x => -x)
    val lam = dotSeq(v, matvec(g, v))
    (v, lam)
  }

  /** The trained model, memoized per (session, corpus) like pqModel —
    * Verify's export and q106's projection consume the SAME aggregated
    * bits within a run. */
  def model(s: SparkSession, d: String): Model =
    StageCache.valueFor(s, s"pca_model:$d") {
      import s.implicits._
      val e = VectorQueries.emb(s, d)
      val buf = e.select(col("emb")).as[Seq[Double]]
        .select(gramAgg.toColumn).head()
      val dim = buf.sums.length
      val n = buf.n
      val mean = buf.sums.map(_ / n)
      // centered scatter G = Σxxᵀ − n·μμᵀ; the subtraction order
      // (prods − n*μi*μj, left-assoc) is part of the exported bits
      val gram = Array.tabulate(dim, dim)((i, j) =>
        buf.prods(i * dim + j) - n * mean(i) * mean(j))
      var g = gram.map(_.clone())
      val comps = Array.ofDim[Array[Double]](PcaComps)
      val lams = new Array[Double](PcaComps)
      for (c <- 0 until PcaComps) {
        val (v, lam) = powerIterate(g, comps.take(c).toSeq)
        comps(c) = v; lams(c) = lam
        g = Array.tabulate(dim, dim)((i, j) => g(i)(j) - lam * v(i) * v(j))
      }
      Model(n, mean, gram, comps, lams)
    }
}
