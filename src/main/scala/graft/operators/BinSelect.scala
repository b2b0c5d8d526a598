package graft.operators

/** Driver-side boundary-bin arithmetic for the exact-quantile
  * distributed selections (q223/q254) — r15 fusion of their
  * histogram→window→min_by boundary stage.
  *
  * The selection plan is: one stats pass (per-group count/min/max →
  * ≤ |groups| rows), one histogram pass (per-(group, bin) mass →
  * ≤ |groups|×256 rows), then rank the BOUNDARY BIN's members exactly
  * (ScanSum). Both intermediate tables are bounded by GEOMETRY
  * (groups × bins), never by data size — so walking them on the driver
  * is the q108 doctrine (guide §5: the driver does exactly the work
  * that does not scale with data), and it replaces a broadcast-join +
  * cumulative-window + min_by stage of ~4 extra Spark jobs per query
  * with plain arithmetic over a few thousand rows.
  *
  * [[boundary]] reproduces the relational derivation verbatim: over
  * bins in ascending order, the boundary bin for target rank k is the
  * FIRST bin whose cumulative mass reaches k, and the in-bin residual
  * rank is kk = k − cum + mass(bin) (the min_by((bin, kk), bin) of the
  * old window form). BinSelectSpec proves the walk equal to that
  * relational form on random histograms.
  */
object BinSelect {

  /** One selection target: rank `k` within group `group`, labeled
    * `tgt` (e.g. "p50"). */
  final case class Target(group: String, tgt: String, k: Long)

  /** Boundary result: members of `bbin` are ranked and the `kk`-th
    * smallest (by running mass) is the answer. */
  final case class Boundary(group: String, tgt: String, bbin: Int, kk: Long)

  /** Walk the per-group histogram (bin → mass, ascending) once per
    * target. `hist` rows are (group, bin, mass); bins may be sparse
    * and unordered. Requires every target's k to be ≤ the group's
    * total mass (guaranteed upstream: k = ⌈p·n⌉ ≤ n) — fails loudly
    * otherwise rather than silently dropping a quantile. */
  def boundary(hist: Seq[(String, Int, Long)],
               targets: Seq[Target]): Seq[Boundary] = {
    val byGroup = hist.groupBy(_._1)
    targets.map { t =>
      val bins = byGroup.getOrElse(t.group,
        sys.error(s"no histogram bins for group ${t.group}"))
        .map { case (_, b, m) => (b, m) }.sortBy(_._1)
      var cum = 0L
      val hit = bins.find { case (_, m) => cum += m; cum >= t.k }
      val (bbin, mass) = hit.getOrElse(sys.error(
        s"rank ${t.k} exceeds total mass $cum for ${t.group}/${t.tgt}"))
      Boundary(t.group, t.tgt, bbin, t.k - cum + mass)
    }
  }
}
