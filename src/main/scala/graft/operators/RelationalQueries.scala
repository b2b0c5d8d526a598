package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.functions.Num._

/** Relational operator surface (SURVEY.md §2.2–§2.8): filters with
  * parquet pushdown, equi/semi/anti/range/as-of joins, hash aggregation,
  * rollup, window functions, top-k, set ops, scalar string/date/JSON fns.
  *
  * Every query here is paired with an ANSI-SQL oracle (DuckDB dialect)
  * with IDENTICAL output column names; monetary aggregates are rounded
  * to 2dp on BOTH sides because the harness columns are doubles
  * (FIXTURES.md note).
  *
  * Scale notes (100 TB posture): plans are fully declarative — filters
  * and projections reach the parquet scan (PushedFilters), small
  * dimension sides are explicitly broadcast, aggregations are
  * partial+final hash aggs, the range join is bounded (small build
  * side), and nothing collects to the driver.
  */
object RelationalQueries {

  private def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** q124 rolling-anomaly parameters — trailing window length, minimum
    * events before scoring (a 2-event "baseline" flags everything), and
    * the squared z threshold (9 = |z| > 3). All interpolated into the
    * oracle SQL so the two engines cannot drift. */
  private[graft] val AnomWin = 10
  private[graft] val AnomMinWin = 5
  private[graft] val AnomZsq = 9L

  /** q161 transition-mass scale (the q105/q156 integer-mass doctrine):
    * p̂(next|prev) is reported as cnt·MarkovMass DIV row_total. */
  private[graft] val MarkovMass = 1000000L

  /** q162 CUSUM alarm bar, in squared σ units (h = 4σ → 16): alarm
    * iff S'² ≥ h²·T·n, the cross-multiplied integer form of
    * S/n ≥ h·√(T/n) (cumulative excess ≥ h per-day standard
    * deviations under the Poisson σ ≈ √mean). Squares route through
    * DECIMAL(38,0) — S' ≤ n·T can reach ~10¹⁷ at 100 TB, so S'²
    * overflows BIGINT by design (the q159 discipline). */
  private[graft] val CusumHsq = 16L

  /** q166 significance bar: the two-proportion pooled z² test at 95 %
    * (z² ≥ 3.84), applied as the integer cross-multiply
    * (c₁n₂−c₂n₁)²·N·100 ≥ 384·n₁n₂·C·(N−C) — χ²₁'s exact rational
    * form, no sqrt/variance float surface. Operands route through
    * DECIMAL(38,0): c·n reaches ~10²⁰ at 100 TB user counts. */
  private[graft] val AbZsqNum = 384L
  private[graft] val AbZsqDen = 100L

  /** q169 sequential-support gate: an ordered pattern x→y survives at
    * support ≥ n_baskets/[[SeqSupDen]] (integer cross-multiply). 1/12
    * sits inside the harness's 5–11 % support band, so it provably
    * keeps AND prunes at every SF. */
  private[graft] val SeqSupDen = 12L

  /** q174 k-anonymity bar: a quasi-identifier group is re-identifiable
    * when fewer than this many rows share it (Sweeney '02's k). */
  private[graft] val KAnonK = 5L

  /** q176 discretizer geometry: 256 fixed value bins (the q147 grid,
    * one dimension) and the percentile mass scale. */
  private[graft] val DiscBins = 256L
  private[graft] val DiscMass = 1000000L

  /** Oracle-side calendar-grid cap (q204/q210/q212): DuckDB's
    * `range()` cannot take a correlated bound, so the day grids
    * enumerate a fixed `range(0, MaxGridDays)` and keep `day <= d1`.
    * The Spark side uses an unbounded `sequence(d0, d1)`, so a corpus
    * spanning more days than the cap would silently make the ORACLE
    * grid shorter and fail the gate as a spurious row mismatch —
    * [[oracleGridWhere]] instead makes the overflow fail LOUDLY via
    * DuckDB's error() as a bound violation. ~54 years of days; raise
    * the constant (both sides read it) if a corpus ever exceeds it. */
  private[graft] val MaxGridDays = 20000L

  /** The shared grid WHERE: in-span filter + the loud span-overflow
    * guard. Expects the span CTE aliased `s` (columns d0/d1) and the
    * range aliased `r`. */
  private[graft] val oracleGridWhere: String =
    s"""s.d0 + r.range <= s.d1
           AND (CASE WHEN s.d1 - s.d0 < $MaxGridDays THEN TRUE
                ELSE error('day span exceeds MaxGridDays') = '' END)"""

  /** q182 burst geometry: the trailing event-time window (1 h in
    * micros) and the flag bar — ≥ BurstK events inside one window is
    * "bot-like" on this corpus's ~2.2 events/user/day density, so the
    * bar provably flags AND clears at every SF. */
  private[graft] val BurstWindowUs = 3600000000L
  private[graft] val BurstK = 3L

  /** q181 RFM quartile grid: bins per metric histogram (the q147/q176
    * machinery, applied three times). Quartiles are BIN-BRACKET
    * quartiles — ties at bin granularity land in the lower quartile,
    * the same integer cross-multiply rule both engines share. */
  private[graft] val RfmBins = 256L

  /** q177 decay geometry: the weight of an event halves every
    * [[PopHalfLifeDays]] days — implemented as the EXACT integer
    * PopMass >> (age DIV halflife), so decayed masses are BIGINTs and
    * shards merge by addition. */
  private[graft] val PopMass = 1048576L
  private[graft] val PopHalfLifeDays = 7L

  /** q166 conversion bar: a user "converts" on a type after ≥ this
    * many events of it — sits at the harness's per-(user, type)
    * density (~13 at every SF), so conversion rates land mid-range
    * and the significance gate is genuinely exercised. */
  private[graft] val AbConvK = 14L

  /** q183 Benford expectations, ppm: floor(log10(1+1/d)·10⁶) per first
    * digit d. Computed ONCE here and interpolated into BOTH engines'
    * SQL as integer literals, so no runtime log10 (whose libm ulps
    * differ cross-engine) ever enters the compared result. */
  private[graft] val BenfordPpm: Seq[(Int, Long)] = (1 to 9).map(d =>
    d -> math.floor(math.log10(1.0 + 1.0 / d) * 1000000.0).toLong)

  /** q183 flag bar: a digit deviating from its Benford share by more
    * than this many ppm is flagged. The harness value column lands
    * surprisingly close to Benford (per-digit deviations 62–18629 ppm
    * at sf0.01), so the bar sits mid-range: digits 1/2/7 flag, 3/4/9
    * clear — both branches exercised. */
  private[graft] val BenfordTolPpm = 8000L

  /** q188 seasonality gate (cross-multiply form): a (type, dow) cell is
    * flagged when |7·n − total| · Den ≥ total · Num, i.e. the cell
    * deviates ≥ Num/Den from the uniform day share. */
  private[graft] val SeasonNum = 1L
  private[graft] val SeasonDen = 5L

  /** q189 burstiness bars on CV²·10⁶ of inter-event gaps: a Poisson
    * process sits at CV² = 1; above/below the bars is bursty/regular.
    * Gaps enter as exact micros, CV² as the integer mass
    * (n·Σg² − (Σg)²)·10⁶ DIV (Σg)² routed through DECIMAL(38,0)
    * (Σg² at 100 TB spans ~10³⁰ — far past BIGINT by design). */
  private[graft] val BurstyCv2Ppm = 1500000L
  private[graft] val RegularCv2Ppm = 700000L
  private[graft] val CvMass = 1000000L

  /** q193 attribution-window funnel: each stage must follow the prior
    * within this many micros (48 h) — unlike q112's unbounded chain, a
    * slow journey DROPS out of the windowed funnel, which is the
    * within-session conversion question ad analytics actually asks.
    * The harness's stage gaps have median ~34 h and p90 ~120 h, so the
    * bar converts SOME journeys and drops others at every SF. */
  private[graft] val FunnelWindowUs = 172800000000L

  /** q184 robust-outlier geometry: the q176 256-bin histogram grid
    * picks a BINNED median and MAD per event_type (bin-midpoint
    * representatives — the deterministic grid arithmetic both engines
    * share), and an event is an outlier when |value − med| > K·MAD.
    * No global sort anywhere: two bounded histogram barriers. */
  private[graft] val MadBins = 256L
  private[graft] val MadK = 3L

  /** q165 Z-order geometry: 5-bit bucketed dims (user_id mod 32,
    * day-offset clamped to 31) interleaved into a 10-bit z-address;
    * blocks of [[ZBlockCells]] z-cells = 4×4 (u, d) tiles; the audit
    * box is [[ZBoxLo]]..[[ZBoxHi]] on BOTH dims — inside every SF's
    * populated bucket range, so the comparison is exercised
    * everywhere. */
  private[graft] val ZDimBits = 5
  private[graft] val ZBlockCells = 16L
  private[graft] val ZBoxLo = 8L
  private[graft] val ZBoxHi = 15L

  /** The q166 tail over ANY (user_id, event_type, k) per-user count
    * table — variant split, conversion gate, grid, rates, z² test.
    * Shared with the streaming twin (q172): per-user counts are
    * addition-mergeable, so the stream's merge-on-read sums feed the
    * IDENTICAL tail. */
  def abTestView(ut0: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val ut = ut0
      .localCheckpoint() // feeds per-variant user and converter counts
    val users = ut.select(col("user_id")).distinct()
      .groupBy((col("user_id") % 2).as("variant"))
      .agg(count(lit(1)).as("n"))
    val conv = ut.filter(col("k") >= AbConvK)
      .groupBy(col("event_type"), (col("user_id") % 2).as("variant"))
      .agg(count(lit(1)).as("c"))
    // explicit (type × variant) grid so a variant with ZERO
    // converters still contributes (c=0, n) instead of a NULL leg
    val wide = ut.select(col("event_type")).distinct()
      .crossJoin(broadcast(users))
      .join(conv, Seq("event_type", "variant"), "left")
      .groupBy(col("event_type"))
      .agg(sum(when(col("variant") === 0, coalesce(col("c"), lit(0L))))
          .as("c1"),
        sum(when(col("variant") === 0, col("n"))).as("n1"),
        sum(when(col("variant") === 1, coalesce(col("c"), lit(0L))))
          .as("c2"),
        sum(when(col("variant") === 1, col("n"))).as("n2"))
    wide.select(col("event_type"), col("n1"), col("c1"), col("n2"),
        col("c2"),
        (col("c1").cast("double") / col("n1")).as("rate1"),
        (col("c2").cast("double") / col("n2")).as("rate2"),
        ((col("c1").cast(dec) * col("n2").cast(dec) -
            col("c2").cast(dec) * col("n1").cast(dec)) *
          (col("c1").cast(dec) * col("n2").cast(dec) -
            col("c2").cast(dec) * col("n1").cast(dec)) *
          (col("n1") + col("n2")).cast(dec) * AbZsqDen >
          lit(AbZsqNum).cast(dec) * col("n1").cast(dec) *
            col("n2").cast(dec) * (col("c1") + col("c2")).cast(dec) *
            (col("n1") + col("n2") - col("c1") - col("c2")).cast(dec))
          .as("significant"))
  }

  /** The q162 tail over ANY (event_type, day, x) daily-count table —
    * totals, prefix deviations, prefix-min closed form, squared alarm
    * bar. Shared with the streaming twin (q167), whose merge-on-read
    * summed partials must equal the one-shot rollup BY ALGEBRA
    * (counts add). */
  def cusumView(daily0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = daily0
      .localCheckpoint() // consumed twice: totals + the prefix chain
    val tot = daily.groupBy(col("event_type"))
      .agg(sum(col("x")).as("t_total"), count(lit(1)).as("n_days"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("day").asc)
    // 38,0 as documented: BIGINT inputs always fit, and the s_scaled²
    // product (≤ ~8.5e37 for any pair of longs) stays inside 38 digits
    // — decimal(19,0) would silently null past ~1e19 inputs.
    val dec = "decimal(38,0)"
    daily.join(tot, "event_type")
      .withColumn("pd",
        sum(col("x") * col("n_days") - col("t_total")).over(w))
      .withColumn("s_scaled",
        col("pd") - least(min(col("pd")).over(w), lit(0L)))
      .select(col("event_type"), col("day"), col("x"), col("t_total"),
        col("n_days"), col("s_scaled"),
        (col("s_scaled").cast(dec) * col("s_scaled").cast(dec) >=
          lit(CusumHsq).cast(dec) * col("t_total").cast(dec) *
            col("n_days").cast(dec)).as("alarm"))
  }

  /** The q181 tail over ANY per-user (user_id, last_day, f, m) rollup —
    * recency grid, three histogram quartile chains, the segment count.
    * Shared with the streaming twin (q197): per-user (max, count,
    * decimal-sum) partials are mergeable by (max, add, add), so the
    * stream's merge-on-read rollup feeds the IDENTICAL tail and
    * stream == batch holds BY ALGEBRA. `m` must arrive as the exact
    * decimal-routed double (sum of DECIMAL(38,6) partials cast once). */
  def rfmView(perUser0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mx = perUser0.agg(max(col("last_day")).as("dmax"))
    val users = perUser0.crossJoin(broadcast(mx))
      .select(col("user_id"),
        (col("dmax") - col("last_day")).cast("double").as("r"),
        col("f").cast("double").as("f"), col("m"))
      .localCheckpoint() // feeds three histogram barriers + the join
    def quartileOf(metric: String): DataFrame = {
      val st = users.agg(min(col(metric)).as("lo"),
        max(col(metric)).as("hi"), count(lit(1)).as("n"))
      // hi==lo guard: constant metric → everyone bin 0 (NaN-free),
      // matching the oracle's CASE and q171's SQ8 arm.
      val binned = users.crossJoin(broadcast(st))
        .select(col("user_id"), col("n"),
          when(col("hi") === col("lo"), lit(0L)).otherwise(
            least(lit(RfmBins - 1), greatest(lit(0L),
              floor((col(metric) - col("lo")) / (col("hi") - col("lo"))
                * RfmBins).cast("long")))).as("bin"))
        .localCheckpoint() // feeds the histogram + the assignment
      val cum = binned.groupBy(col("bin"), col("n"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(
          Window.orderBy(col("bin").asc)))
      val qs = cum.agg(
        min(when(col("cum") * 100 >= col("n") * 25, col("bin")))
          .as("q25"),
        min(when(col("cum") * 100 >= col("n") * 50, col("bin")))
          .as("q50"),
        min(when(col("cum") * 100 >= col("n") * 75, col("bin")))
          .as("q75"))
      binned.crossJoin(broadcast(qs))
        .select(col("user_id"),
          (lit(1L) + (col("bin") > col("q25")).cast("long") +
            (col("bin") > col("q50")).cast("long") +
            (col("bin") > col("q75")).cast("long"))
            .as(s"${metric}_q"))
    }
    users.select(col("user_id"))
      .join(quartileOf("r"), "user_id")
      .join(quartileOf("f"), "user_id")
      .join(quartileOf("m"), "user_id")
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** The q177 tail over ANY (event_type, day, n) daily-count table —
    * day-origin scalar, clamped power-of-two decay, share division.
    * Shared with the streaming twin (q198): daily counts add, so the
    * stream's merge-on-read sums feed the IDENTICAL tail. */
  def decayedPopularityView(daily0: DataFrame): DataFrame = {
    val daily = daily0.localCheckpoint() // feeds dmax + the rollup
    val mx = daily.agg(max(col("day")).as("dmax"))
    // Clamp: PopMass = 2^20, so any age past 20 half-lives is weight
    // 0 EXACTLY — without the guard Java's shift masks the amount
    // mod 64, wrapping events older than 64 half-lives back to full
    // weight on a long-span corpus. Mirrored in the oracle.
    val mass = daily.crossJoin(broadcast(mx))
      .select(col("event_type"), col("n"),
        expr(s"CASE WHEN (dmax - day) DIV $PopHalfLifeDays > 20" +
          s" THEN CAST(0 AS BIGINT) ELSE shiftright($PopMass, " +
          s"CAST((dmax - day) DIV $PopHalfLifeDays AS INT)) END").as("w"))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        sum(col("n") * col("w")).as("decayed_mass"))
      .localCheckpoint() // vocab rows; feeds output + the total
    val tot = mass.agg(sum(col("decayed_mass")).as("t"))
    mass.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_events"), col("decayed_mass"),
        (col("decayed_mass").cast("double") / col("t")).as("share"))
  }

  /** The q188 tail over ANY (event_type, day, n) daily-count table —
    * arithmetic dow, explicit grid, ppm deviation, cross-multiply
    * flag. Shared with the streaming twin (q202): a THIRD read tail of
    * the mergeable daily-count store (after q167's CUSUM and q198's
    * decay) — counts add, so stream == batch by algebra. */
  def seasonalityView(daily0: DataFrame): DataFrame = {
    val s = daily0.sparkSession
    val cnt = daily0
      .select(col("event_type"), expr("pmod(day + 4, 7)").as("dow"),
        col("n"))
      .groupBy(col("event_type"), col("dow"))
      .agg(sum(col("n")).as("n"))
      .localCheckpoint() // vocab×7 rows; feeds grid + totals
    val grid = cnt.select(col("event_type")).distinct()
      .crossJoin(s.range(0, 7).toDF("dow"))
    val tot = cnt.groupBy(col("event_type")).agg(sum(col("n")).as("total"))
    grid.join(cnt, Seq("event_type", "dow"), "left")
      .join(broadcast(tot), "event_type")
      .select(col("event_type"), col("dow"),
        coalesce(col("n"), lit(0L)).as("n"), col("total"))
      .select(col("event_type"), col("dow"), col("n"), col("total"),
        expr(s"n * $DiscMass DIV total").as("obs_ppm"),
        lit(DiscMass / 7).as("exp_ppm"),
        (abs(col("n") * 7 - col("total")) * SeasonDen >=
          col("total") * SeasonNum).as("flagged"))
  }

  /** The q161 tail over ANY (prev_type, next_type) transition stream —
    * counts, integer masses, modal next state. Shared with the
    * streaming twin (q163), whose keyed extractor must produce the
    * exact multiset of transitions the batch lead window does. */
  def markovView(transitions: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val big = transitions
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // vocab² rows; feeds totals + argmax + output
    val tot = big.groupBy(col("prev_type"))
      .agg(sum(col("cnt")).as("row_total"))
    val w = Window.partitionBy(col("prev_type"))
      .orderBy(col("cnt").desc, col("next_type").asc)
    big.join(tot, "prev_type")
      .withColumn("p_mass", expr(s"cnt * $MarkovMass DIV row_total"))
      .withColumn("rn", row_number().over(w))
      .select(col("prev_type"), col("next_type"), col("cnt"),
        col("row_total"), col("p_mass"), (col("rn") === 1).as("is_top"))
  }

  /** q151 association-rule min-support gate: a pair survives when it
    * appears in ≥ n_baskets/[[AsrMinSupDen]] baskets (integer
    * cross-multiply; interpolated into the oracle). 1/7 sits INSIDE the
    * harness support range at every SF (pair supports cluster near the
    * uniform 1/7.0±ε), so the gate provably keeps some pairs and
    * prunes others — a coarser bar would pass everything and leave the
    * gate untested. */
  private[graft] val AsrMinSupDen = 7L

  /** q201 audit geometry: md5-bucket sample width (16/256 = 6.25 % of
    * events — audit-bounded like q139's sample) and the per-row error
    * tolerance: one 256-grid bin is 10⁶/256 ≈ 3906 ppm; 60 000 ppm
    * brackets bin granularity plus the sample-vs-population rank gap
    * at harness sizes, so the share is high but provably < 1. */
  private[graft] val AuditBuckets = 16L
  private[graft] val AuditTolPpm = 60000.0

  /** The q176 percentile transform (event_id, bin, pct_mass) — shared
    * by the registered query and q201's fidelity audit. */
  private[graft] def discretized(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(s, d).select(col("event_id"), col("value"))
    val st = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
      count(lit(1)).as("n"))
    // hi==lo guard (constant column): 0/0 is NaN and the engines
    // disagree on floor(NaN) — route the degenerate grid to bin 0
    // in BOTH engines (same guard q171's SQ8 arm uses).
    val binned = ev.crossJoin(broadcast(st))
      .select(col("event_id"), col("n"),
        when(col("hi") === col("lo"), lit(0L)).otherwise(
          least(lit(DiscBins - 1), greatest(lit(0L),
            floor((col("value") - col("lo")) / (col("hi") - col("lo"))
              * DiscBins).cast("long")))).as("bin"))
      .localCheckpoint() // feeds the bin rollup + the transform
    val cum = binned.groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum_below",
        coalesce(sum(col("cnt")).over(
          Window.orderBy(col("bin").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bin"), col("cum_below"))
    binned.join(broadcast(cum), "bin")
      .select(col("event_id"), col("bin"),
        expr(s"cum_below * $DiscMass DIV n").as("pct_mass"))
  }

  /** The (user, day, event_type) basket item table q151 and q199 share
    * — distinct per basket, checkpointed once per call site. */
  private def basketItems(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"),
        col("event_type"))
      .distinct()
      .localCheckpoint()

  /** q199's single a-priori minsup (Agrawal & Srikant use ONE σ at
    * every level): 1/19 sits INSIDE the candidate-triple support range
    * at every SF (sf0.001 [0.035, 0.071], sf0.01 [0.048, 0.055],
    * sf0.1 [0.050, 0.054] measured), so L₃ provably keeps AND prunes
    * everywhere — q151's rule-mining bar (1/7) would leave sf0.001's
    * candidate set empty. */
  private[graft] val Asr3MinSupDen = 19L

  /** Support-gated frequent pairs (x < y, c_xy, n_baskets) at
    * minsup 1/`den` — a-priori's L₂, shared by q151's rules and
    * q199's candidate pruning. vocab²-bounded; materialized once so
    * every consumer reads the table rather than re-planning the
    * pair-count subtree. */
  private def gatedPairs(items: DataFrame, nb: DataFrame,
                         den: Long = AsrMinSupDen): DataFrame =
    items
      .join(items.withColumnRenamed("event_type", "tpe2"),
        Seq("user_id", "day"))
      .filter(col("event_type") < col("tpe2"))
      .groupBy(col("event_type").as("x"), col("tpe2").as("y"))
      .agg(count(lit(1)).as("c_xy"))
      .crossJoin(broadcast(nb))
      .filter(col("c_xy") * den >= col("n_baskets"))
      .localCheckpoint()

  /** q204 EWMA geometry: truncated exponential smoothing over the last
    * [[EwmaK]] days with ratio 3/4 — age-j weight is the EXACT integer
    * 3^j · 4^(K−1−j) (the rational (3/4)^j cleared of denominators),
    * so a day's smoothed mass is an integer dot product over the K-day
    * tail of the daily-count grid. Truncation at K is what makes this
    * scale: the textbook EWMA recursion s_t = αx_t + (1−α)s_{t−1} is a
    * SEQUENTIAL scan over the whole calendar, while the truncated form
    * is a K-term weighted sum any executor computes independently —
    * and daily counts ADD, so shards/streams merge BEFORE the dot
    * product (the q167/q198/q202 store-tail mergeability). (3/4)^16 ≈
    * 1 %, below the trend signal at any realistic daily volume. Masses
    * route through DECIMAL(38,0): 4^15 ≈ 10⁹ times a 100 TB-scale
    * daily count (~10¹²) tops BIGINT by design (the q159 discipline). */
  private[graft] val EwmaK = 16
  private[graft] def ewmaWeight(j: Int): Long = {
    require(j >= 0 && j < EwmaK)
    var w = 1L
    (0 until j).foreach(_ => w *= 3L)
    (0 until (EwmaK - 1 - j)).foreach(_ => w *= 4L)
    w
  }

  /** The q204 tail over ANY (event_type, day, n) daily-count table —
    * explicit day grid, K-lag weighted dot product, one per-type lag
    * window for the trend flag. Shared with the streaming twin (q205),
    * the FOURTH read tail of the mergeable daily-count store: counts
    * add, the weight table is constant, so stream == batch BY ALGEBRA. */
  def ewmaTrendView(daily0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = daily0.localCheckpoint() // feeds span + types + the dot product
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    // grid = types × [d0..d1]: vocab × calendar-span rows — absent
    // (type, day) cells must report a decayed mass, not vanish.
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(expr("sequence(d0, d1)")).as("day"))
      .localCheckpoint() // feeds the K-offset probe + the n re-join
    val wCase = (0 until EwmaK)
      .map(j => s"WHEN $j THEN ${ewmaWeight(j)}L").mkString(" ")
    // K probe rows per grid cell, equi-joined to the daily counts —
    // a hash join on (event_type, src_day); days with no events simply
    // contribute no term (weight × 0).
    val mass = grid
      .withColumn("j", explode(expr(s"sequence(0, ${EwmaK - 1})")))
      .withColumn("src_day", col("day") - col("j"))
      .join(daily.select(col("event_type"), col("day").as("src_day"),
        col("n")), Seq("event_type", "src_day"))
      .withColumn("w", expr(s"CASE j $wCase END"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("n").cast("decimal(19,0)") *
        col("w").cast("decimal(19,0)")).cast("decimal(38,0)")
        .as("mass"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
    grid
      .join(daily, Seq("event_type", "day"), "left")
      .join(mass, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("mass"), lit(0L).cast("decimal(38,0)")).as("mass"))
      .withColumn("prev_mass", lag(col("mass"), 1).over(w))
      // decimal→double only at the OUTPUT boundary (q159 discipline);
      // the rising comparison happens in exact decimal. First grid day
      // has no prior mass → NOT rising (false, not null — a nullable
      // boolean column stringifies differently across engines).
      .select(col("event_type"), col("day"), col("n"),
        col("mass").cast("double").as("ewma_mass"),
        when(col("prev_mass").isNull, lit(false))
          .otherwise(col("mass") > col("prev_mass")).as("rising"))
  }

  /** OLS daily-volume trend (W25 — the least-squares line behind every
    * "is this metric growing" dashboard panel, computed as SUFFICIENT
    * STATISTICS): slope and intercept of n ~ day over the types ×
    * calendar grid (zero days count — a trend over only active days
    * is biased upward), from one aggregation of five exact partials
    * (n, Σx, Σy, Σxy, Σx²) — the textbook closed form
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²). Days re-base to
    * x = day − d0 so the products stay small; every product routes
    * DECIMAL(38,0) (Σxy alone reaches ~4·10²⁰ at 100 TB daily counts;
    * HUGEINT in the oracle); slope/intercept are single IEEE divisions
    * of exact decimals, and `rising` compares the exact numerator.
    * The partials are addition-mergeable, so the streaming twin
    * (q220) reads the SAME view over the daily-count store —
    * stream == batch BY ALGEBRA, the sixth read tail of one ingest. */
  def olsTrendView(daily0: DataFrame): DataFrame = {
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val daily = daily0.localCheckpoint() // feeds span + types + stats
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val terms = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), col("d0"),
        explode(expr("sequence(d0, d1)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), (col("day") - col("d0")).as("x"),
        coalesce(col("n"), lit(0L)).as("y"))
    val stats = terms.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("y")).as("total"),
        sum(col("x")).cast(dec).as("sx"),
        sum(col("y")).cast(dec).as("sy"),
        sum(col("x").cast(dec19) * col("y").cast(dec19)).cast(dec).as("sxy"),
        sum(col("x").cast(dec19) * col("x").cast(dec19)).cast(dec).as("sxx"))
      .withColumn("num",
        col("n_days").cast(dec) * col("sxy") - col("sx") * col("sy"))
      .withColumn("den",
        col("n_days").cast(dec) * col("sxx") - col("sx") * col("sx"))
    // den == 0 iff the span is a single day: the line degenerates to
    // the mean level with zero slope (defined identically both sides)
    stats.select(col("event_type"), col("n_days"), col("total"),
      when(col("den") === 0, lit(0.0))
        .otherwise(col("num").cast("double") / col("den").cast("double"))
        .as("slope"),
      when(col("den") === 0,
          col("total").cast("double") / col("n_days"))
        .otherwise((col("sy") * col("sxx") - col("sx") * col("sxy"))
          .cast("double") / col("den").cast("double"))
        .as("intercept"),
      (col("num") > 0).as("rising"))
  }

  /** q224/q228 lag horizon: one week of lags — the rhythm the events
    * corpus actually carries (see q188's dow profile). */
  private[graft] val AcfMaxLag = 7

  /** Exact integer autocorrelation over the (type, day) count grid —
    * see the q224 registration comment for the algebra. Emits one row
    * per (type, lag 1..[[AcfMaxLag]]) with the exact decimal
    * numerator/denominator ratio and a positive-memory flag on the
    * exact numerator sign. */
  def acfView(daily0: DataFrame): DataFrame = {
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val daily = daily0.localCheckpoint() // feeds span + types + grid
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("y"))
      .localCheckpoint() // feeds totals + both join sides
    val tot = grid.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nd"), sum(col("y")).as("sy"))
    // centered residual (cleared denominator): e = n·y − S, exact
    val cent = grid.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("day"),
        (col("nd").cast(dec19) * col("y").cast(dec19) -
          col("sy").cast(dec19)).cast(dec19).as("e"))
      .localCheckpoint() // feeds c0 + both lag sides
    val c0 = cent.groupBy(col("event_type"))
      .agg(sum(col("e") * col("e")).cast(dec).as("den"))
    val lagged = cent
      .withColumn("k", explode(expr(s"sequence(1, $AcfMaxLag)")))
      .withColumn("day2", col("day") + col("k"))
      .join(cent.select(col("event_type"), col("day").as("day2"),
        col("e").as("e2")), Seq("event_type", "day2"))
      .groupBy(col("event_type"), col("k"))
      .agg(sum(col("e") * col("e2")).cast(dec).as("num"))
    lagged.join(broadcast(c0), "event_type")
      .select(col("event_type"), col("k").cast("long").as("lag"),
        when(col("den") === 0, lit(0.0))
          .otherwise(col("num").cast("double") / col("den").cast("double"))
          .as("r"),
        (col("num") > 0).as("positive_memory"))
  }

  /** q236/q240 Mann–Kendall trend test (Mann '45, Kendall '75 — the
    * distribution-free "is this metric trending" companion to q219's
    * OLS line: no linearity/normality assumption, robust to single
    * outlier days). S = Σ_{i<j} sign(yⱼ − yᵢ) over the types ×
    * calendar grid (zero days count, the q219 rule), computed as ONE
    * self-join of the BROADCAST grid on type with dayᵢ < dayⱼ — the
    * pair table is calendar²-bounded (≤ [[MaxGridDays]]²/2 per type,
    * an axis that does NOT grow with the corpus), and there is no
    * window anywhere. Tie-corrected variance 18·Var(S) =
    * n(n−1)(2n+5) − Σ t(t−1)(2t+5) rides the same grid as one
    * value-rollup; S, n and the tie sum stay BIGINT by construction
    * (n ≤ [[MaxGridDays]] ⇒ n·(n−1)·(2n+5) ≤ 1.6·10¹³ ≪ 2⁶³ — the
    * calendar cap, not the corpus, bounds every product). z applies
    * the S∓1 continuity correction as the identical IEEE chain both
    * engines evaluate over the same exact integers. The statistic is
    * a pure function of the summed (type, day) grid and counts add,
    * so the streaming twin (q240) reads the SAME view over the
    * daily-count store — stream == batch BY ALGEBRA. */
  /** The zero-filled (type, day, y) calendar grid both rank-trend
    * views (q236 MK, q260 τ-b) pair-join over — calendar-bounded, so
    * the pair fan-out never grows with the corpus. */
  private def dailyGrid(daily0: DataFrame): DataFrame = {
    val daily = daily0.localCheckpoint() // feeds span + types + grid
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("y"))
      .localCheckpoint() // feeds both pair legs + ties + n_days
  }

  /** Kendall τ-b over the daily-count grid (W37 — Kendall '38 with
    * the τ-b tie correction: the EFFECT SIZE companion of q236's
    * Mann–Kendall decision — S answers "is there a trend", τ-b puts
    * the series' concordance with time on a [−1, 1] scale a dashboard
    * can compare across types). Same broadcast calendar-grid pair
    * join as q236 (an axis that does NOT grow with the corpus); C, D
    * and the doubled tie/pair totals are exact BIGINTs under the
    * [[MaxGridDays]] cap (2n₀ ≤ 4·10⁸ ⇒ the 4·(n₀−n₁)·n₀ radicand ≤
    * 1.6·10¹⁷ ≪ 2⁶³); the day axis has NO ties (grid days are
    * distinct) so the x-tie term is zero BY CONSTRUCTION and
    * τ-b = S/√((n₀−n₁)·n₀) = 2S/√(4(n₀−n₁)n₀) — ONE IEEE
    * division-by-sqrt over the same exact integers in both engines.
    * Pure function of the summed grid ⇒ the streaming twin (q262)
    * reads the SAME view over the daily-count store — its TENTH
    * tail. */
  def kendallTauView(daily0: DataFrame): DataFrame = {
    val grid = dailyGrid(daily0)
    val pairs = grid
      .select(col("event_type"), col("day").as("da"), col("y").as("ya"))
      .join(broadcast(grid.select(col("event_type").as("et2"),
        col("day").as("db"), col("y").as("yb"))),
        col("event_type") === col("et2") && col("da") < col("db"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("yb") > col("ya"), 1L).otherwise(0L))
          .as("concordant"),
        sum(when(col("yb") < col("ya"), 1L).otherwise(0L))
          .as("discordant"))
    val nd = grid.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
    val ties = grid.groupBy(col("event_type"), col("y"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("t") * (col("t") - 1)).as("tie2")) // = 2·n₁
    pairs
      .join(broadcast(nd), "event_type")
      .join(broadcast(ties), "event_type")
      .withColumn("n0x2", col("n_days") * (col("n_days") - 1)) // = 2·n₀
      .withColumn("s_stat", col("concordant") - col("discordant"))
      .withColumn("den4", (col("n0x2") - col("tie2")) * col("n0x2"))
      .withColumn("tau_b",
        when(col("den4") > 0,
          col("s_stat").cast("double") * 2.0 /
            sqrt(col("den4").cast("double")))
          .otherwise(lit(0.0)))
      .select(col("event_type"), col("n_days"), col("concordant"),
        col("discordant"), col("s_stat"), col("tau_b"))
  }

  /** Seasonal-strength η² over the daily-count grid (W38 — the
    * one-number "how much of this series is the weekly rhythm": the
    * ANOVA decomposition SS_between(dow)/SS_total, the effect-size
    * companion to q188's per-dow profile and q224's lag-7 ACF read).
    * All sufficient statistics are exact integers over the zero-filled
    * calendar grid (Σy² ≤ N·max_y² ~ 10²⁸ at 10¹² rows/day routes
    * DECIMAL(38,0)/HUGEINT); the seven per-dow T_d²/n_d terms are IEEE
    * divisions of exact integers accumulated by dsum
    * (order-independent), and η² is the identical final chain in both
    * engines. ZERO windows, zero pair joins — two rollups over the
    * grid. Pure function of the summed (type, day) counts ⇒ the
    * streaming twin (q268) reads the SAME view — the ELEVENTH
    * daily-count-store tail. */
  def seasonalStrengthView(daily0: DataFrame): DataFrame = {
    import graft.functions.Num.dsum
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val grid = dailyGrid(daily0)
      .withColumn("dow", (col("day") + 4) % 7)
    val byDow = grid.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("nd"), sum(col("y")).cast(dec).as("td"))
    val tot = grid.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("y")).cast(dec).as("t"),
        sum((col("y").cast(dec19) * col("y").cast(dec19)).cast(dec))
          .cast(dec).as("syy"))
    byDow.groupBy(col("event_type"))
      .agg(dsum(col("td").cast("double") * col("td").cast("double") /
        col("nd").cast("double")).as("b"))
      .join(broadcast(tot), "event_type")
      .withColumn("tt",
        col("t").cast("double") * col("t").cast("double") /
          col("n_days").cast("double"))
      .withColumn("ss_total", col("syy").cast("double") - col("tt"))
      .withColumn("ss_between", col("b") - col("tt"))
      .withColumn("eta2",
        when(col("ss_total") > 0.0, col("ss_between") / col("ss_total"))
          .otherwise(lit(0.0)))
      .withColumn("seasonal", col("eta2") > 0.2)
      .select(col("event_type"), col("n_days"), col("ss_between"),
        col("ss_total"), col("eta2"), col("seasonal"))
  }

  /** Cox–Stuart trend test over the daily-count grid (W39 — Cox &
    * Stuart '55: the SIGN-test-cheap monotone-trend read — where q236
    * Mann–Kendall pays a pair join over the calendar², this pairs each
    * day with its half-series partner ONCE, the screening-grade test a
    * dashboard can afford on every series). Convention: offset
    * h = (n+1) DIV 2, pairing day i with day i+h for the first
    * n DIV 2 days (odd n drops the middle day — the standard rule).
    * The pair table is ONE equi-join on day+h over the zero-filled
    * grid (calendar-bounded, broadcast); S = 2·plus − m on tie-dropped
    * pairs is BIGINT exact; the continuity-corrected z = (S ∓ 1)/√m is
    * the identical IEEE chain in both engines (the q236 S∓1 pattern).
    * Pure function of the summed (type, day) counts ⇒ the streaming
    * twin (q279) reads the SAME view — a daily-count-store tail. */
  def coxStuartView(daily0: DataFrame): DataFrame = {
    val grid = dailyGrid(daily0)
    val nd = grid.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
    val a = grid.join(broadcast(nd), "event_type")
      .withColumn("h", expr("(n_days + 1) DIV 2"))
    val pairs = a.select(col("event_type"), col("n_days"),
        col("day").as("da"), (col("day") + col("h")).as("db_want"),
        col("y").as("ya"))
      .join(broadcast(grid.select(col("event_type").as("et2"),
        col("day").as("db"), col("y").as("yb"))),
        col("event_type") === col("et2") && col("db") === col("db_want"))
    pairs.groupBy(col("event_type"), col("n_days"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("yb") > col("ya"), 1L).otherwise(0L)).as("n_plus"),
        sum(when(col("yb") < col("ya"), 1L).otherwise(0L)).as("n_minus"))
      .withColumn("m", col("n_plus") + col("n_minus"))
      .withColumn("s_stat", col("n_plus") * 2 - col("m"))
      .withColumn("z",
        when(col("m") > 0 && col("s_stat") =!= 0,
          (col("s_stat") - when(col("s_stat") > 0, 1L).otherwise(-1L))
            .cast("double") / sqrt(col("m").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("trend",
        when(col("z") > 1.96, "increasing")
          .when(col("z") < -1.96, "decreasing").otherwise("none"))
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("n_plus"), col("n_minus"), col("z"), col("trend"))
  }

  /** Turning-point randomness test over the daily-count grid (W40 —
    * Kendall's classic local-extrema count: a series that is random
    * around its level turns ~2(n−2)/3 times; a trending or sticky
    * series turns less, an oscillating one more — the complement to
    * q266's runs test, which sees level-stickiness but not
    * oscillation). Interior days join their two neighbors by
    * consecutive-day EQUI-JOINS over the zero-filled grid (both legs
    * broadcast, calendar-bounded — no window, no lag); a turning
    * point is a STRICT local extremum (a flat neighbor breaks it).
    * T is BIGINT exact; μ = 2(n−2)/3, σ² = (16n−29)/90 and z are the
    * identical IEEE chain over exact integers in both engines. Pure
    * function of the summed (type, day) counts ⇒ the streaming twin
    * (q280) reads the SAME view — a daily-count-store tail. */
  def turningPointView(daily0: DataFrame): DataFrame = {
    val grid = dailyGrid(daily0)
    val triples = grid
      .select(col("event_type"), col("day"), col("y"))
      .join(broadcast(grid.select(col("event_type").as("etl"),
        col("day").as("dl"), col("y").as("yl"))),
        col("event_type") === col("etl") && col("dl") === col("day") - 1)
      .join(broadcast(grid.select(col("event_type").as("etr"),
        col("day").as("dr"), col("y").as("yr"))),
        col("event_type") === col("etr") && col("dr") === col("day") + 1)
    val nd = grid.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
    triples.groupBy(col("event_type"))
      .agg(sum(when((col("yl") < col("y") && col("y") > col("yr")) ||
          (col("yl") > col("y") && col("y") < col("yr")), 1L)
        .otherwise(0L)).as("turning_points"))
      .join(broadcast(nd), "event_type")
      .withColumn("mu",
        (col("n_days") - 2).cast("double") * 2.0 / 3.0)
      .withColumn("var_t",
        (col("n_days") * 16 - 29).cast("double") / 90.0)
      .withColumn("z",
        when(col("n_days") > 3,
          (col("turning_points").cast("double") - col("mu")) /
            sqrt(col("var_t")))
          .otherwise(lit(0.0)))
      .select(col("event_type"), col("n_days"), col("turning_points"),
        col("z"), (abs(col("z")) <= 1.96).as("random"))
  }

  def mannKendallView(daily0: DataFrame): DataFrame = {
    val grid = dailyGrid(daily0)
    val sstat = grid
      .select(col("event_type"), col("day").as("da"), col("y").as("ya"))
      .join(broadcast(grid.select(col("event_type").as("et2"),
        col("day").as("db"), col("y").as("yb"))),
        col("event_type") === col("et2") && col("da") < col("db"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("yb") > col("ya"), 1L)
        .when(col("yb") < col("ya"), -1L).otherwise(0L)).as("s_stat"))
    val nd = grid.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
    val ties = grid.groupBy(col("event_type"), col("y"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie_sum"))
    sstat
      .join(broadcast(nd), "event_type")
      .join(broadcast(ties), "event_type")
      .select(col("event_type"), col("n_days"), col("s_stat"),
        (col("n_days") * (col("n_days") - 1) * (col("n_days") * 2 + 5) -
          col("tie_sum")).as("var18"))
      .withColumn("var_s", col("var18").cast("double") / 18.0)
      .withColumn("z",
        when(col("var18") === 0, lit(0.0))
          .when(col("s_stat") > 0, (col("s_stat") - 1).cast("double") /
            sqrt(col("var18").cast("double") / 18.0))
          .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double") /
            sqrt(col("var18").cast("double") / 18.0))
          .otherwise(lit(0.0)))
      .withColumn("trending", abs(col("z")) > 1.96)
      .withColumn("direction",
        when(col("s_stat") > 0, "up").when(col("s_stat") < 0, "down")
          .otherwise("flat"))
      .drop("var18")
  }

  /** q242/q243 seasonal Mann–Kendall (Hirsch & Slack '84 — the
    * trend test that is BLIND to the weekly rhythm q188/q224 expose:
    * plain MK on a strongly periodic series reads the period as
    * noise, the seasonal variant compares only like-with-like):
    * pairs are restricted to the SAME day-of-week stratum (arithmetic
    * dow, the q188 rule), S = Σ_k S_k and 18·Var(S) = Σ_k
    * [n_k(n_k−1)(2n_k+5) − ties_k] sum over the 7 strata. Same
    * broadcast-grid pair join as [[mannKendallView]] with (type, dow)
    * as the join key — the pair table is ~7× SMALLER than plain MK's
    * and still calendar²-bounded; everything stays BIGINT by the
    * calendar cap; zero windows. A pure function of the summed
    * (type, day) grid → the streaming twin (q243) reads the SAME
    * view over the daily-count store, the NINTH tail of one ingest. */
  def seasonalMannKendallView(daily0: DataFrame): DataFrame = {
    val daily = daily0.localCheckpoint() // feeds span + types + grid
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), ((col("day") + 4) % 7).as("dow"),
        col("day"), coalesce(col("n"), lit(0L)).as("y"))
      .localCheckpoint() // feeds both pair legs + per-stratum ties/n
    val sstat = grid
      .select(col("event_type"), col("dow"), col("day").as("da"),
        col("y").as("ya"))
      .join(broadcast(grid.select(col("event_type").as("et2"),
        col("dow").as("dow2"), col("day").as("db"), col("y").as("yb"))),
        col("event_type") === col("et2") && col("dow") === col("dow2") &&
          col("da") < col("db"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("yb") > col("ya"), 1L)
        .when(col("yb") < col("ya"), -1L).otherwise(0L)).as("s_stat"))
    val strata = grid.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("nk"))
    val ties = grid.groupBy(col("event_type"), col("dow"), col("y"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"), col("dow"))
      .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie_k"))
    val var18 = strata.join(ties, Seq("event_type", "dow"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_strata"), sum(col("nk")).as("n_days"),
        sum(col("nk") * (col("nk") - 1) * (col("nk") * 2 + 5) -
          col("tie_k")).as("var18"))
    sstat.join(broadcast(var18), "event_type")
      .withColumn("var_s", col("var18").cast("double") / 18.0)
      .withColumn("z",
        when(col("var18") === 0, lit(0.0))
          .when(col("s_stat") > 0, (col("s_stat") - 1).cast("double") /
            sqrt(col("var18").cast("double") / 18.0))
          .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double") /
            sqrt(col("var18").cast("double") / 18.0))
          .otherwise(lit(0.0)))
      .withColumn("trending", abs(col("z")) > 1.96)
      .select(col("event_type"), col("n_days"), col("n_strata"),
        col("s_stat"), col("var_s"), col("z"), col("trending"))
  }

  /** q244/q245 delta-method ratio-metric A/B readout over ANY
    * per-(type, user) (ne = event count, sc = value cents) rollup —
    * see the q244 registration comment for the algebra. Both inputs
    * are addition-mergeable, so the streaming twin (q245) reads the
    * SAME view over the per-(type, user) metric store — stream ==
    * batch BY ALGEBRA, the store's first read tail. */
  def deltaRatioView(ux0: DataFrame): DataFrame = {
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val ux = ux0.withColumn("v", col("user_id") % 2)
    val stats = ux.groupBy(col("event_type"), col("v"))
      .agg(count(lit(1)).as("n"),
        sum(col("ne")).cast(dec).as("sn"),
        sum(col("sc")).cast(dec).as("ss"),
        sum(col("ne").cast(dec19) * col("ne").cast(dec19)).cast(dec)
          .as("snn"),
        sum(col("sc").cast(dec19) * col("sc").cast(dec19)).cast(dec)
          .as("sss"),
        sum(col("sc").cast(dec19) * col("ne").cast(dec19)).cast(dec)
          .as("ssn"))
      .withColumn("r", when(col("sn") === 0, lit(0.0))
        .otherwise(col("ss").cast("double") / col("sn").cast("double")))
      .withColumn("vr",
        when(col("n") < 2 || col("sn") === 0, lit(0.0))
          .otherwise(col("n").cast("double") *
            ((col("n").cast(dec) * col("sss") - col("ss") * col("ss"))
              .cast("double") -
             lit(2.0) * col("r") *
              (col("n").cast(dec) * col("ssn") - col("ss") * col("sn"))
                .cast("double") +
             col("r") * col("r") *
              (col("n").cast(dec) * col("snn") - col("sn") * col("sn"))
                .cast("double")) /
            ((col("n") - 1).cast("double") *
              col("sn").cast("double") * col("sn").cast("double"))))
    stats.groupBy(col("event_type"))
      .agg(sum(when(col("v") === 0, col("n"))).as("n0"),
        sum(when(col("v") === 1, col("n"))).as("n1"),
        sum(when(col("v") === 0, col("r"))).as("r0"),
        sum(when(col("v") === 1, col("r"))).as("r1"),
        sum(when(col("v") === 0, col("vr"))).as("vr0"),
        sum(when(col("v") === 1, col("vr"))).as("vr1"))
      .select(col("event_type"),
        coalesce(col("n0"), lit(0L)).as("n0"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("r0"), lit(0.0)).as("r0"),
        coalesce(col("r1"), lit(0.0)).as("r1"),
        (coalesce(col("r1"), lit(0.0)) - coalesce(col("r0"), lit(0.0)))
          .as("diff"),
        coalesce(col("vr0"), lit(0.0)).as("v0"),
        coalesce(col("vr1"), lit(0.0)).as("v1"))
      .withColumn("z",
        when(!(col("v0") + col("v1") > 0.0), lit(0.0))
          .otherwise(col("diff") / sqrt(col("v0") + col("v1"))))
      .select(col("event_type"), col("n0"), col("n1"), col("r0"),
        col("r1"), col("diff"), col("z"),
        (abs(col("z")) > 1.96).as("significant"))
  }

  /** q239 censor horizon: a user last seen within this many days of
    * the corpus edge is CENSORED (still alive), not churned — the
    * standard right-censoring rule survival analysis exists for. */
  private[graft] val KmCensorDays = 7L

  /** q249 as-of staleness bar (1 h in micros): a prior click older
    * than this is attribution noise, not a touchpoint. */
  private[graft] val AsOfToleranceUs = 3600000000L

  /** q208 winsorization bounds, bin-bracket percentiles on the
    * [[DiscBins]] grid (the q176/q181 cross-multiply rule): clip at
    * the p05 bin's LOWER edge and the p95 bin's UPPER edge, so the
    * clip range always contains the central 90 % of the histogram. */
  private[graft] val WinsorLoPct = 5L
  private[graft] val WinsorHiPct = 95L

  /** The q210 tail over ANY per-(type, user) (fday, lday) first/last-
    * seen table — new-user rollup, day grid, prefix sum. Shared with
    * the streaming twin (q211): fday is MIN-mergeable and lday (which
    * only feeds the grid's right edge) MAX-mergeable, so the stream's
    * merge-on-read rollup feeds the IDENTICAL tail and stream == batch
    * BY ALGEBRA — the "a user is new exactly once" identity survives
    * any micro-batch slicing because min(day) does. */
  def cumulativeDistinctView(perUser0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = perUser0.localCheckpoint() // feeds span + the rollup
    val firstSeen = perUser
      .groupBy(col("event_type"), col("fday").as("day"))
      .agg(count(lit(1)).as("new_users"))
      .localCheckpoint() // vocab×calendar rows; feeds grid + the join
    // span over ALL event days (min first-seen == global min, max
    // LAST-seen == global max): the curve must extend flat to the last
    // calendar day even if no user is new on it
    val span = perUser.agg(min(col("fday")).as("d0"),
      max(col("lday")).as("d1"))
    val grid = firstSeen.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(expr("sequence(d0, d1)")).as("day"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
    grid.join(firstSeen, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1-style pricing summary: partial+final hash agg, codegen'd.
    "q01_pricing_summary" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsumR(col("l_quantity"), 2).as("sum_qty"),
          dsumR(col("l_extendedprice"), 2).as("sum_base_price"),
          dsumR(revenue, 2).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // Selection + projection — both pushed into the parquet scan.
    "q02_filter_pushdown" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
                col("l_discount") > 0.08 && col("l_quantity") < 10.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
                col("l_quantity"), col("l_extendedprice"), col("l_shipdate"))
    }),

    // Q3-style 3-way join + agg; customer is the small side → broadcast.
    "q03_join_agg" -> ((s, d) => {
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = orders(s, d).filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val l = lineitem(s, d).filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(dsumR(revenue, 2).as("rev"))
    }),

    // Q4-style semi join (EXISTS): orders with any lineitem shipped late.
    "q04_semi_join" -> ((s, d) => {
      val late = lineitem(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      orders(s, d)
        .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // Anti join (NOT EXISTS): customers with no orders.
    "q05_anti_join" -> ((s, d) => {
      customer(s, d)
        .join(orders(s, d).select(col("o_custkey")),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // Q5-style star join through nation+region (broadcast dims).
    "q06_star_join" -> ((s, d) => {
      val n = nation(s, d); val r = region(s, d)
      val dim = broadcast(n.join(r, col("n_regionkey") === col("r_regionkey")))
      customer(s, d)
        .join(dim, col("c_nationkey") === col("n_nationkey"))
        .join(orders(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsumR(col("o_totalprice"), 2).as("total_rev"),
             count(lit(1)).as("n_orders"))
    }),

    // Q6-style single-pass filtered agg (fully pushed scan, one row).
    "q07_scan_agg" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
                col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24.0)
        .agg(dsumR(col("l_extendedprice") * col("l_discount"), 2).as("rev"),
             count(lit(1)).as("n"))
    }),

    // Distinct counting — exact (oracle-checkable; HLL variant is c-side).
    "q08_distinct" -> ((s, d) => {
      customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
             count(lit(1)).as("n_cust"))
    }),

    // Window ranking: top-3 orders per customer by price (deterministic
    // tiebreak on orderkey).
    "q09_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }),

    // Analytic window: running revenue per customer + lag delta.
    "q10_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      orders(s, d)
        .withColumn("running_spend",
          round(sum(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .withColumn("prev_price",
          round(coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"), col("prev_price"))
    }),

    // Rollup (multi-level agg in one pass); NULL grouping keys coalesced
    // so the oracle hash is null-free.
    "q11_rollup" -> ((s, d) => {
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
                coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
                col("n"), col("qty"))
    }),

    // Top-k global sort (TakeOrderedAndProject — no full sort at scale).
    "q12_topk" -> ((s, d) => {
      orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // Set ops: customers active in both 'F' and 'O' order status, minus
    // any with a 'P' order. INTERSECT/EXCEPT over the same table plan as
    // cascaded aggregate+exchange pairs reading orders three times; the
    // equivalent one-scan form is a single groupBy with three presence
    // flags — one scan, one shuffle (the oracle keeps the set-op SQL, so
    // the rewrite is verified equivalent every round).
    "q13_setops" -> ((s, d) => {
      orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("has_f"),
             max(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("has_o"),
             max(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("has_p"))
        .filter(col("has_f") === 1 && col("has_o") === 1 && col("has_p") === 0)
        .select(col("o_custkey"))
    }),

    // Union + conditional agg across two branches.
    "q14_union_agg" -> ((s, d) => {
      val hi = lineitem(s, d).filter(col("l_quantity") >= 40.0)
        .select(col("l_orderkey"), lit("hi").as("band"))
      val lo = lineitem(s, d).filter(col("l_quantity") <= 5.0)
        .select(col("l_orderkey"), lit("lo").as("band"))
      hi.unionByName(lo).groupBy(col("band")).agg(count(lit(1)).as("n"))
    }),

    // Bounded range (theta) join: suppliers × customers on acctbal band.
    // Written as the NAIVE range join on purpose: under the session
    // posture (GraftSession) the BinnedIntervalJoinRule rewrites it to
    // the binned equi-join automatically (PlanAuditSpec pins the
    // rewritten shape), so this query is the registry's live proof the
    // automatic rewrite path works — and at scale the binned plan is
    // what keeps two fact-sized sides off a nested loop.
    "q15_range_join" -> ((s, d) => {
      val su = supplier(s, d).select(col("s_suppkey"), col("s_acctbal"))
      customer(s, d)
        .join(broadcast(su),
          col("c_acctbal") >= col("s_acctbal") - 50.0 &&
          col("c_acctbal") <= col("s_acctbal") + 50.0)
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_close"),
             davg(col("c_acctbal")).as("avg_bal"))
    }),

    // JSON extraction (events.props is a JSON object string).
    "q16_json" -> ((s, d) => {
      events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             avg(col("k")).as("avg_k"),
             dsumR(col("value"), 2).as("sum_value"))
    }),

    // Time bucketing (tumbling hour) over the event stream, batch view.
    "q17_time_window" -> ((s, d) => {
      events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsumR(col("value"), 2).as("v"))
    }),

    // Sessionization via analytic windows: 30-min-gap sessions per user.
    "q18_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
               col("ts").cast("long") - col("prev_ts").cast("long") > 1800L, 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"))
        .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // Funnel analysis (W2 family — the ordered-conversion op every
    // event-analytics engine ships): per user, the earliest 'view',
    // the earliest 'click' AT OR AFTER it, the earliest 'purchase' at
    // or after that, stage depth reached, and the exact micros from
    // first view to conversion. Stage k+1 depends on stage k's
    // timestamp, so the plan is a chain of three user-keyed min
    // aggregations + joins — every shuffle keyed by user_id, each
    // stage's frame only as large as the users still in the funnel;
    // no window over raw history, no self-join of events×events.
    // Times are integer micros end-to-end — hash-exact cross-engine.
    "q112_funnel" -> ((s, d) => {
      val ev = events(s, d)
      def stage(tpe: String, after: DataFrame, afterCol: String,
                out: String): DataFrame =
        ev.filter(col("event_type") === tpe)
          .select(col("user_id"), unix_micros(col("ts")).as("t"))
          .join(after, Seq("user_id"))
          .filter(col("t") >= col(afterCol))
          .groupBy(col("user_id")).agg(min(col("t")).as(out))
      val users = ev.select(col("user_id")).distinct()
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("t_view"))
      val s2 = stage("click", s1, "t_view", "t_click")
        .select(col("user_id"), col("t_click"))
      val s3 = stage("purchase", s2, "t_click", "t_purchase")
        .select(col("user_id"), col("t_purchase"))
      users.join(s1, Seq("user_id"), "left")
        .join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select(col("user_id"),
          (when(col("t_purchase").isNotNull, 3L)
            .when(col("t_click").isNotNull, 2L)
            .when(col("t_view").isNotNull, 1L)
            .otherwise(0L)).as("stage"),
          col("t_view"), col("t_click"), col("t_purchase"),
          (col("t_purchase") - col("t_view")).as("micros_to_convert"))
    }),

    // Retention cohort analysis (the other standard event-analytics
    // matrix next to q112's funnel): users bucketed by the DAY of
    // their first signup; n_users active at each day offset since.
    // One signup-filtered min aggregation, one distinct
    // (user, day) projection, one user-keyed join — integer day
    // arithmetic end-to-end, so the oracle is hash-exact.
    "q113_retention" -> ((s, d) => {
      val dayUs = 86400000000L
      val ev = events(s, d).select(col("user_id"), col("event_type"),
        expr(s"unix_micros(ts) DIV $dayUs").as("day"))
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val act = ev.select(col("user_id"), col("day")).distinct()
      act.join(cohort, Seq("user_id"))
        .filter(col("day") >= col("cohort_day"))
        .groupBy(col("cohort_day"),
          (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // Slowly-changing-dimension type-2 history (the warehouse-standard
    // CDC materialization, batch form; q107 is its latest-per-key
    // streaming sibling): the event log is read as a change stream of
    // each user's value band (floor(value/100) — one IEEE double
    // divide, identical both engines), run-compressed to CHANGES only
    // (lag ≠ current), then each surviving change opens a version with
    // [valid_from, valid_to) stitched via lead; the open version is
    // flagged is_current. Scale: both windows partition by user_id
    // (corpus-cardinality keys, the plain-window regime) over the SAME
    // (ts, event_id) sort, so Spark plans one shuffle + one sort and
    // the run-compression shrinks the rows before the second pass.
    // First-order Markov transition model over per-user event streams
    // (the sequence-mining primitive under next-event prediction,
    // session simulation and anomaly baselines): adjacent (prev, next)
    // event-type bigrams under the (ts, event_id) total order, row-
    // normalized to integer transition masses p̂(b|a) = c_ab·M DIV c_a
    // (the q105/q156 mass doctrine — M=10⁶, so c_ab must stay ≤
    // 2⁶³/10⁶ ≈ 9.2·10¹², comfortably above any per-pair count), and
    // the modal next state per row via the (cnt DESC, type ASC)
    // total-order argmax. Scale: ONE user-keyed lead window over the
    // fact table (the shuffle every sequence op here shares), then
    // everything downstream is vocab²-bounded.
    "q161_markov" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      markovView(events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
        .filter(col("next_type").isNotNull)
        .select(col("event_type").as("prev_type"), col("next_type")))
    }),

    // CUSUM changepoint detection (Page '54) over per-type daily event
    // volumes — the drift detector behind pipeline-health monitoring
    // (did a source's arrival rate shift?). The textbook recursion
    // S_t = max(0, S_{t-1} + (x_t − μ)) is NOT windowable, but its
    // closed form IS: S_t = P_t − min(0, min_{j≤t} P_j) with P the
    // prefix sum of deviations — two frames over ONE (type, day)
    // sort. Everything is cross-multiplied integers: deviations are
    // scaled by n_days (x·n − T avoids the rational mean), and the
    // alarm S'² ≥ CusumHsq·T·n is the squared form of "cumulative
    // excess ≥ h per-day σ" — h in σ units makes the bar SF-stable,
    // unlike any fixed fraction of T. Scale: windows run over the
    // types×days aggregate, never the fact table (the q147 doctrine);
    // the fact table is touched once, by the daily rollup.
    "q162_cusum" -> ((s, d) =>
      cusumView(events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("x")))),

    // Key-skew profile (the shuffle-planning diagnostic): before
    // committing a 100 TB join/agg to a key, measure how the key's
    // frequency mass is distributed — WITHOUT a global sort. One
    // key-count pass, then (a) a ≤64-row base-2 log-bin histogram of
    // per-key counts (the q153 length(bin(x)) grid — absolute, no
    // corpus min/max barrier) and (b) broadcast 1-row summary scalars
    // (n_keys, total, max). max_share is the heaviest key's row
    // fraction — ONE IEEE division over exact integers (the KMV
    // doctrine); everything else stays BIGINT. AQE's skew thresholds
    // and salting decisions read exactly this shape.
    "q164_key_skew" -> ((s, d) => {
      val c = events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // consumed twice: bins + summary
      val bins = c
        .select(length(bin(col("cnt"))).cast("long").as("bin"), col("cnt"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_keys_in_bin"),
          sum(col("cnt")).as("rows_in_bin"))
      val summ = c.agg(count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("total_rows"), max(col("cnt")).as("max_cnt"))
      bins.crossJoin(broadcast(summ))
        .select(col("bin"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(bin AS INT) - 1)")
            .as("bin_lo"),
          (expr("shiftleft(CAST(1 AS BIGINT), CAST(bin AS INT))") - 1)
            .as("bin_hi"),
          col("n_keys_in_bin"), col("rows_in_bin"), col("n_keys"),
          col("total_rows"), col("max_cnt"),
          (col("max_cnt").cast("double") / col("total_rows"))
            .as("max_share"))
    }),

    // Z-order layout audit (Morton '66 bit-interleaving — the
    // multi-dimensional clustering behind Delta/Iceberg OPTIMIZE
    // ZORDER): would re-clustering this fact table by an interleaved
    // (user, day) key let zone maps skip more data for a 2-dim box
    // query than the single-key layout does? Rows get a z-address
    // (bit-interleaved 5-bit bucketed dims), blocks are fixed z-cell
    // ranges (z DIV ZBlockCells = 4×4 tiles — pure arithmetic, no
    // sort/ntile), and each block carries its (u, d) zone map; the
    // single-key baseline blocks by the user bucket alone. `touched` =
    // the zone map intersects the audit box — exactly the data-
    // skipping test a scan planner runs. The spec pins the point:
    // rows under touched z-blocks < rows under touched linear blocks.
    // Scale: one fact scan, one broadcast day-origin scalar, block
    // tables geometry-bounded (≤ 64 + 32 rows).
    "q165_zorder" -> ((s, d) => {
      val base = events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
      val d0 = base.agg(min(col("day")).as("d0"))
      val zExpr = (0 until ZDimBits).map(i =>
        s"(shiftleft(shiftright(ub, $i) & 1, ${2 * i})" +
          s" + shiftleft(shiftright(db, $i) & 1, ${2 * i + 1}))")
        .mkString(" + ")
      val dims = base.crossJoin(broadcast(d0))
        .select((col("user_id") % 32).as("ub"),
          least(col("day") - col("d0"), lit(31L)).as("db"))
        .withColumn("z", expr(zExpr))
        .localCheckpoint() // one fact scan; feeds both block layouts
      def blocks(df: DataFrame, blockCol: Column, layout: String) =
        df.groupBy(blockCol.as("block"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("ub")).as("u_min"), max(col("ub")).as("u_max"),
            min(col("db")).as("d_min"), max(col("db")).as("d_max"))
          .select(lit(layout).as("layout"), col("block"), col("n_rows"),
            col("u_min"), col("u_max"), col("d_min"), col("d_max"),
            (col("u_min") <= ZBoxHi && col("u_max") >= ZBoxLo &&
              col("d_min") <= ZBoxHi && col("d_max") >= ZBoxLo)
              .as("touched"))
      blocks(dims, expr(s"z DIV $ZBlockCells"), "zorder")
        .unionByName(blocks(dims, col("ub"), "linear"))
    }),

    // A/B two-proportion test (the experiment-analysis primitive):
    // variants split by user-id parity (the deterministic assignment
    // any hash-bucketed experiment uses), one experiment per event
    // type — "did the user perform ≥ AbConvK events of the type". The
    // pooled z² significance test runs as ONE exact integer
    // cross-multiply (see [[AbZsqNum]], STRICT >, so a zero-difference
    // split is never "significant") — χ²₁ without sqrt, variance
    // floats or accumulated doubles; the two rates are single IEEE
    // divisions over exact integers. Scale: one (user, type) count
    // pass, per-variant integer rollups, a vocab-bounded result — the
    // fact table shuffles once, on the (user, type) key.
    "q166_ab_test" -> ((s, d) =>
      abTestView(events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("k")))),

    // Sequential pattern mining at k=2 (AprioriAll, Agrawal & Srikant
    // ICDE'95 — q151's DIRECTED sibling): x→y is supported by a
    // (user, day) basket iff some x-event precedes some y-event in it,
    // i.e. min_ts(x) < max_ts(y) — so one per-(basket, type) min/max
    // rollup replaces any event-pair self-join. The basket-keyed type
    // join is |types|²-bounded per basket; support gate is the integer
    // cross-multiply s·SeqSupDen ≥ n_baskets; confidence = support /
    // baskets-with-both, ONE IEEE division. The ORDER is the payload:
    // support(x→y) ≠ support(y→x) wherever sequence matters, which
    // q151's unordered rules cannot see.
    "q169_seq_patterns" -> ((s, d) => {
      val tm = events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 86400000000").as("day"),
          col("event_type"), expr("unix_micros(ts)").as("us"))
        .groupBy(col("user_id"), col("day"), col("event_type"))
        .agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
        .localCheckpoint() // feeds basket count, both join legs, both-count
      val nb = tm.select(col("user_id"), col("day")).distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val pairs = tm.select(col("user_id"), col("day"),
          col("event_type").as("x"), col("mn"))
        .join(tm.select(col("user_id"), col("day"),
          col("event_type").as("y"), col("mx")), Seq("user_id", "day"))
        .filter(col("x") =!= col("y"))
        .localCheckpoint() // vocab²-bounded per basket; feeds sup + both
      val sup = pairs.filter(col("mn") < col("mx"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("support"))
      val both = pairs.groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("n_both"))
      sup.join(both, Seq("x", "y")).crossJoin(broadcast(nb))
        .filter(col("support") * SeqSupDen >= col("n_baskets"))
        .select(col("x"), col("y"), col("support"), col("n_both"),
          col("n_baskets"),
          (col("support").cast("double") / col("n_both")).as("confidence"))
    }),

    // k-anonymity audit across a generalization ladder (Sweeney '02 —
    // the privacy gate a dataset release runs BEFORE publication):
    // for each generalization level of the quasi-identifier (full QI →
    // drop the account band → region only), the group-size profile:
    // min k (the anonymity certificate), re-identifiable groups/rows
    // at k < KAnonK, and the suppression fraction a k-anonymous
    // release would pay — the Mondrian question "how coarse must we
    // generalize" answered as one table. Integer counts end-to-end,
    // ONE IEEE division per level; nation is a broadcast dim; each
    // level is a vocab-bounded rollup of the same joined scan.
    "q174_k_anonymity" -> ((s, d) => {
      val c = customer(s, d)
        .join(broadcast(nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_regionkey").as("region"), col("c_mktsegment"),
          expr("CAST(floor(c_acctbal / 2000) AS BIGINT)").as("band"))
        .localCheckpoint() // one scan feeds all three ladder levels
      def level(lvl: Long, desc: String, keys: Seq[Column]): DataFrame =
        c.groupBy(keys: _*).agg(count(lit(1)).as("k"))
          .agg(count(lit(1)).as("n_groups"), min(col("k")).as("min_k"),
            sum(when(col("k") < KAnonK, 1L).otherwise(0L))
              .as("n_risky_groups"),
            sum(when(col("k") < KAnonK, col("k")).otherwise(0L))
              .as("n_risky_rows"),
            sum(col("k")).as("n_rows"))
          .select(lit(lvl).as("level"), lit(desc).as("qi"),
            col("n_groups"), col("min_k"), col("n_risky_groups"),
            col("n_risky_rows"),
            (col("n_risky_rows").cast("double") / col("n_rows"))
              .as("risky_frac"),
            (col("min_k") >= KAnonK).as("k_anonymous"))
      level(0L, "region+segment+band",
          Seq(col("region"), col("c_mktsegment"), col("band")))
        .unionByName(level(1L, "region+segment",
          Seq(col("region"), col("c_mktsegment"))))
        .unionByName(level(2L, "region", Seq(col("region"))))
    }),

    // Marketing-touch revenue attribution (the warehouse-standard
    // first/last-touch models): each purchase credits its value to the
    // most recent — and, for the first-touch model, the earliest —
    // PRECEDING view/click in the user's (ts, event_id)-ordered
    // stream; 'direct' when no touch precedes. One user-keyed
    // window with an UNBOUNDED-PRECEDING-to-−1 ROWS frame computes
    // both models in one sort (ignoreNulls last/first — the SQL
    // idiom for "carry the latest matching event forward"); revenue
    // sums route through Num.dsumR (order-independent), counts stay
    // integers. Channel cardinality bounds the result.
    "q175_attribution" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = when(col("event_type").isin("view", "click"),
        col("event_type"))
      val p = events(s, d)
        .withColumn("lt", last(touch, ignoreNulls = true).over(w))
        .withColumn("ft", first(touch, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("value"), col("lt"), col("ft"))
        .localCheckpoint() // purchases only; feeds both models
      def model(m: String, c: Column): DataFrame =
        p.groupBy(coalesce(c, lit("direct")).as("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            graft.functions.Num.dsumR(col("value"), 2).as("revenue"))
          .select(lit(m).as("model"), col("channel"),
            col("n_purchases"), col("revenue"))
      model("last", col("lt")).unionByName(model("first", col("ft")))
    }),

    // Quantile discretization (the MLlib QuantileDiscretizer /
    // feature-binning transform, done the 100 TB way): per-row
    // percentile features WITHOUT a global sort — a 256-bin fixed grid
    // between the corpus min/max (one agg barrier), per-bin counts and
    // a running cum-below over the GEOMETRY-BOUNDED bin table (the
    // only window), broadcast back into a windowless per-row
    // transform: pct_mass = cum_below·M DIV n, the percentile floor
    // in integer mass units. Row-linear, one fact shuffle (the bin
    // rollup), the transform itself shuffle-free.
    "q176_discretize" -> ((s, d) => discretized(s, d)),

    // A-priori 3-itemsets (W21 — q151 one level up, WITH the pruning
    // step that makes a-priori scale: a triple is a candidate only if
    // ALL THREE of its sub-pairs cleared the SAME minsup gate —
    // Agrawal & Srikant's single σ at every level — so the candidate
    // space is bounded by L₂² long before any support count). Within-
    // basket triple counts are |basket|³-bounded by the type
    // vocabulary; the three sub-pair prunes are broadcast semi-joins
    // against the vocab²-row gated-pair table. The output keeps every
    // pruned-in candidate WITH its own support verdict, so both
    // a-priori branches (candidate-but-infrequent vs frequent) are
    // visible and oracled.
    "q199_itemsets3" -> ((s, d) => {
      val items = basketItems(s, d)
      val nb = items.select(col("user_id"), col("day")).distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val g = gatedPairs(items, nb, Asr3MinSupDen).select(col("x"), col("y"))
      val triples = items
        .join(items.withColumnRenamed("event_type", "tpe2"),
          Seq("user_id", "day"))
        .filter(col("event_type") < col("tpe2"))
        .join(items.withColumnRenamed("event_type", "tpe3"),
          Seq("user_id", "day"))
        .filter(col("tpe2") < col("tpe3"))
        .groupBy(col("event_type").as("x"), col("tpe2").as("y"),
          col("tpe3").as("z"))
        .agg(count(lit(1)).as("c_xyz"))
      triples
        .join(broadcast(g), Seq("x", "y"), "left_semi")
        .join(broadcast(g.select(col("x"), col("y").as("z"))),
          Seq("x", "z"), "left_semi")
        .join(broadcast(g.select(col("x").as("y"), col("y").as("z"))),
          Seq("y", "z"), "left_semi")
        .crossJoin(broadcast(nb))
        .select(col("x"), col("y"), col("z"), col("c_xyz"),
          col("n_baskets"),
          (col("c_xyz") * Asr3MinSupDen >= col("n_baskets")).as("frequent"))
    }),

    // Discretizer fidelity audit (D17 — "is the histogram percentile
    // close enough to the truth": the 100 TB answer to exact global
    // percent_rank, which would need a global sort, is to CERTIFY the
    // q176 histogram transform against exact ranks on a deterministic
    // md5-bucket SAMPLE — the q139 audit lever). Exact sample
    // percentile from ONE window over the sample-bounded rows; error
    // vs q176's pct_mass in ppm; decimal-routed mean, max, and a
    // within-tolerance share. The tolerance brackets bin granularity
    // (10⁶/256 ≈ 3906 ppm) plus sampling noise.
    "q201_discretizer_audit" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.Num.dsumR
      val sample = events(s, d)
        .withColumn("h", md5(col("event_id").cast("string").cast("binary")))
        .withColumn("bkt",
          (expr("instr('0123456789abcdef', substr(h, 1, 1))") - 1) * 16 +
           expr("instr('0123456789abcdef', substr(h, 2, 1))") - 1)
        .filter(col("bkt") < AuditBuckets)
        .select(col("event_id"), col("value"))
        .localCheckpoint() // audit-bounded; feeds the rank + the join
      val exact = sample
        .withColumn("exact_ppm",
          percent_rank().over(Window.orderBy(col("value").asc,
            col("event_id").asc)) * DiscMass)
      exact.join(discretized(s, d).select(col("event_id"),
          col("pct_mass")), "event_id")
        .select((col("exact_ppm") - col("pct_mass").cast("double"))
          .as("err"))
        .agg(count(lit(1)).as("n_sample"),
          dsumR(abs(col("err")), 1, 3).as("mean_abs_scaled"),
          max(abs(col("err"))).as("max_abs_err_ppm"),
          sum(when(abs(col("err")) <= AuditTolPpm, 1L).otherwise(0L))
            .as("n_within"))
        .select(col("n_sample"),
          (col("mean_abs_scaled") / col("n_sample")).as("mean_abs_err_ppm"),
          col("max_abs_err_ppm"),
          (col("n_within").cast("double") / col("n_sample"))
            .as("within_tol_frac"))
    }),

    // Time-decayed popularity (the feature-store freshness score:
    // exponential half-life counting, Cormode et al.'s decayed
    // aggregates): every event weighs PopMass >> (age DIV halflife) —
    // the EXACT integer power-of-two decay, so masses are BIGINTs,
    // shards/streams merge by addition, and no transcendental exp()
    // ever appears. One fact rollup + a broadcast day-origin scalar;
    // share = ONE IEEE division against the broadcast total.
    "q177_decayed_popularity" -> ((s, d) => {
      // pre-roll to (type, day) counts — collapses map-side before the
      // decay tail, and makes the daily table the SHARED mergeable unit
      // the streaming twin (q198) lands per batch
      decayedPopularityView(events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n")))
    }),

    // RFM segmentation (Hughes '94 — the warehouse-standard
    // customer-value grid behind retention/marketing marts): per user,
    // Recency (days since last event), Frequency (event count) and
    // Monetary (decimal-routed value sum), each quartile-bucketed
    // WITHOUT a global sort — three 256-bin histograms + the q147
    // integer cross-multiply quantile pick give three broadcast
    // (q25, q50, q75) bin thresholds; quartile = 1 + three bin
    // comparisons (bin-bracket quartiles, ties to the lower bucket).
    // One user rollup, three bounded histogram barriers, a ≤64-row
    // segment table. M sums route through DECIMAL(38,6), so the only
    // doubles are the deterministic grid arithmetic.
    "q181_rfm" -> ((s, d) => {
      // one user rollup (max day, count, decimal-routed value sum) —
      // the mergeable per-user unit the streaming twin (q197) lands as
      // per-batch partials — then the shared quartile tail
      rfmView(events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 86400000000").as("day"), col("value"))
        .groupBy(col("user_id"))
        .agg(max(col("day")).as("last_day"), count(lit(1)).as("f"),
          sum(col("value").cast("decimal(38,6)")).cast("double").as("m")))
    }),

    // Burst / bot-likeness detection (the anti-abuse data-quality gate
    // training pipelines run over engagement logs): a user's burst
    // score is the max number of their events inside ANY trailing
    // 1-hour window — computed with a RANGE frame over event-time
    // micros (the time-based window mode none of the ROWS-frame ops
    // exercise; ties in event time are handled by the frame semantics
    // identically in both engines, no total-order fragility). One
    // user-keyed window sort, integer counts, a user-cardinality
    // rollup; flagged = burst ≥ BurstK, a bar inside the corpus's
    // burst range so it provably flags AND clears.
    "q182_burst_detect" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc)
        .rangeBetween(-BurstWindowUs, Window.currentRow)
      events(s, d)
        .select(col("user_id"), expr("unix_micros(ts)").as("us"))
        .withColumn("burst", count(lit(1)).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), max(col("burst")).as("max_burst"))
        .select(col("user_id"), col("n_events"), col("max_burst"),
          (col("max_burst") >= BurstK).as("flagged"))
    }),

    "q144_scd2" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") / 100.0).cast("long").as("band"))
        .withColumn("prev_band", lag(col("band"), 1).over(byUser))
        .filter(col("prev_band").isNull || col("band") =!= col("prev_band"))
        .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
        .withColumn("version", row_number().over(byUser).cast("long"))
        .withColumn("is_current", col("valid_to").isNull.cast("long"))
        .select(col("user_id"), col("ts").as("valid_from"), col("valid_to"),
          col("band"), col("version"), col("is_current"))
    }),

    // Association-rule mining (Agrawal & Srikant '94 a-priori at k=2 —
    // the market-basket op of event analytics): baskets are (user, day)
    // activity sets, items the distinct event types seen in one. Per
    // rule x→y: support count c_xy, item counts c_x/c_y, confidence
    // c_xy/c_x (ONE IEEE division) and lift as the fixed
    // left-associated chain c_xy·n/c_x/c_y — exact integers in, so
    // both doubles are bit-stable cross-engine. Scale: the basket item
    // table is materialized ONCE (it feeds the basket count, the item
    // counts and both sides of the pair join); items-per-basket is
    // bounded by the event-type vocabulary, so the within-basket pair
    // self-join is |basket|²-bounded and shuffles on the basket key;
    // everything downstream is vocab² rows, the support gate an
    // integer cross-multiply, and the scalar basket count a broadcast
    // one-row table.
    "q151_assoc_rules" -> ((s, d) => {
      val items = basketItems(s, d)
      val nb = items.select(col("user_id"), col("day")).distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val cx = items.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      val gated = gatedPairs(items, nb)
      val rules = gated.unionAll(gated.select(col("y").as("x"),
        col("x").as("y"), col("c_xy"), col("n_baskets")))
      rules
        .join(broadcast(cx.select(col("event_type").as("x"),
          col("c").as("c_x"))), "x")
        .join(broadcast(cx.select(col("event_type").as("y"),
          col("c").as("c_y"))), "y")
        .select(col("x").as("antecedent"), col("y").as("consequent"),
          col("c_xy"), col("c_x"), col("c_y"), col("n_baskets"),
          (col("c_xy").cast("double") / col("c_x")).as("confidence"),
          (col("c_xy").cast("double") * col("n_baskets") / col("c_x") /
            col("c_y")).as("lift"))
    }),

    // Rolling z-score anomaly detection (W2/W3 put to work — the
    // standard telemetry-outlier rule, batch form): each event scored
    // against the mean/variance of its user's trailing AnomWin events
    // (frame ends at 1 PRECEDING so the event never scores itself).
    // All arithmetic is cross-multiplied integers — value is floored
    // to 1e-4 units (one IEEE double product, identical both engines),
    // and |z| > 3 becomes (n·v − Σv)² > 9·(n·Σv² − (Σv)²): no
    // division, no sqrt, no float accumulation, so windows sums are
    // order-independent and the compare is hash-exact. den = 0 (a
    // constant window) correctly flags iff v deviates. Scale: the
    // window partitions by user_id (corpus-cardinality groups — the
    // plain-window regime); magnitudes stay < 2³⁷ per term for values
    // up to ~5e4, far inside BIGINT at this telemetry's range.
    "q124_anomaly" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("t"),
        floor(col("value") * 10000.0).cast("long").as("v"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t").asc, col("event_id").asc)
        .rowsBetween(-AnomWin, -1)
      ev.withColumn("n", count(col("v")).over(w))
        .withColumn("sm", sum(col("v")).over(w))
        .withColumn("s2", sum(col("v") * col("v")).over(w))
        .filter(col("n") >= AnomMinWin)
        .withColumn("nd", col("n") * col("v") - col("sm"))
        .withColumn("num", col("nd") * col("nd"))
        .withColumn("den",
          lit(AnomZsq) * (col("n") * col("s2") - col("sm") * col("sm")))
        .filter(col("num") > col("den"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("v").as("v_scaled"), col("n").as("win_n"),
          col("num").as("zsq_num"), col("den").as("zsq_den"))
    }),

    // Session STATS with order-dependent payload (increasing-value
    // steps, first-3 event types) — the batch window-function derivation
    // of streaming/StatefulSessions; the flatMapGroupsWithState stream
    // path is asserted equal in StatefulSessionsSpec.
    "q60_session_stats" -> ((s, d) =>
      graft.streaming.StatefulSessions.sessionStatsBatch(events(s, d))),

    // Pivot: orderstatus becomes columns (fixed value list -> single
    // pass, no second job to discover values; the 100 TB-safe form).
    "q49_pivot" -> ((s, d) => {
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
                coalesce(col("F"), lit(0L)).as("n_f"),
                coalesce(col("O"), lit(0L)).as("n_o"),
                coalesce(col("P"), lit(0L)).as("n_p"))
    }),

    // min_by/max_by (A3 tie-broken first/last semantics): per segment,
    // the customer holding the extreme account balance. DuckDB 1.0 has
    // no struct comparator for min_by, so ties break through a
    // collision-free integer key: floor(acctbal*100)*1e7 + custkey
    // (acctbal has 2 decimals; values stay exact in int64).
    "q50_minmax_by" -> ((s, d) => {
      val ord = floor(col("c_acctbal") * 100).cast("long") * 10000000L + col("c_custkey")
      customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(min_by(col("c_custkey"), ord).as("poorest"),
             max_by(col("c_custkey"), ord).as("richest"))
    }),

    // Cube (A7): all grouping-set combinations in one pass; NULL keys
    // coalesced so the oracle hash is null-free.
    "q44_cube" -> ((s, d) => {
      orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsumR(col("o_totalprice"), 2).as("rev"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
                coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
                col("n"), col("rev"))
    }),

    // Binned interval join (J5 fact×fact scale path): late-shipping
    // lineitems matched to every order window [o_orderdate,
    // o_orderdate+2d] they fall in. Unlike q15 there is NO broadcast —
    // the theta join is rewritten to an equi-join on a 4-day bin key
    // (IntervalJoin), so both sides can be fact-sized. PlanAuditSpec
    // asserts the plan has no nested-loop/cartesian node.
    "q51_interval_join" -> ((s, d) => {
      val pts = lineitem(s, d).filter(col("l_quantity") > 49.0)
        .select(col("l_shipdate"), col("l_returnflag"), col("l_extendedprice"))
      val ivs = orders(s, d).select(
        col("o_orderdate"),
        (col("o_orderdate") + expr("INTERVAL 2 DAYS")).as("o_until"),
        col("o_orderpriority"))
      IntervalJoin.pointInInterval(pts, "l_shipdate",
          ivs, "o_orderdate", "o_until", binWidth = 4L * 86400L)
        .groupBy(col("l_returnflag"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_pairs"),
             dsumR(col("l_extendedprice"), 2).as("sum_price"))
    }),

    // Benford first-digit audit (D12 — the fraud/synthetic-data smell
    // test finance and data-quality teams run on any value column):
    // first significant digit of the integer cent amount via the
    // EXACT string route (integer formatting is identical cross-
    // engine; log10-based digit extraction is not), per-digit counts
    // against the Benford expectation floor(log10(1+1/d)·10⁶)
    // interpolated as integer ppm constants ([[BenfordPpm]] — no
    // runtime log10 in either engine). One fact rollup to ≤9 rows; an
    // explicit 1–9 grid so absent digits still report; deviation and
    // flag in exact ppm integers, share the single IEEE division.
    "q183_benford" -> ((s, d) => {
      val digits = events(s, d)
        .select(expr("CAST(substring(CAST(CAST(floor(value * 100) AS " +
          "BIGINT) AS STRING), 1, 1) AS BIGINT)").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_d"))
        .localCheckpoint() // ≤9 rows; feeds grid join + the total
      val tot = digits.agg(sum(col("n_d")).as("n"))
      val expPpm = BenfordPpm.tail.foldLeft(
        when(col("digit") === BenfordPpm.head._1, lit(BenfordPpm.head._2))) {
        case (acc, (dd, p)) => acc.when(col("digit") === dd, lit(p))
      }
      s.range(1, 10).toDF("digit")
        .join(digits, Seq("digit"), "left")
        .crossJoin(broadcast(tot))
        .select(col("digit"), coalesce(col("n_d"), lit(0L)).as("n_d"),
          col("n"), expPpm.as("exp_ppm"))
        .withColumn("obs_ppm", expr(s"n_d * ${DiscMass} DIV n"))
        .select(col("digit"), col("n_d"), col("obs_ppm"), col("exp_ppm"),
          abs(col("obs_ppm") - col("exp_ppm")).as("dev_ppm"),
          (col("n_d").cast("double") / col("n")).as("share"),
          (abs(col("obs_ppm") - col("exp_ppm")) >= BenfordTolPpm)
            .as("flagged"))
    }),

    // Day-of-week seasonality profile (W17 — the traffic-shape
    // baseline behind alerting and capacity marts): dow computed
    // ARITHMETICALLY from epoch days ((day+4) mod 7, 0=Sunday) so
    // neither engine's calendar functions enter the result; per
    // (type, dow) counts on an explicit grid (absent cells report 0),
    // uniform-share deviation in exact ppm, the flag an integer
    // cross-multiply (|7n − total|·Den ≥ total·Num). One fact rollup,
    // everything downstream vocab×7 rows.
    "q188_seasonality" -> ((s, d) => {
      // pre-roll to (type, day) counts — the same mergeable daily unit
      // the streaming twin (q202) reads from the shared count store
      seasonalityView(events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n")))
    }),

    // Inter-event burstiness audit (W18 — q182's statistical sibling:
    // the bot/automation smell test over arrival processes): per user,
    // the squared coefficient of variation of inter-event gaps as the
    // EXACT integer mass (n·Σg² − (Σg)²)·10⁶ DIV (Σg)², gaps in
    // micros from ONE user-keyed lag window. Σg² routes through
    // DECIMAL(38,0) — gap² alone can hit ~10²² at real spans and the
    // scaled numerator ~10³⁶, past BIGINT by design (headroom to the
    // 38-digit cap is documented at the constant). A Poisson arrival
    // sits at CV² = 10⁶; the bars classify bursty / poissonish /
    // regular, and Cauchy–Schwarz keeps the mass non-negative.
    "q189_burstiness" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
      val gaps = events(s, d)
        .select(col("user_id"), expr("unix_micros(ts)").as("us"),
          col("event_id"))
        .withColumn("g", col("us") - lag(col("us"), 1).over(w))
        .filter(col("g").isNotNull)
      gaps.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"), sum(col("g")).as("sum_gap"),
          sum(col("g").cast("decimal(38,0)") *
            col("g").cast("decimal(38,0)")).as("sum_gap2"))
        .filter(col("n_gaps") >= 2 && col("sum_gap") > 0)
        .withColumn("cv2_ppm", expr(
          s"""CAST(((CAST(n_gaps AS DECIMAL(38,0)) * sum_gap2
             - CAST(sum_gap AS DECIMAL(38,0)) * CAST(sum_gap AS DECIMAL(38,0)))
             * $CvMass)
             DIV (CAST(sum_gap AS DECIMAL(38,0)) * CAST(sum_gap AS DECIMAL(38,0)))
             AS BIGINT)"""))
        .select(col("user_id"), col("n_gaps"), col("sum_gap"),
          col("cv2_ppm"),
          when(col("cv2_ppm") > BurstyCv2Ppm, "bursty")
            .when(col("cv2_ppm") < RegularCv2Ppm, "regular")
            .otherwise("poissonish").as("label"))
    }),

    // Attribution-window funnel (W19 — q112's bounded sibling, the
    // within-session conversion question ad analytics actually asks):
    // each stage must land within [[FunnelWindowUs]] of the prior one,
    // so a slow journey DROPS OUT instead of converting years later.
    // Same min-chain joins as q112 with an upper bound on every stage
    // predicate — the chain stays semi-join-shaped and user-keyed.
    "q193_windowed_funnel" -> ((s, d) => {
      val ev = events(s, d)
      def stage(tpe: String, after: DataFrame, afterCol: String,
                out: String): DataFrame =
        ev.filter(col("event_type") === tpe)
          .select(col("user_id"), unix_micros(col("ts")).as("t"))
          .join(after, Seq("user_id"))
          .filter(col("t") >= col(afterCol) &&
            col("t") <= col(afterCol) + FunnelWindowUs)
          .groupBy(col("user_id")).agg(min(col("t")).as(out))
      val users = ev.select(col("user_id")).distinct()
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("t_view"))
      val s2 = stage("click", s1, "t_view", "t_click")
        .select(col("user_id"), col("t_click"))
      val s3 = stage("purchase", s2, "t_click", "t_purchase")
        .select(col("user_id"), col("t_purchase"))
      users.join(s1, Seq("user_id"), "left")
        .join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select(col("user_id"),
          (when(col("t_purchase").isNotNull, 3L)
            .when(col("t_click").isNotNull, 2L)
            .when(col("t_view").isNotNull, 1L)
            .otherwise(0L)).as("stage"),
          col("t_view"), col("t_click"), col("t_purchase"),
          (col("t_purchase") - col("t_view")).as("micros_to_convert"))
    }),

    // Robust outlier gate (W20 — median/MAD instead of q124's
    // mean/stddev, the estimator that does NOT move when the outliers
    // it hunts contaminate it): per event_type, a BINNED median and
    // MAD from two 256-bin histogram barriers (the q176/q181
    // machinery — no global sort at any scale), bin-midpoint
    // representatives in deterministic shared grid arithmetic, outlier
    // = |value − med| > K·MAD. Three linear passes over one projected
    // fact checkpoint; all windows are over ≤ types×256-row tables.
    "q184_mad_outliers" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, d).select(col("event_type"), col("value"))
        .localCheckpoint() // feeds the two histogram passes + the gate
      val st = ev.groupBy(col("event_type"))
        .agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
          count(lit(1)).as("n"))
      def medBin(facts: DataFrame, v: Column, loC: Column, hiC: Column,
                 out: String): DataFrame = {
        // hi==lo guard as everywhere (q176/q181/q171)
        val binned = facts.withColumn("bin",
          when(hiC === loC, lit(0L)).otherwise(
            least(lit(MadBins - 1), greatest(lit(0L),
              floor((v - loC) / (hiC - loC) * MadBins).cast("long")))))
        binned.groupBy(col("event_type"), col("n"), col("bin"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum(col("cnt")).over(
            Window.partitionBy(col("event_type")).orderBy(col("bin").asc)))
          .groupBy(col("event_type"))
          .agg(min(when(col("cum") * 2 >= col("n"), col("bin"))).as(out))
      }
      val med = medBin(ev.join(broadcast(st), "event_type"),
          col("value"), col("lo"), col("hi"), "med_bin")
        .join(st, "event_type")
        .select(col("event_type"), col("lo"), col("hi"), col("n"),
          (col("lo") + (col("med_bin").cast("double") + lit(0.5)) *
            (col("hi") - col("lo")) / lit(MadBins.toDouble)).as("med"),
          greatest(col("hi") - (col("lo") + (col("med_bin").cast("double")
            + lit(0.5)) * (col("hi") - col("lo")) / lit(MadBins.toDouble)),
            (col("lo") + (col("med_bin").cast("double") + lit(0.5)) *
              (col("hi") - col("lo")) / lit(MadBins.toDouble)) - col("lo"))
            .as("max_dev"))
      val devs = ev.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
        .localCheckpoint() // feeds the MAD histogram + the outlier gate
      val mad = medBin(devs, col("dev"), lit(0.0), col("max_dev"), "mad_bin")
        .join(med, "event_type")
        .select(col("event_type"),
          ((col("mad_bin").cast("double") + lit(0.5)) * col("max_dev") /
            lit(MadBins.toDouble)).as("mad"))
      devs.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          first(col("med")).as("med"), first(col("mad")).as("mad"),
          sum(when(col("dev") > col("mad") * MadK, 1L).otherwise(0L))
            .as("n_outliers"))
        .select(col("event_type"), col("n_events"), col("med"), col("mad"),
          col("n_outliers"),
          (col("n_outliers").cast("double") / col("n_events"))
            .as("outlier_frac"))
    }),

    // Unpivot/melt (A11 — the reshape dual of q49's pivot): the three
    // lineitem charge components become (measure, value) rows via
    // Dataset.unpivot — a WITHIN-ROW transform (one generator, zero
    // shuffle) feeding one partial+final rollup. The scan reads exactly
    // 4 columns; at 100 TB the explode multiplies rows 3× map-side and
    // the rollup collapses them to |flags|×3 before any exchange.
    "q195_unpivot" -> ((s, d) => {
      import graft.functions.Num.dsumR
      lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "measure", "value")
        .groupBy(col("l_returnflag"), col("measure"))
        .agg(count(lit(1)).as("n"), dsumR(col("value"), 2).as("total"),
          min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    }),

    // Truncated-EWMA trend (W24 — the smoothed daily health metric
    // behind every ops dashboard): see [[ewmaTrendView]]. Pre-rolls to
    // the same mergeable (type, day) count unit the q167/q198/q202
    // store tails share; the streaming twin (q205) reads the store
    // through the IDENTICAL view.
    "q204_ewma_trend" -> ((s, d) =>
      ewmaTrendView(events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n")))),

    // OLS daily-volume trend (W25): see [[olsTrendView]]. Pre-rolls to
    // the same mergeable (type, day) count unit as q167/q198/q202/q204;
    // the streaming twin (q220) reads the store through the IDENTICAL
    // view — the SIXTH tail of one daily ingest.
    "q219_ols_trend" -> ((s, d) =>
      olsTrendView(events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n")))),

    // Exact distributed quantiles (A13 — percentile_disc without the
    // sort: the answer to "exact p50/p90 at 100 TB" that q201 could
    // only audit approximately): per event_type, the k-th smallest
    // value located by DISTRIBUTED SELECTION — one 256-bin histogram
    // barrier finds the boundary bin per target rank (k = ⌈p·n⌉, both
    // engines integer), a windowless filter keeps only that bin's
    // members (~n/256 rows), and ScanSum's two-pass scan ranks them
    // exactly. No task ever sorts more than its slice of two bins; the
    // oracle is the INDEPENDENT brute rank (row_number over the raw
    // values), so the binning needs no cross-engine agreement — only
    // the selected values must match.
    "q223_exact_quantiles" -> ((s, d) => {
      // r15 fused form (guide §1.2 job count; §5 driver doctrine): the
      // stats and histogram tables are bounded by GEOMETRY (types,
      // types×256), so they collect to the driver and the target/
      // boundary arithmetic (BinSelect) runs there — replacing the old
      // localCheckpoint + three broadcast-subplan jobs + cumulative
      // window + min_by with two aggregation jobs and plain arithmetic.
      // Same bin expression, same k and kk derivations, same ScanSum
      // tail — the selected values are identical (oracle is the
      // independent brute rank; BinSelectSpec pins the walk against the
      // old relational boundary form).
      val ev = events(s, d).select(col("event_type"), col("value"))
      val stAgg = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"),
        min(col("value")).as("lo"), max(col("value")).as("hi"))
      val stRows = stAgg.collect() // one row per event_type
      val stLocal = broadcast(
        s.createDataFrame(java.util.Arrays.asList(stRows: _*), stAgg.schema))
      def binned(base: org.apache.spark.sql.DataFrame) =
        base.join(stLocal, "event_type")
          .withColumn("bin", when(col("hi") === col("lo"), lit(0))
            .otherwise(least(lit(255), floor((col("value") - col("lo")) /
              (col("hi") - col("lo")) * 256).cast("int"))))
      val histAgg = binned(ev).groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("bn"))
      val hist = histAgg.collect().map(r =>
        (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
      // two target ranks per type: k_p50 = ceil(n/2), k_p90 = ceil(.9n)
      val targets = stRows.toSeq.flatMap { r =>
        val (ty, n) = (r.getString(0), r.getLong(1))
        Seq(BinSelect.Target(ty, "p50", (n + 1) / 2),
          BinSelect.Target(ty, "p90", (9 * n + 9) / 10))
      }
      val nOf = stRows.map(r => r.getString(0) -> r.getLong(1)).toMap
      val bounds = BinSelect.boundary(hist, targets)
      val boundRows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(bounds.map(b =>
          org.apache.spark.sql.Row(b.group, b.tgt, b.bbin, b.kk,
            nOf(b.group))): _*)
      val boundSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("tgt",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("bbin",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("kk",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false)))
      val boundLocal = broadcast(s.createDataFrame(boundRows, boundSchema))
      val members = binned(ev.select(col("event_type"), col("value")))
        .select(col("event_type"), col("value"), col("bin"))
        .join(boundLocal, "event_type")
        .filter(col("bin") === col("bbin"))
        .withColumn("__grp", concat(col("event_type"), lit(":"), col("tgt")))
        .withColumn("__one", lit(1L))
      val picked = graft.operators.ScanSum
        .runningSum(members, "__grp", "value", "__one", outCol = "rk")
        .filter(col("rk") === col("kk"))
      picked.groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          max(when(col("tgt") === "p50", col("value"))).as("p50"),
          max(when(col("tgt") === "p90", col("value"))).as("p90"))
    }),

    // Autocorrelation function (W26 — "does the daily series remember
    // itself at lag k": the weekly-rhythm detector that reads the
    // periodicity q188 only profiles by day-of-week). r_k over the
    // types×calendar grid (zero days count), computed EXACTLY by the
    // cleared-denominator trick: with S = Σy and n days,
    // n²·c_k = Σ (n·yₜ − S)(n·yₜ₊ₖ − S), so r_k = c_k/c₀ is a ratio
    // of two exact DECIMAL(38,0) sums (products reach ~10³³ at 100 TB
    // daily counts — HUGEINT in the oracle) — no float mean anywhere,
    // ONE IEEE division per lag. Plan shape: a 7-lag explode + one
    // (type, day) equi-join over the grid — no window at all. Reads
    // the same mergeable daily-count unit as q167/q198/q202/q204/q219;
    // the streaming twin (q228) is the SEVENTH tail of that store.
    "q224_acf" -> ((s, d) =>
      acfView(events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n")))),

    // Nearest as-of join (J6b — "the closest reference reading in
    // EITHER direction": sensor alignment / error-to-purchase
    // attribution where backward-only as-of (q19/J6) picks a stale
    // match over an imminent one). Same one-shuffle tag+union
    // machinery as J6, both directional fills over a single key sort,
    // exact integer |Δt| argmin, ties to the earlier side. The oracle
    // is the INDEPENDENT brute per-user candidate join + rank — the
    // window derivation shares nothing with it.
    "q233_nearest_asof" -> ((s, d) => {
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("tus"))
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("tus"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus").as("ptus"))
      AsOfJoin.nearest(err, pur, "user_id", "tus", "ptus")
        .select(col("event_id"), col("user_id"), col("tus"), col("ptus"),
          (col("ptus") - col("tus")).as("dt_us"),
          (col("ptus") <= col("tus")).as("matched_backward"))
    }),

    // Tolerant as-of join (J6c — pandas merge_asof(tolerance=...)):
    // for each error, the latest prior-or-equal click by the same
    // user UNLESS it is staler than [[AsOfToleranceUs]] — and
    // unmatched errors are KEPT with a null (left-outer semantics:
    // "no recent touchpoint" is the signal J6's inner join drops).
    // Same one-shuffle tag+union machinery; the oracle is the
    // INDEPENDENT brute candidate join + max-prior-within-window.
    "q249_tolerant_asof" -> ((s, d) => {
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("tus"))
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("tus"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("tus").as("ctus"))
      AsOfJoin.tolerant(err, clk, "user_id", "tus", "ctus",
        AsOfToleranceUs)
        .select(col("event_id"), col("user_id"), col("tus"), col("ctus"),
          col("ctus").isNotNull.as("matched"),
          (col("tus") - col("ctus")).as("age_us"))
    }),

    // Two-sample Kolmogorov–Smirnov audit (D24 — "did the value
    // distribution shift between regimes": the distribution-free
    // drift test PSI (q200) approximates with bins, done EXACTLY).
    // Weekend vs weekday per event_type (dow arithmetically from
    // epoch days, the q188 rule); D = sup|F_we − F_wd| evaluated at
    // every jump point: per-(type, value) group counts, cumulated in
    // value order by ScanSum's distributed scan (one call per side —
    // never a per-type single-reducer window over the value axis),
    // then ONE max of the exact cross-multiplied gap
    // |cum_we·n_wd − cum_wd·n_we| in DECIMAL(38,0) (the product
    // reaches ~10²⁴ at 100 TB; HUGEINT in the oracle). d_stat is a
    // single IEEE division of exact decimals; the 95 % flag compares
    // against c(α)·√((n+m)/nm) — IEEE sqrt is correctly rounded, so
    // both engines evaluate the identical double.
    "q222_ks_audit" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val ev = events(s, d).select(col("event_type"), col("value"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .withColumn("we", (col("day") + 4) % 7 >= 5)
      val cnt = ev.groupBy(col("event_type"), col("value"))
        .agg(sum(when(col("we"), 1L).otherwise(0L)).as("cwe"),
             sum(when(!col("we"), 1L).otherwise(0L)).as("cwd"))
      val tot = cnt.groupBy(col("event_type"))
        .agg(sum(col("cwe")).as("nwe"), sum(col("cwd")).as("nwd"))
      val c1 = graft.operators.ScanSum
        .runningSum(cnt, "event_type", "value", "cwe", outCol = "cum_we")
      val c2 = graft.operators.ScanSum
        .runningSum(c1, "event_type", "value", "cwd", outCol = "cum_wd")
      c2.join(broadcast(tot), "event_type")
        .select(col("event_type"), col("nwe"), col("nwd"),
          abs(col("cum_we").cast(dec) * col("nwd").cast(dec) -
              col("cum_wd").cast(dec) * col("nwe").cast(dec)).as("gap"))
        .groupBy(col("event_type"))
        .agg(max(col("nwe")).as("n_weekend"), max(col("nwd")).as("n_weekday"),
          max(col("gap")).as("dnum"))
        .select(col("event_type"), col("n_weekend"), col("n_weekday"),
          when(col("n_weekend") === 0 || col("n_weekday") === 0, lit(0.0))
            .otherwise(col("dnum").cast("double") /
              (col("n_weekend").cast(dec) * col("n_weekday").cast(dec))
                .cast("double")).as("d_stat"))
        // c(0.05) = 1.358; both sides of the compare are functions of
        // the same exact integers through identical IEEE ops
        .withColumn("significant",
          col("n_weekend") > 0 && col("n_weekday") > 0 &&
          col("d_stat") > lit(1.358) * sqrt(
            (col("n_weekend") + col("n_weekday")).cast("double") /
            (col("n_weekend").cast("double") * col("n_weekday").cast("double"))))
    }),

    // Winsorized robust stats (D18 — the outlier-resistant mean the
    // monitoring literature prefers over the raw mean, computed the
    // 100 TB way): clip bounds are BIN-BRACKET percentiles from the
    // q176 256-bin histogram (one rollup barrier, cross-multiply rule,
    // NO global sort), broadcast back into a windowless per-row clip.
    // The raw and winsorized means ride the same decimal-routed pass;
    // clip edges are the same IEEE lo + bin·(hi−lo)/Bins both engines
    // evaluate over identical doubles.
    "q208_winsor_stats" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.Num.dsum
      val ev = events(s, d).select(col("event_type"), col("value"))
      val st = ev.groupBy(col("event_type"))
        .agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
          count(lit(1)).as("n"))
      val binned = ev.join(broadcast(st), "event_type")
        .select(col("event_type"), col("value"), col("lo"), col("hi"),
          col("n"),
          when(col("hi") === col("lo"), lit(0L)).otherwise(
            least(lit(DiscBins - 1), greatest(lit(0L),
              floor((col("value") - col("lo")) / (col("hi") - col("lo"))
                * DiscBins).cast("long")))).as("bin"))
        .localCheckpoint() // feeds the histogram + the clip pass
      val cum = binned.groupBy(col("event_type"), col("n"), col("bin"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(
          Window.partitionBy(col("event_type")).orderBy(col("bin").asc)))
      val qs = cum.groupBy(col("event_type"))
        .agg(
          min(when(col("cum") * 100 >= col("n") * WinsorLoPct, col("bin")))
            .as("b_lo"),
          min(when(col("cum") * 100 >= col("n") * WinsorHiPct, col("bin")))
            .as("b_hi"))
      binned.join(broadcast(qs), "event_type")
        .select(col("event_type"), col("value"), col("n"),
          (col("lo") + col("b_lo").cast("double") * (col("hi") - col("lo"))
            / DiscBins).as("lo_edge"),
          (col("lo") + (col("b_hi") + 1).cast("double") *
            (col("hi") - col("lo")) / DiscBins).as("hi_edge"))
        .select(col("event_type"), col("n"), col("lo_edge"), col("hi_edge"),
          col("value"),
          least(greatest(col("value"), col("lo_edge")), col("hi_edge"))
            .as("clipped"))
        .groupBy(col("event_type"))
        .agg(first(col("n")).as("n"),
          first(col("lo_edge")).as("p05_edge"),
          first(col("hi_edge")).as("p95_edge"),
          sum(when(col("value") < col("lo_edge"), 1L).otherwise(0L))
            .as("n_clip_lo"),
          sum(when(col("value") > col("hi_edge"), 1L).otherwise(0L))
            .as("n_clip_hi"),
          dsum(col("value")).as("sum_raw"),
          dsum(col("clipped")).as("sum_winsor"))
        .select(col("event_type"), col("n"), col("p05_edge"),
          col("p95_edge"), col("n_clip_lo"), col("n_clip_hi"),
          (col("sum_raw") / col("n")).as("mean_raw"),
          (col("sum_winsor") / col("n")).as("mean_winsor"))
    }),

    // Session entry paths (W22 — "how do journeys start", the path
    // analysis complement of q161's Markov chain and q169's unordered
    // patterns): per (user, day) session, the EXACT ordered prefix of
    // the first 3 events (one session-keyed sort window, rows cut at 3
    // before any further shuffle), counted per path. The path table is
    // vocab³-bounded, so the final rank window is a bounded single
    // reducer by geometry, not by luck.
    "q209_session_paths" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window
        .partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val paths = events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 86400000000").as("day"),
          col("event_type"), col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy(col("user_id"), col("day"))
        .agg(
          max(when(col("rn") === 1, col("event_type"))).as("s1"),
          max(when(col("rn") === 2, col("event_type"))).as("s2"),
          max(when(col("rn") === 3, col("event_type"))).as("s3"))
        .select(concat_ws(">", col("s1"), col("s2"), col("s3")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      paths
        .withColumn("rnk", rank().over(
          Window.orderBy(col("n_sessions").desc, col("path").asc))
          .cast("long"))
        .select(col("path"), col("n_sessions"), col("rnk"),
          (col("rnk") <= 10).as("is_top10"))
    }),

    // Cumulative-distinct curve (W23 — "distinct users to date", the
    // growth metric behind every KPI deck): the naive COUNT(DISTINCT)
    // OVER a running frame rescans every prefix — quadratic, and the
    // distinct state is unbounded per frame. The scalable identity:
    // a user is new exactly once, at min(day) — so ONE (type, user)
    // rollup, a vocab×calendar new-user table, and a prefix sum over the
    // grid give the exact curve. The oracle computes the quadratic
    // form; this plan never holds more than the grid.
    "q210_cumulative_distinct" -> ((s, d) =>
      cumulativeDistinctView(events(s, d)
        .select(col("event_type"), col("user_id"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(col("day")).as("fday"), max(col("day")).as("lday")))),

    // Explicit GROUPING SETS (A7's third face after rollup/cube —
    // Spark 4's Dataset.groupingSets API): the (status×priority),
    // (status), () lattice in ONE pass — a single expand+aggregate,
    // not three scans unioned. NULL grouping slots coalesce to 'ALL'
    // (the q44 discipline) so the compare is null-free.
    "q215_grouping_sets" -> ((s, d) => {
      import graft.functions.Num.dsumR
      orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dsumR(col("o_totalprice"), 2).as("rev"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("n"), col("rev"))
    }),

    // Referential-integrity reconciliation (D21 — the fact-vs-header
    // audit every warehouse runs before trusting a join: which order
    // keys exist on one side only, and what money rides on them): one
    // rollup per side, ONE full-outer equi-join on the key, presence
    // classification, and a side-level decimal ledger. At 100 TB both
    // sides shuffle once on the join key and everything downstream is
    // 3 rows.
    "q216_reconcile" -> ((s, d) => {
      import graft.functions.Num.dsumR
      val o = orders(s, d).groupBy(col("o_orderkey").as("k"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(38,6)")).as("price"))
      val l = lineitem(s, d).groupBy(col("l_orderkey").as("k"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast("decimal(38,6)")).as("gross"))
      o.join(l, Seq("k"), "full_outer")
        .select(
          when(col("n_orders").isNotNull && col("n_lines").isNotNull,
            "both")
            .when(col("n_orders").isNotNull, "order_only")
            .otherwise("lineitem_only").as("side"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_lines"), lit(0L)).as("n_lines"),
          coalesce(col("price"), lit(0).cast("decimal(38,6)"))
            .as("price"),
          coalesce(col("gross"), lit(0).cast("decimal(38,6)"))
            .as("gross"))
        .groupBy(col("side"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("n_orders")).as("n_orders"),
          sum(col("n_lines")).as("n_lines"),
          round(sum(col("price")), 2).cast("double").as("total_price"),
          round(sum(col("gross")), 2).cast("double").as("total_gross"))
    }),

    // As-of join: for each purchase, the latest prior-or-equal click by
    // the same user (AsOfJoin operator — single shuffle, no crossjoin).
    "q19_asof_join" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      AsOfJoin(purchases, clicks, "user_id", "ts", "click_ts")
        .select(col("event_id"), col("user_id"), col("ts"), col("click_ts"))
    }),

    // Mann–Whitney U audit (D28 — "did the value distribution SHIFT
    // LOCATION between regimes": the rank-sum location test beside
    // q222's sup-gap KS, sensitive to a median shift KS can dilute).
    // Weekend vs weekday per event_type (the q222 split). Tied values
    // take the midrank, exactly: per-(type, value) group counts, the
    // combined cumulative count by ScanSum's distributed scan (never a
    // per-type single-reducer window over the value axis), and the
    // DOUBLED weekend rank-sum 2R = Σ c_we·(2·cum_before + c + 1)
    // stays integral in DECIMAL(38,0) (~10²⁴ at 100 TB; HUGEINT in
    // the oracle). The tie term T = Σ(c³−c) routes the same way (the
    // q187 rule: the decimal route caps at ~3·10¹² events in one tied
    // value group — past that the term moves to doubles after exact
    // c², same answer to double precision). u, z and the 95 % flag
    // are the identical IEEE chain both engines evaluate over the
    // same exact integers — σ² = (n₁n₂/12)·((N+1) − T/(N(N−1))).
    "q235_mwu_audit" -> ((s, d) => {
      val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val ev = events(s, d).select(col("event_type"), col("value"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .withColumn("we", (col("day") + 4) % 7 >= 5)
      val cnt = ev.groupBy(col("event_type"), col("value"))
        .agg(sum(when(col("we"), 1L).otherwise(0L)).as("cwe"),
             sum(when(!col("we"), 1L).otherwise(0L)).as("cwd"))
        .withColumn("c", col("cwe") + col("cwd"))
      val tot = cnt.groupBy(col("event_type"))
        .agg(sum(col("cwe")).as("nwe"), sum(col("cwd")).as("nwd"),
          sum((col("c").cast(dec19) * col("c").cast(dec19) * col("c"))
            .cast(dec) - col("c").cast(dec)).cast(dec).as("tie_t"))
      val cum = graft.operators.ScanSum
        .runningSum(cnt, "event_type", "value", "c", outCol = "cumc")
      val r2 = cum
        .select(col("event_type"), (col("cwe").cast(dec19) *
          ((col("cumc") - col("c")) * 2 + col("c") + 1).cast(dec19))
          .cast(dec).as("term"))
        .groupBy(col("event_type")).agg(sum(col("term")).cast(dec).as("r2"))
      r2.join(broadcast(tot), "event_type")
        .select(col("event_type"), col("nwe").as("n_weekend"),
          col("nwd").as("n_weekday"), (col("nwe") + col("nwd")).as("nn"),
          (col("r2") - (col("nwe").cast(dec19) * (col("nwe") + 1)
            .cast(dec19)).cast(dec)).cast(dec).as("u2"), col("tie_t"))
        .withColumn("u", col("u2").cast("double") / 2.0)
        .withColumn("mu",
          col("n_weekend").cast("double") * col("n_weekday").cast("double")
            / 2.0)
        .withColumn("var_u",
          col("n_weekend").cast("double") * col("n_weekday").cast("double")
            / 12.0 * ((col("nn").cast("double") + 1.0) -
              col("tie_t").cast("double") /
                (col("nn").cast("double") * (col("nn").cast("double") - 1.0))))
        .withColumn("z",
          when(col("n_weekend") === 0 || col("n_weekday") === 0 ||
            !(col("var_u") > 0.0), lit(0.0))
            .otherwise((col("u") - col("mu")) / sqrt(col("var_u"))))
        .select(col("event_type"), col("n_weekend"), col("n_weekday"),
          col("u"), col("z"), (abs(col("z")) > 1.96).as("significant"))
    }),

    // Mann–Kendall trend test (W27): see [[mannKendallView]]. Pre-rolls
    // to the same mergeable (type, day) count unit as q219/q224; the
    // streaming twin (q240) reads the store through the IDENTICAL
    // view — the EIGHTH tail of one daily ingest.
    "q236_mann_kendall" -> ((s, d) =>
      mannKendallView(events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n")))),

    // Seasonal Mann–Kendall (W31): see [[seasonalMannKendallView]].
    // Same daily-count unit; the streaming twin (q243) is the NINTH
    // tail of the store.
    "q242_seasonal_mk" -> ((s, d) =>
      seasonalMannKendallView(events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n")))),

    // Delta-method ratio-metric A/B readout (W32 — Deng, Knoblich &
    // Lu KDD'18: the variance of a RATIO of per-user sums, which
    // naive per-event variance understates because events within a
    // user correlate; the analysis unit must be the randomization
    // unit). Per (type, user): event count N and value cents S (value
    // exact through DECIMAL(12,2)·100 — both engines round the same
    // stored double to the same 2-dp decimal); per (type, variant =
    // user_id % 2, the q166 assignment): SIX exact sufficient
    // statistics in DECIMAL(38,0)/HUGEINT. R_v = ΣS/ΣN is one IEEE
    // division; Var(R_v) applies the delta method
    // n·(s_S² − 2R·s_SN + R²·s_N²)/((n−1)·(ΣN)²) as the identical
    // IEEE chain both engines evaluate over the same exact integers
    // (the cleared-numerator (co)variances stay decimal-exact; only
    // the R-weighted combination is floating). One shuffle on
    // (type, user), then everything is types-sized.
    "q244_delta_ratio" -> ((s, d) =>
      deltaRatioView(events(s, d)
        .select(col("event_type"), col("user_id"),
          (col("value").cast("decimal(12,2)") * 100).cast("long")
            .as("cents"))
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("ne"), sum(col("cents")).as("sc")))),

    // Last-digit uniformity audit (D30 — Benford's (q183) forensic
    // sibling: FIRST digits follow Benford, LAST digits of genuine
    // fine-grained amounts are UNIFORM, and a spike at .00/.99 or a
    // favored digit is the classic hand-entered/rounded-data tell;
    // Nigrini '96). Per event_type over the cents last digit (cents
    // exact through the q244 DECIMAL(12,2)·100 route, |·| guards the
    // engines' shared dividend-sign % semantics): χ² against uniform
    // on the explicit 10-digit grid (a digit with ZERO mass must
    // contribute (n/10)², not vanish), cleared to the exact integer
    // numerator Σ(10·O_d − n)² in DECIMAL(38,0)/HUGEINT (~10²⁷ at
    // 100 TB), ONE IEEE division by 10n, and the df=9 95 % bar
    // compared on the identical double.
    "q246_digit_audit" -> ((s, d) => {
      val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val ev = events(s, d).select(col("event_type"),
        (abs((col("value").cast("decimal(12,2)") * 100).cast("long"))
          % 10).as("digit"))
      val cnt = ev.groupBy(col("event_type"), col("digit"))
        .agg(count(lit(1)).as("o"))
      val tot = cnt.groupBy(col("event_type")).agg(sum(col("o")).as("n"))
      val grid = tot.crossJoin(broadcast(
        s.range(0, 10).toDF("digit")))
      grid.join(cnt, Seq("event_type", "digit"), "left")
        .select(col("event_type"), col("n"),
          ((coalesce(col("o"), lit(0L)) * 10 - col("n")).cast(dec19) *
            (coalesce(col("o"), lit(0L)) * 10 - col("n")).cast(dec19))
            .cast(dec).as("sq"))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"), sum(col("sq")).cast(dec).as("ssq"))
        .select(col("event_type"), col("n"),
          (col("ssq").cast("double") /
            (col("n") * 10).cast("double")).as("chi2"))
        // χ²_{9, 0.95} = 16.919: identical doubles on both engines
        .withColumn("uniform", col("chi2") <= 16.919)
    }),

    // Cramér's V association audit (D31 — "is the event mix actually
    // different across weekdays, and by how much": the effect-size
    // companion the χ² tests (q166/q187) lack; Cramér '46). One
    // types×7 contingency rollup (arithmetic dow, the q188 rule),
    // χ² = n·Σ O²/(r_t·c_d) − n with every subproduct exact in
    // DECIMAL(38,0)/HUGEINT (O²·n ≤ n³ ~ 10³⁶ at 100 TB), each cell
    // ONE IEEE division accumulated through dsum (order-invariant),
    // V = √(χ²/(n·min(r−1,c−1))) as the shared IEEE chain with a
    // zero clamp against the ~1e-12 decimal-rounding dip. 1 row out.
    "q247_cramers_v" -> ((s, d) => {
      import graft.functions.Num.dsum
      val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val ev = events(s, d).select(col("event_type"),
        ((expr("unix_micros(ts) DIV 86400000000") + 4) % 7).as("dow"))
      val cells = ev.groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("o"))
        .localCheckpoint() // ≤types×7 rows; feeds margins + terms
      val rows = cells.groupBy(col("event_type")).agg(sum(col("o")).as("rt"))
      val cols_ = cells.groupBy(col("dow")).agg(sum(col("o")).as("cd"))
      val nAll = cells.agg(sum(col("o")).as("n"),
        countDistinct(col("event_type")).as("r"),
        countDistinct(col("dow")).as("c"))
      val terms = cells
        .join(broadcast(rows), "event_type")
        .join(broadcast(cols_), "dow")
        .crossJoin(broadcast(nAll))
        .select(col("n"), col("r"), col("c"),
          (((col("o").cast(dec19) * col("o").cast(dec19)).cast(dec) *
            col("n")).cast("double") /
            (col("rt").cast(dec19) * col("cd").cast(dec19)).cast("double"))
            .as("term"))
      terms.groupBy(col("n"), col("r"), col("c"))
        .agg(dsum(col("term"), 12).as("tsum"))
        .select(col("n"), col("r").as("r_types"), col("c").as("c_dows"),
          greatest(col("tsum") - col("n").cast("double"), lit(0.0))
            .as("chi2"))
        .withColumn("v",
          when(col("r_types") < 2 || col("c_dows") < 2, lit(0.0))
            .otherwise(sqrt(col("chi2") /
              (col("n") * least(col("r_types") - 1, col("c_dows") - 1))
                .cast("double"))))
        .withColumn("band",
          when(col("v") < 0.1, "negligible").when(col("v") < 0.3, "weak")
            .when(col("v") < 0.5, "moderate").otherwise("strong"))
    }),

    // Theil–Sen robust slope (W28 — the median-of-pairwise-slopes
    // line that shrugs off the outlier days that bend q219's OLS;
    // Theil '50, Sen '68): slopes over the same calendar²-bounded
    // pair table as q236 (broadcast grid self-join, an axis that does
    // not grow with the corpus), each slope ONE IEEE division of
    // exact integers, and the LOWER MEDIAN (k = ⌈m/2⌉, deterministic
    // under ties — the ordinal's VALUE is tie-order-free) located by
    // ScanSum's distributed running count in slope order — no
    // per-type sort task ever holds the whole pair table.
    "q237_sen_slope" -> ((s, d) => {
      val daily = events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint() // feeds span + types + grid
      val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val grid = daily.select(col("event_type")).distinct()
        .crossJoin(broadcast(span))
        .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
        .join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("n"), lit(0L)).as("y"))
        .localCheckpoint() // feeds both pair legs
      val pairs = grid
        .select(col("event_type"), col("day").as("da"), col("y").as("ya"))
        .join(broadcast(grid.select(col("event_type").as("et2"),
          col("day").as("db"), col("y").as("yb"))),
          col("event_type") === col("et2") && col("da") < col("db"))
        .select(col("event_type"),
          ((col("yb") - col("ya")).cast("double") /
            (col("db") - col("da")).cast("double")).as("slope"),
          lit(1L).as("one"))
      val m = pairs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("k", expr("(n_pairs + 1) DIV 2"))
      graft.operators.ScanSum
        .runningSum(pairs, "event_type", "slope", "one", outCol = "rk")
        .join(broadcast(m), "event_type")
        .filter(col("rk") === col("k"))
        .select(col("event_type"), col("n_pairs"), col("slope").as("sen_slope"))
    }),

    // CUPED variance-reduction audit (W29 — Deng et al. WSDM'13, the
    // pre-period covariate adjustment every large experimentation
    // platform applies before reading an A/B delta): per (type, user),
    // x = pre-period event count, y = experiment-period count (the
    // calendar split at its integer midpoint), variant = user_id % 2
    // (the q166 assignment). θ = cov(x,y)/var(x) from FIVE exact
    // sufficient statistics in DECIMAL(38,0) (the q219 closed form
    // turned covariate-wise; HUGEINT in the oracle); the adjusted
    // delta (ȳ₁−ȳ₀) − θ(x̄₁−x̄₀) and the variance-reduction ρ² =
    // num²/(den_x·den_y) are the identical IEEE chains both engines
    // evaluate (ρ²'s num² would pass 10³⁸, so it multiplies as
    // doubles AFTER the exact numerator — same answer to double
    // precision). One shuffle on (type, user), then everything is
    // types-sized.
    "q238_cuped" -> ((s, d) => {
      val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val ev = events(s, d).select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val ux = ev.crossJoin(broadcast(span))
        .withColumn("pre",
          col("day") < col("d0") + expr("(d1 - d0 + 1) DIV 2"))
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(when(col("pre"), 1L).otherwise(0L)).as("x"),
             sum(when(!col("pre"), 1L).otherwise(0L)).as("y"))
        .withColumn("v", col("user_id") % 2)
        .localCheckpoint() // feeds pooled stats + per-variant means
      val pooled = ux.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast(dec).as("sx"), sum(col("y")).cast(dec).as("sy"),
          sum(col("x").cast(dec19) * col("y").cast(dec19)).cast(dec)
            .as("sxy"),
          sum(col("x").cast(dec19) * col("x").cast(dec19)).cast(dec)
            .as("sxx"),
          sum(col("y").cast(dec19) * col("y").cast(dec19)).cast(dec)
            .as("syy"))
        .withColumn("num", col("n").cast(dec) * col("sxy") -
          col("sx") * col("sy"))
        .withColumn("denx", col("n").cast(dec) * col("sxx") -
          col("sx") * col("sx"))
        .withColumn("deny", col("n").cast(dec) * col("syy") -
          col("sy") * col("sy"))
      val byV = ux.groupBy(col("event_type"))
        .agg(sum(when(col("v") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("v") === 1, 1L).otherwise(0L)).as("n1"),
          coalesce(sum(when(col("v") === 0, col("x"))), lit(0L)).as("sx0"),
          coalesce(sum(when(col("v") === 1, col("x"))), lit(0L)).as("sx1"),
          coalesce(sum(when(col("v") === 0, col("y"))), lit(0L)).as("sy0"),
          coalesce(sum(when(col("v") === 1, col("y"))), lit(0L)).as("sy1"))
      pooled.join(broadcast(byV), "event_type")
        .withColumn("theta", when(col("denx") === 0, lit(0.0))
          .otherwise(col("num").cast("double") / col("denx").cast("double")))
        .withColumn("diff_raw",
          when(col("n0") === 0 || col("n1") === 0, lit(0.0))
            .otherwise(col("sy1").cast("double") / col("n1").cast("double") -
              col("sy0").cast("double") / col("n0").cast("double")))
        .withColumn("diff_adj",
          when(col("n0") === 0 || col("n1") === 0, lit(0.0))
            .otherwise(col("diff_raw") - col("theta") *
              (col("sx1").cast("double") / col("n1").cast("double") -
                col("sx0").cast("double") / col("n0").cast("double"))))
        .withColumn("var_reduction",
          when(col("denx") === 0 || col("deny") === 0, lit(0.0))
            .otherwise(col("num").cast("double") * col("num").cast("double") /
              (col("denx").cast("double") * col("deny").cast("double"))))
        .select(col("event_type"), col("n").as("n_users"), col("n0"),
          col("n1"), col("theta"), col("diff_raw"), col("diff_adj"),
          col("var_reduction"))
    }),

    // Kaplan–Meier retention curve (W30 — the right-censored survival
    // estimate behind every churn dashboard; Kaplan & Meier '58): per
    // (type, user) lifetime t = lday − fday, churned iff last seen ≥
    // [[KmCensorDays]] before the corpus edge (everyone else is
    // CENSORED — alive, at risk, not an event). Risk sets n_t come
    // from ScanSum's distributed prefix count in duration order (the
    // risk set is n − #shorter-lifetimes — never a per-type sort);
    // the product Π(1 − d/n) goes through ppb-integer ln terms (the
    // q200 decimal-rounding recipe made integral: rounding ln to 1e-9
    // erases the cross-engine libm ulp, and the prefix SUM of exact
    // BIGINTs is order-free), cumulated by a second ScanSum pass.
    // ln_surv_ppb is the bit-exact integer answer; survival = exp of
    // it is the human-readable double.
    "q239_survival" -> ((s, d) =>
      survivalView(events(s, d).select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day")))),

    // Churn half-life fit (W34 — the single number a dashboard wants
    // from q239's whole curve: IF retention decays exponentially,
    // S(t) ≈ e^(−λt), then ln S(t) is LINEAR in t and λ is minus its
    // slope — and q239's ln_surv_ppb IS ln S(t) as an exact integer,
    // so the q219 OLS closed form applies verbatim with zero new
    // float surface: five DECIMAL(38,0) sufficient statistics over
    // the (t, ln_surv_ppb) points (bounded by distinct lifetimes ≤
    // the calendar), slope one IEEE division, λ = −slope/10⁹,
    // half-life = ln2/λ with the shared literal. The composition is
    // the point: survival estimator → trend estimator, both already
    // oracled on their own. */
    "q252_churn_halflife" -> ((s, d) => {
      val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val km = survivalView(events(s, d).select(col("event_type"),
        col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day")))
      km.select(col("event_type"), col("t_days").as("x"),
          col("ln_surv_ppb").as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast(dec).as("sx"), sum(col("y")).cast(dec).as("sy"),
          sum(col("x").cast(dec19) * col("y").cast(dec19)).cast(dec)
            .as("sxy"),
          sum(col("x").cast(dec19) * col("x").cast(dec19)).cast(dec)
            .as("sxx"))
        .withColumn("num",
          col("n").cast(dec) * col("sxy") - col("sx") * col("sy"))
        .withColumn("den",
          col("n").cast(dec) * col("sxx") - col("sx") * col("sx"))
        .withColumn("slope_ppb",
          when(col("den") === 0, lit(0.0))
            .otherwise(col("num").cast("double") / col("den").cast("double")))
        .withColumn("lambda_per_day", -col("slope_ppb") / 1.0e9)
        .withColumn("half_life_days",
          when(col("lambda_per_day") > 0.0,
            lit(0.6931471805599453) / col("lambda_per_day"))
            .otherwise(lit(0.0)))
        .select(col("event_type"), col("n").as("n_points"),
          col("lambda_per_day"), col("half_life_days"),
          (col("lambda_per_day") > 0.0).as("decaying"))
    }),

    // Cliff's delta effect size (D34 — Cliff '93: the DOMINANCE
    // companion of q235's Mann–Whitney decision — δ = P(x>y) − P(x<y)
    // on [−1, 1], the magnitude readout a significance flag alone
    // can't give). Same weekend/weekday split and per-(type, value)
    // count table as q235; strictly-greater pairs come from ONE
    // ScanSum prefix over the weekday counts (gt = Σ_v cwe(v) ·
    // wd-mass strictly below v), equal pairs are the value-level
    // product, lt is the exact complement — all pair counts
    // DECIMAL(38,0)/HUGEINT (n_we·n_wd ~ 10²⁴ at 10¹² events wraps
    // BIGINT; the display doubles are the identical cast chain, exact
    // to 2⁵³). δ is ONE IEEE division; the Romano '06 magnitude
    // ladder compares the identical double in both engines.
    "q256_cliffs_delta" -> ((s, d) => {
      val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val ev = events(s, d).select(col("event_type"), col("value"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .withColumn("we", (col("day") + 4) % 7 >= 5)
      val cnt = ev.groupBy(col("event_type"), col("value"))
        .agg(sum(when(col("we"), 1L).otherwise(0L)).as("cwe"),
             sum(when(!col("we"), 1L).otherwise(0L)).as("cwd"))
      val cum = graft.operators.ScanSum
        .runningSum(cnt, "event_type", "value", "cwd", outCol = "cumwd")
      cum.groupBy(col("event_type"))
        .agg(sum(col("cwe")).as("n_weekend"),
          sum(col("cwd")).as("n_weekday"),
          sum((col("cwe").cast(dec19) *
            (col("cumwd") - col("cwd")).cast(dec19)).cast(dec))
            .cast(dec).as("gt"),
          sum((col("cwe").cast(dec19) * col("cwd").cast(dec19)).cast(dec))
            .cast(dec).as("eq"))
        .withColumn("np",
          (col("n_weekend").cast(dec19) * col("n_weekday").cast(dec19))
            .cast(dec))
        .withColumn("lt", col("np") - col("gt") - col("eq"))
        .withColumn("delta",
          when(col("n_weekend") === 0 || col("n_weekday") === 0, lit(0.0))
            .otherwise((col("gt") - col("lt")).cast("double") /
              col("np").cast("double")))
        .withColumn("magnitude",
          when(abs(col("delta")) < 0.147, "negligible")
            .when(abs(col("delta")) < 0.33, "small")
            .when(abs(col("delta")) < 0.474, "medium")
            .otherwise("large"))
        .select(col("event_type"), col("n_weekend"), col("n_weekday"),
          col("gt").cast("double").as("n_gt"),
          col("lt").cast("double").as("n_lt"),
          col("eq").cast("double").as("n_eq"),
          col("delta"), col("magnitude"))
    }),

    // Nelson–Aalen cumulative hazard (W35): see [[nelsonAalenView]] —
    // the q239 KM table's additive-increment sibling, exact ppb
    // integers end-to-end. The streaming twin (q264) is the SECOND
    // tail of the q211 first-seen store.
    "q258_nelson_aalen" -> ((s, d) =>
      nelsonAalenView(survivalView(events(s, d).select(col("event_type"),
        col("user_id"), expr("unix_micros(ts) DIV 86400000000")
          .as("day"))))),

    // Log-rank test (W36 — Mantel '66/Peto '72: "do the two variants
    // CHURN at the same rate" — the survival-curve A/B readout q239
    // alone can't decide; the standard primary endpoint test for
    // retention experiments). Per (type, variant = user_id % 2, the
    // q166 assignment): lifetimes and churn flags exactly as q239;
    // risk sets per variant ride ONE ScanSum over the zero-filled
    // (type, variant) × distinct-lifetime grid (grid rows ≤ 2 ×
    // calendar per type — bounded); at each death time the
    // hypergeometric terms E₁ += d·n₁/n and V += d·n₁·n₀·(n−d) /
    // (n²(n−1)) are the identical IEEE chain both engines evaluate
    // over the same exact integers, accumulated by dsum
    // (order-independent); O₁ stays BIGINT exact. Z = (O₁−E₁)/√V,
    // one final comparison.
    "q259_logrank" -> ((s, d) => {
      import graft.functions.Num.dsum
      variantRiskSets(s, events(s, d)).groupBy(col("event_type"))
        .agg(sum(col("d1")).as("o1"),
          dsum(col("dt").cast("double") * col("n1").cast("double") /
            col("nt").cast("double")).as("e1"),
          dsum(when(col("nt") > 1,
            col("dt").cast("double") * col("n1").cast("double") *
              col("n0").cast("double") *
              (col("nt") - col("dt")).cast("double") /
              (col("nt").cast("double") * col("nt").cast("double") *
                (col("nt") - 1).cast("double"))).otherwise(lit(0.0)))
            .as("var_lr"))
        .withColumn("z",
          when(col("var_lr") > 0.0,
            (col("o1").cast("double") - col("e1")) / sqrt(col("var_lr")))
            .otherwise(lit(0.0)))
        .withColumn("significant", abs(col("z")) > 1.96)
        .select(col("event_type"), col("o1").as("observed_1"),
          col("e1").as("expected_1"), col("var_lr"), col("z"),
          col("significant"))
    }),

    // Kendall τ-b daily trend (W37): see [[kendallTauView]] — q236's
    // effect-size companion over the same broadcast calendar grid.
    // The streaming twin (q262) is the TENTH daily-count-store tail.
    "q260_kendall_tau" -> ((s, d) =>
      kendallTauView(events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n")))),

    // Seasonal-strength η² (W38): see [[seasonalStrengthView]]. The
    // streaming twin (q268) is the ELEVENTH daily-count-store tail.
    "q265_seasonal_strength" -> ((s, d) =>
      seasonalStrengthView(events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n")))),

    // Wald–Wolfowitz runs test (D37 — Wald & Wolfowitz '40: "is the
    // daily series RANDOM around its median, or does it streak" — the
    // autocorrelation-free randomness read that flags regime shifts
    // and sticky outages q124's pointwise z-score can't see). Over
    // the zero-filled calendar grid: the lower median comes from ONE
    // ScanSum rank over the bounded grid (rank (n+1) DIV 2 under the
    // (y, day) total order); median-valued days are DISCARDED (the
    // standard rule); the retained days re-index through a second
    // ScanSum and adjacency is an EQUI-JOIN on consecutive indices —
    // no window, no lag. n₁/n₂/R are BIGINT-exact under the
    // [[MaxGridDays]] cap (2n₁n₂·(2n₁n₂−m) ≤ 10¹⁸); μ, σ², z are the
    // identical IEEE chain in both engines.
    "q266_runs_test" -> ((s, d) => {
      val daily = events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"))
      val g = dailyGrid(daily)
      val ranked = graft.operators.ScanSum.runningSum(
        g.withColumn("ord", struct(col("y"), col("day")))
          .withColumn("one", lit(1L)),
        "event_type", "ord", "one", outCol = "rk")
      val nd = g.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
      val med = ranked.join(broadcast(nd), "event_type")
        .filter(col("rk") === expr("(n_days + 1) DIV 2"))
        .select(col("event_type"), col("y").as("med"))
      val kept = g.join(broadcast(med), "event_type")
        .filter(col("y") =!= col("med"))
        .withColumn("above", col("y") > col("med"))
      val idx = graft.operators.ScanSum.runningSum(
        kept.withColumn("one", lit(1L)),
        "event_type", "day", "one", outCol = "i")
      val changes = idx
        .select(col("event_type"), col("i"), col("above"))
        .join(idx.select(col("event_type").as("et2"),
          (col("i") - 1).as("i2"), col("above").as("above2")),
          col("event_type") === col("et2") && col("i") === col("i2"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("above") =!= col("above2"), 1L).otherwise(0L))
          .as("chg"))
      kept.groupBy(col("event_type"))
        .agg(sum(when(col("above"), 1L).otherwise(0L)).as("n_above"),
          sum(when(!col("above"), 1L).otherwise(0L)).as("n_below"))
        .join(broadcast(changes), Seq("event_type"), "left")
        .withColumn("runs", coalesce(col("chg"), lit(0L)) + 1)
        .withColumn("m", col("n_above") + col("n_below"))
        .withColumn("p", col("n_above") * col("n_below"))
        .withColumn("mu", lit(1.0) +
          (col("p") * 2).cast("double") / col("m").cast("double"))
        .withColumn("var_r",
          when(col("m") > 1,
            (col("p") * 2 * (col("p") * 2 - col("m"))).cast("double") /
              (col("m") * col("m") * (col("m") - 1)).cast("double"))
            .otherwise(lit(0.0)))
        .withColumn("z",
          when(col("n_above") > 0 && col("n_below") > 0 &&
              col("var_r") > 0.0,
            (col("runs").cast("double") - col("mu")) / sqrt(col("var_r")))
            .otherwise(lit(0.0)))
        .select(col("event_type"), col("n_above"), col("n_below"),
          col("runs"), col("z"), (abs(col("z")) <= 1.96).as("random"))
    }),

    // Cohen's d / Hedges' g effect size (D36 — Cohen '88, Hedges '81:
    // the standardized mean difference between the q166 variants on
    // value cents — the PRACTICAL-significance readout the q166/q244
    // z flags can't give, and the number a power analysis consumes).
    // THREE exact sufficient statistics per (type, variant) in
    // DECIMAL(38,0)/HUGEINT (Σc² ~ 10³⁰ at 10¹² events wraps BIGINT;
    // cents exact through the q244 DECIMAL(12,2)·100 route, pinned by
    // the cent-grid corpus guard); the cleared-numerator n·Σc² − S²
    // stays decimal-exact; means, pooled variance, d, and the Hedges
    // small-sample correction J = 1 − 3/(4n−9) are the identical IEEE
    // chain in both engines; the Cohen '88 magnitude ladder compares
    // the shared double.
    "q261_cohens_d" -> ((s, d) => {
      val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val st = events(s, d).select(col("event_type"),
          (col("user_id") % 2).as("variant"),
          (col("value").cast("decimal(12,2)") * 100).cast("long")
            .as("cents"))
        .groupBy(col("event_type"), col("variant"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).cast(dec).as("sc"),
          sum((col("cents").cast(dec19) * col("cents").cast(dec19))
            .cast(dec)).cast(dec).as("scc"))
        .withColumn("nv_num",
          col("n").cast(dec) * col("scc") - col("sc") * col("sc"))
      st.groupBy(col("event_type"))
        .agg(sum(when(col("variant") === 0, col("n"))).as("n0"),
          sum(when(col("variant") === 1, col("n"))).as("n1"),
          max(when(col("variant") === 0, col("sc"))).as("s0"),
          max(when(col("variant") === 1, col("sc"))).as("s1"),
          max(when(col("variant") === 0, col("nv_num"))).as("q0"),
          max(when(col("variant") === 1, col("nv_num"))).as("q1"))
        .withColumn("mean0",
          col("s0").cast("double") / col("n0").cast("double"))
        .withColumn("mean1",
          col("s1").cast("double") / col("n1").cast("double"))
        .withColumn("sp2",
          (col("q0").cast("double") / col("n0").cast("double") +
            col("q1").cast("double") / col("n1").cast("double")) /
            (col("n0") + col("n1") - 2).cast("double"))
        .withColumn("cohens_d",
          when(col("n0") > 0 && col("n1") > 0 &&
              col("n0") + col("n1") > 2 && col("sp2") > 0.0,
            (col("mean1") - col("mean0")) / sqrt(col("sp2")))
            .otherwise(lit(0.0)))
        .withColumn("hedges_g", col("cohens_d") *
          (lit(1.0) - lit(3.0) /
            ((col("n0") + col("n1")) * 4 - 9).cast("double")))
        .withColumn("magnitude",
          when(abs(col("cohens_d")) < 0.2, "negligible")
            .when(abs(col("cohens_d")) < 0.5, "small")
            .when(abs(col("cohens_d")) < 0.8, "medium")
            .otherwise("large"))
        .select(col("event_type"), col("n0"), col("n1"),
          col("mean0").as("mean0_cents"), col("mean1").as("mean1_cents"),
          col("cohens_d"), col("hedges_g"), col("magnitude"))
    }),

    // Welch's unequal-variance t (D38 — Welch '47: the default
    // two-sample mean test when the variants' variances differ, which
    // q261's pooled-variance d quietly assumes away; the
    // Welch–Satterthwaite df is the number a sequential-testing
    // harness consumes). Identical exact sufficient statistics to
    // q261 (cents through DECIMAL(12,2)·100; n·Σc² − S² cleared in
    // DECIMAL(38,0) — Σc² ~ 10³⁰ at 10¹² events wraps BIGINT); each
    // variant's sample variance is ONE IEEE division of the exact
    // numerator by n·(n−1) (itself DECIMAL — n² ~ 10²⁴); means, the
    // two standard-error legs, t, and the Satterthwaite df are the
    // identical IEEE chain in both engines.
    "q269_welch_t" -> ((s, d) => {
      val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val st = events(s, d).select(col("event_type"),
          (col("user_id") % 2).as("variant"),
          (col("value").cast("decimal(12,2)") * 100).cast("long")
            .as("cents"))
        .groupBy(col("event_type"), col("variant"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).cast(dec).as("sc"),
          sum((col("cents").cast(dec19) * col("cents").cast(dec19))
            .cast(dec)).cast(dec).as("scc"))
        .withColumn("nv_num",
          col("n").cast(dec) * col("scc") - col("sc") * col("sc"))
        .withColumn("nn1",
          (col("n").cast(dec19) * (col("n") - 1).cast(dec19)).cast(dec))
      st.groupBy(col("event_type"))
        .agg(sum(when(col("variant") === 0, col("n"))).as("n0"),
          sum(when(col("variant") === 1, col("n"))).as("n1"),
          max(when(col("variant") === 0, col("sc"))).as("s0"),
          max(when(col("variant") === 1, col("sc"))).as("s1"),
          max(when(col("variant") === 0, col("nv_num"))).as("q0"),
          max(when(col("variant") === 1, col("nv_num"))).as("q1"),
          max(when(col("variant") === 0, col("nn1"))).as("m0"),
          max(when(col("variant") === 1, col("nn1"))).as("m1"))
        .withColumn("mean0",
          col("s0").cast("double") / col("n0").cast("double"))
        .withColumn("mean1",
          col("s1").cast("double") / col("n1").cast("double"))
        .withColumn("v0", col("q0").cast("double") / col("m0").cast("double"))
        .withColumn("v1", col("q1").cast("double") / col("m1").cast("double"))
        .withColumn("se0", col("v0") / col("n0").cast("double"))
        .withColumn("se1", col("v1") / col("n1").cast("double"))
        .withColumn("se2", col("se0") + col("se1"))
        .withColumn("t_welch",
          when(col("n0") > 1 && col("n1") > 1 && col("se2") > 0.0,
            (col("mean1") - col("mean0")) / sqrt(col("se2")))
            .otherwise(lit(0.0)))
        .withColumn("df_welch",
          when(col("n0") > 1 && col("n1") > 1 && col("se2") > 0.0,
            col("se2") * col("se2") /
              (col("se0") * col("se0") / (col("n0") - 1).cast("double") +
                col("se1") * col("se1") / (col("n1") - 1).cast("double")))
            .otherwise(lit(0.0)))
        .select(col("event_type"), col("n0"), col("n1"),
          col("mean0").as("mean0_cents"), col("mean1").as("mean1_cents"),
          col("v0").as("var0"), col("v1").as("var1"),
          col("t_welch"), col("df_welch"),
          (abs(col("t_welch")) > 1.96).as("significant"))
    }),

    // One-way ANOVA F across event types (D39 — Fisher: "do the K
    // event types have the same mean ticket" in ONE global test,
    // where running K² pairwise q269s inflates the false-positive
    // rate; the K-group omnibus gate run before any pairwise dig).
    // Per-type exact sufficient statistics as q269; Σ S_t²/n_t
    // accumulates per-type IEEE terms of exact integers through dsum
    // (order-independent, the q265 pattern); SS decomposition, F, and
    // the large-N significance cut (k−1)·F > χ²₉₅(k−1) — the shared
    // Chi2Crit95 ladder, denominator df being corpus-sized — are the
    // identical IEEE chain in both engines.
    "q270_anova_f" -> ((s, d) => {
      import graft.functions.Num.dsum
      val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val st = events(s, d).select(col("event_type"),
          (col("value").cast("decimal(12,2)") * 100).cast("long")
            .as("cents"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).cast(dec).as("sc"),
          sum((col("cents").cast(dec19) * col("cents").cast(dec19))
            .cast(dec)).cast(dec).as("scc"))
      st.agg(count(lit(1)).as("n_groups"),
          sum(col("n")).as("n_total"),
          sum(col("sc")).cast(dec).as("t"),
          sum(col("scc")).cast(dec).as("qtot"),
          dsum(col("sc").cast("double") * col("sc").cast("double") /
            col("n").cast("double")).as("b"))
        .withColumn("tt",
          col("t").cast("double") * col("t").cast("double") /
            col("n_total").cast("double"))
        .withColumn("ss_between", col("b") - col("tt"))
        .withColumn("ss_within", col("qtot").cast("double") - col("b"))
        .withColumn("df1", col("n_groups") - 1)
        .withColumn("f_stat",
          when(col("df1") >= 1 && col("n_total") > col("n_groups") &&
              col("ss_within") > 0.0,
            (col("ss_between") / col("df1").cast("double")) /
              (col("ss_within") /
                (col("n_total") - col("n_groups")).cast("double")))
            .otherwise(lit(0.0)))
        .withColumn("significant_asymp",
          when(col("df1").between(1, QualityQueries.Chi2Crit95.size),
            col("f_stat") * col("df1").cast("double") >
              element_at(array(QualityQueries.Chi2Crit95.map(lit): _*),
                col("df1").cast("int")))
            .otherwise(lit(null).cast("boolean")))
        .select(col("n_groups"), col("n_total"), col("ss_between"),
          col("ss_within"), col("f_stat"), col("significant_asymp"))
    }),

    // McNemar's paired test (D40 — McNemar '47: "did individual USERS
    // change behavior between the halves of the window" — the paired
    // read q166's independent-samples z cannot make, because the same
    // user sits in both periods and the pairing removes the
    // between-user variance). Per (type, user): active in the first /
    // second calendar half (the midpoint is an exact integer from the
    // 1-row broadcast day span); only the discordant cells carry
    // information — χ² = (max(|b−c|−1, 0))²/(b+c) with the standard
    // continuity correction (floored at zero so b == c reads χ² = 0,
    // not 1/(b+c)), exact BIGINTs up to ONE IEEE division, cut at
    // χ²₉₅(1) = 3.8415 on the identical double in both engines.
    "q271_mcnemar" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val pu = ev.crossJoin(broadcast(span))
        .withColumn("mid", expr("(d0 + d1 + 1) DIV 2"))
        .groupBy(col("event_type"), col("user_id"))
        .agg(max(when(col("day") < col("mid"), 1L).otherwise(0L))
            .as("first_half"),
          max(when(col("day") >= col("mid"), 1L).otherwise(0L))
            .as("second_half"))
      pu.groupBy(col("event_type"))
        .agg(sum(when(col("first_half") === 1 && col("second_half") === 0,
            1L).otherwise(0L)).as("n_first_only"),
          sum(when(col("first_half") === 0 && col("second_half") === 1,
            1L).otherwise(0L)).as("n_second_only"),
          sum(when(col("first_half") === 1 && col("second_half") === 1,
            1L).otherwise(0L)).as("n_both"))
        .withColumn("disc", col("n_first_only") + col("n_second_only"))
        .withColumn("cc",
          greatest(lit(0L), abs(col("n_first_only") - col("n_second_only")) - 1))
        .withColumn("chi2_mcnemar",
          when(col("disc") > 0,
            (col("cc").cast(org.apache.spark.sql.types.DecimalType(19, 0)) *
              col("cc").cast(org.apache.spark.sql.types.DecimalType(19, 0)))
              .cast(org.apache.spark.sql.types.DecimalType(38, 0))
              .cast("double") / col("disc").cast("double"))
            .otherwise(lit(0.0)))
        .select(col("event_type"), col("n_first_only"),
          col("n_second_only"), col("n_both"), col("chi2_mcnemar"),
          (col("chi2_mcnemar") > 3.8415).as("significant"))
    }),

    // Cox–Stuart trend test (W39): see [[coxStuartView]]. The
    // streaming twin (q279) is a daily-count-store tail.
    "q272_cox_stuart" -> ((s, d) =>
      coxStuartView(events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n")))),

    // Turning-point randomness test (W40): see [[turningPointView]].
    // The streaming twin (q280) is a daily-count-store tail.
    "q273_turning_point" -> ((s, d) =>
      turningPointView(events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n")))),

    // Conversion odds ratio with Woolf CI (W41 — Woolf '55 with the
    // Haldane–Anscombe ½ smoothing: the EFFECT-SIZE companion to
    // q166's two-proportion z — an interval a decision-maker can read,
    // robust to zero cells, and the log-scale quantity meta-analyses
    // pool). The 2×2 is EXACTLY q166's (variant = user_id % 2,
    // converter = user with ≥ AbConvK events of the type, via
    // abTestView); all four cells are exact BIGINTs; the smoothed
    // cells a+½ … are exact doubles; ln(OR) goes through the
    // decimal(20,9) rounding route (both engines round their libm ln
    // to the same 9 decimals — the lnR trick), and the CI is reported
    // on the LOG scale (ln_lo, ln_hi): exp's cross-engine ulps never
    // enter the compared columns.
    "q277_odds_ratio" -> ((s, d) => {
      val lnR = (c: Column) => log(c)
        .cast(org.apache.spark.sql.types.DecimalType(20, 9)).cast("double")
      val t22 = abTestView(events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("k")))
        .select(col("event_type"), col("n1"), col("c1"),
          col("n2"), col("c2"))
      t22
        .withColumn("a", col("c1").cast("double") + 0.5)
        .withColumn("b", (col("n1") - col("c1")).cast("double") + 0.5)
        .withColumn("c", col("c2").cast("double") + 0.5)
        .withColumn("dd", (col("n2") - col("c2")).cast("double") + 0.5)
        .withColumn("odds_ratio",
          col("a") * col("dd") / (col("b") * col("c")))
        .withColumn("ln_or", lnR(col("odds_ratio")))
        .withColumn("se_ln",
          sqrt(lit(1.0) / col("a") + lit(1.0) / col("b") +
            lit(1.0) / col("c") + lit(1.0) / col("dd")))
        .withColumn("ln_lo", col("ln_or") - lit(1.96) * col("se_ln"))
        .withColumn("ln_hi", col("ln_or") + lit(1.96) * col("se_ln"))
        .select(col("event_type"),
          col("c1").as("conv_a"), col("n1").as("n_a"),
          col("c2").as("conv_b"), col("n2").as("n_b"),
          col("odds_ratio"), col("ln_or"), col("ln_lo"), col("ln_hi"),
          (col("ln_lo") > 0.0 || col("ln_hi") < 0.0).as("significant"))
    }),

    // Gehan–Wilcoxon weighted log-rank (W42 — Gehan '65/Breslow '70:
    // the EARLY-difference survival test — weighting each death time
    // by the number still at risk makes it sensitive to churn-rate
    // gaps in the first days, where q259's unweighted log-rank —
    // which this complements over the SAME [[variantRiskSets]]
    // table — spreads its power over the whole curve). With weight
    // w_t = n_t the per-time term n_t·d1 − d_t·n1 is an exact
    // integer, so U stays DECIMAL(38,0)-exact end-to-end (products
    // ~ 10²⁴ at 10¹² users wrap BIGINT); the variance terms
    // d·n1·n0·(n−d)/(n−1) are the identical IEEE chain over the same
    // exact integers, accumulated by dsum; z = U/√V is one final
    // division.
    "q278_gehan_wilcoxon" -> ((s, d) => {
      import graft.functions.Num.dsum
      val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      variantRiskSets(s, events(s, d)).groupBy(col("event_type"))
        .agg(sum((col("nt").cast(dec19) * col("d1").cast(dec19)).cast(dec) -
            (col("dt").cast(dec19) * col("n1").cast(dec19)).cast(dec))
          .cast(dec).as("u"),
          dsum(when(col("nt") > 1,
            col("dt").cast("double") * col("n1").cast("double") *
              col("n0").cast("double") *
              (col("nt") - col("dt")).cast("double") /
              (col("nt") - 1).cast("double")).otherwise(lit(0.0)))
            .as("var_gehan"))
        .withColumn("z",
          when(col("var_gehan") > 0.0,
            col("u").cast("double") / sqrt(col("var_gehan")))
            .otherwise(lit(0.0)))
        .select(col("event_type"), col("u").cast("double").as("u_gehan"),
          col("var_gehan"), col("z"),
          (abs(col("z")) > 1.96).as("significant"))
    })
  )

  /** Per-(type, lifetime) two-variant risk-set table shared by the
    * log-rank (q259) and Gehan–Wilcoxon (q278) tests: lifetimes and
    * churn flags exactly as q239 (variant = user_id % 2, the q166
    * assignment), risk sets per variant through ONE ScanSum over the
    * zero-filled (type, variant) × distinct-lifetime grid
    * (calendar-bounded rows, 2-row broadcast variant axis). Emits one
    * row per death time: (event_type, t, n1, n0, d1, d0, nt, dt). */
  private[graft] def variantRiskSets(s: SparkSession,
                                     ev0: DataFrame): DataFrame = {
    val ev = ev0.select(col("event_type"), col("user_id"),
      expr("unix_micros(ts) DIV 86400000000").as("day"))
    val pu0 = ev.groupBy(col("event_type"), col("user_id"))
      .agg(min(col("day")).as("fday"), max(col("day")).as("lday"))
      .withColumn("variant", col("user_id") % 2)
    val dmax = pu0.agg(max(col("lday")).as("d1"))
    val dur = pu0.crossJoin(broadcast(dmax))
      .select(col("event_type"), col("variant"),
        (col("lday") - col("fday")).as("t"),
        (col("lday") <= col("d1") - KmCensorDays).as("churned"))
      .groupBy(col("event_type"), col("variant"), col("t"))
      .agg(count(lit(1)).as("ct"),
        sum(when(col("churned"), 1L).otherwise(0L)).as("d"))
      .localCheckpoint() // calendar-bounded; feeds grid + ntot
    val grid = dur.select(col("event_type"), col("t")).distinct()
      .crossJoin(broadcast(s.range(0, 2).toDF("variant")))
      .join(dur, Seq("event_type", "variant", "t"), "left")
      .select(col("event_type"), col("variant"), col("t"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("d"), lit(0L)).as("d"))
      .withColumn("tv",
        concat(col("event_type"), lit("|"), col("variant")))
    val ntot = dur.groupBy(col("event_type"), col("variant"))
      .agg(sum(col("ct")).as("n_users"))
    val risk = graft.operators.ScanSum
      .runningSum(grid, "tv", "t", "ct", outCol = "cumct")
      .join(broadcast(ntot), Seq("event_type", "variant"), "left")
      .withColumn("n_risk",
        coalesce(col("n_users"), lit(0L)) - (col("cumct") - col("ct")))
    risk.groupBy(col("event_type"), col("t"))
      .agg(sum(when(col("variant") === 1, col("n_risk")).otherwise(0L))
          .as("n1"),
        sum(when(col("variant") === 0, col("n_risk")).otherwise(0L))
          .as("n0"),
        sum(when(col("variant") === 1, col("d")).otherwise(0L)).as("d1"),
        sum(when(col("variant") === 0, col("d")).otherwise(0L)).as("d0"))
      .withColumn("nt", col("n0") + col("n1"))
      .withColumn("dt", col("d0") + col("d1"))
      .filter(col("dt") > 0)
  }

  /** The q239 Kaplan–Meier table over ANY (event_type, user_id, day)
    * event projection — lifetimes, censoring at the corpus edge, risk
    * sets and the ln-product prefix both through ScanSum. Shared with
    * q252, which fits the exponential-decay line through the exact
    * ln_surv_ppb integers this view emits. */
  def survivalView(ev: DataFrame): DataFrame =
    survivalFromLifetimes(perUserLifetimes(ev))

  /** Per-(type, user) lifetime rollup — min/max day are MERGEABLE, so
    * the streaming twins (q264) read the SAME shape off the q211
    * first-seen store's merge-on-read (MIN, MAX). */
  private[graft] def perUserLifetimes(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), col("user_id"))
      .agg(min(col("day")).as("fday"), max(col("day")).as("lday"))

  /** The KM chain from per-user (fday, lday) lifetimes: the censor
    * horizon derives from max(lday) — identical to max(day) over raw
    * events, so batch and store-fed runs see the same edge. */
  private[graft] def survivalFromLifetimes(pu0: DataFrame): DataFrame = {
    val dmax = pu0.agg(max(col("lday")).as("d1"))
    val pu = pu0
      .crossJoin(broadcast(dmax))
      .select(col("event_type"), (col("lday") - col("fday")).as("t"),
        (col("lday") <= col("d1") - KmCensorDays).as("churned"))
    val dur = pu.groupBy(col("event_type"), col("t"))
      .agg(count(lit(1)).as("ct"),
        sum(when(col("churned"), 1L).otherwise(0L)).as("d"))
    val ntot = dur.groupBy(col("event_type"))
      .agg(sum(col("ct")).as("n_users"))
    val risk = graft.operators.ScanSum
      .runningSum(dur, "event_type", "t", "ct", outCol = "cumct")
      .join(broadcast(ntot), "event_type")
      .withColumn("n_risk",
        col("n_users") - (col("cumct") - col("ct")))
      .withColumn("ln_ppb",
        when(col("d") === 0 || col("n_risk") === col("d"), 0L)
          .otherwise((log((col("n_risk") - col("d")).cast("double") /
            col("n_risk").cast("double"))
            .cast(org.apache.spark.sql.types.DecimalType(20, 9)) *
            1000000000).cast("long")))
    graft.operators.ScanSum
      .runningSum(risk, "event_type", "t", "ln_ppb", outCol = "ln_surv_ppb")
      .select(col("event_type"), col("t").as("t_days"), col("n_risk"),
        col("d").as("d_churn"), (col("ct") - col("d")).as("n_censored"),
        col("ln_surv_ppb"),
        when(col("n_risk") === col("d"), lit(0.0))
          .otherwise(exp(col("ln_surv_ppb").cast("double") / 1.0e9))
          .as("survival"))
  }

  /** Nelson–Aalen cumulative hazard over the q239 KM table (W35 —
    * Nelson '72 / Aalen '78: Ĥ(t) = Σ_{tᵢ≤t} dᵢ/nᵢ, the estimator
    * whose INCREMENTS ADD — the integral of churn intensity, stabler
    * than −ln Ŝ near exhausted risk sets and the standard companion
    * curve to KM). Each increment is the exact integer ppb
    * (dᵢ·10⁹) DIV nᵢ — DECIMAL(38,0)-routed because d·10⁹ ~ 10²¹ at
    * 10¹² users wraps BIGINT (HUGEINT in the oracle) — and the prefix
    * sum rides ScanSum's two-pass scan, so the whole curve is exact
    * integers with the single IEEE division deferred to the display
    * column. Pure function of the per-user (fday, lday) rollup ⇒ the
    * streaming twin (q264) feeds the SAME chain from the q211
    * first-seen store (min/max are mergeable — stream == batch BY
    * ALGEBRA). At 100 TB: risk rows are lifetimes ≤ the calendar
    * (grid-bounded), cum_haz_ppb ≤ t_max·10⁹ ≤ 2·10¹³ — BIGINT-safe
    * under [[MaxGridDays]]. */
  def nelsonAalenView(km: DataFrame): DataFrame = {
    val hz = km.select(col("event_type"), col("t_days"), col("n_risk"),
        col("d_churn"))
      .withColumn("hz_ppb", expr(
        "CAST(d_churn AS DECIMAL(38,0)) * 1000000000 DIV n_risk"))
    graft.operators.ScanSum
      .runningSum(hz, "event_type", "t_days", "hz_ppb",
        outCol = "cum_haz_ppb")
      .select(col("event_type"), col("t_days"), col("n_risk"),
        col("d_churn"), col("hz_ppb"), col("cum_haz_ppb"),
        (col("cum_haz_ppb").cast("double") / 1.0e9).as("cum_hazard"))
  }

  val oracleSql: Map[String, String] = Map(
    // q199: identical basket/pair/triple chains, EXISTS sub-pair
    // prunes, the same cross-multiply support verdict.
    "q199_itemsets3" ->
      s"""WITH items AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day,
             event_type
           FROM events),
         nb AS (SELECT CAST(count(*) AS BIGINT) AS n_baskets
                FROM (SELECT DISTINCT user_id, day FROM items)),
         p AS (
           SELECT a.event_type AS x, b.event_type AS y,
             CAST(count(*) AS BIGINT) AS c_xy
           FROM items a JOIN items b
             ON a.user_id = b.user_id AND a.day = b.day
            AND a.event_type < b.event_type
           GROUP BY 1, 2),
         g AS (SELECT x, y FROM p CROSS JOIN nb
               WHERE c_xy * $Asr3MinSupDen >= n_baskets),
         t AS (
           SELECT a.event_type AS x, b.event_type AS y,
             c.event_type AS z, CAST(count(*) AS BIGINT) AS c_xyz
           FROM items a
           JOIN items b ON a.user_id = b.user_id AND a.day = b.day
             AND a.event_type < b.event_type
           JOIN items c ON a.user_id = c.user_id AND a.day = c.day
             AND b.event_type < c.event_type
           GROUP BY 1, 2, 3),
         cand AS (
           SELECT t.* FROM t
           WHERE EXISTS (SELECT 1 FROM g WHERE g.x = t.x AND g.y = t.y)
             AND EXISTS (SELECT 1 FROM g WHERE g.x = t.x AND g.y = t.z)
             AND EXISTS (SELECT 1 FROM g WHERE g.x = t.y AND g.y = t.z))
         SELECT x, y, z, c_xyz, nb.n_baskets,
           c_xyz * $Asr3MinSupDen >= nb.n_baskets AS frequent
         FROM cand CROSS JOIN nb""",

    // q201: the q176 transform CTEs + the identical sample, exact
    // window rank and error rollup.
    "q201_discretizer_audit" ->
      s"""WITH st AS (
           SELECT min(value) AS lo, max(value) AS hi,
             CAST(count(*) AS BIGINT) AS n
           FROM events),
         binned AS (
           SELECT event_id, st.n,
             CASE WHEN st.hi = st.lo THEN 0 ELSE
               least(${DiscBins - 1}, greatest(0,
                 CAST(floor((value - st.lo) / (st.hi - st.lo) * $DiscBins)
                   AS BIGINT))) END AS bin
           FROM events CROSS JOIN st),
         cum AS (
           SELECT bin, CAST(coalesce(sum(cnt) OVER (ORDER BY bin ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS cum_below
           FROM (SELECT bin, count(*) AS cnt FROM binned GROUP BY 1)),
         disc AS (
           SELECT b.event_id,
             CAST(c.cum_below * $DiscMass // b.n AS BIGINT) AS pct_mass
           FROM binned b JOIN cum c USING (bin)),
         samp AS (
           SELECT event_id, value FROM events
           WHERE (instr('0123456789abcdef',
                   substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1) * 16
               + instr('0123456789abcdef',
                   substr(md5(CAST(event_id AS VARCHAR)), 2, 1)) - 1
               < $AuditBuckets),
         exact AS (
           SELECT event_id,
             percent_rank() OVER (ORDER BY value ASC, event_id ASC)
               * $DiscMass AS exact_ppm
           FROM samp),
         err AS (
           SELECT e.exact_ppm - CAST(d.pct_mass AS DOUBLE) AS err
           FROM exact e JOIN disc d USING (event_id))
         SELECT CAST(count(*) AS BIGINT) AS n_sample,
           CAST(round(sum(CAST(abs(err) AS DECIMAL(38,3))), 1) AS DOUBLE)
             / count(*) AS mean_abs_err_ppm,
           max(abs(err)) AS max_abs_err_ppm,
           CAST(sum(CASE WHEN abs(err) <= $AuditTolPpm THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*) AS within_tol_frac
         FROM err""",

    // q183: identical digit route (integer cent string), identical ppm
    // constants (interpolated from the SAME Scala-computed table).
    "q183_benford" -> {
      val cases = BenfordPpm.map { case (dd, p) => s"WHEN $dd THEN $p" }
        .mkString(" ")
      s"""WITH cnt AS (
           SELECT CAST(substring(CAST(CAST(floor(value * 100) AS BIGINT)
               AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             CAST(count(*) AS BIGINT) AS n_d
           FROM events GROUP BY 1),
         tot AS (SELECT CAST(sum(n_d) AS BIGINT) AS n FROM cnt),
         j AS (
           SELECT CAST(r.range AS BIGINT) AS digit,
             coalesce(c.n_d, 0) AS n_d,
             coalesce(c.n_d, 0) * $DiscMass // t.n AS obs_ppm,
             CAST(CASE CAST(r.range AS BIGINT) $cases END AS BIGINT)
               AS exp_ppm,
             t.n
           FROM range(1, 10) r
           LEFT JOIN cnt c ON c.digit = r.range CROSS JOIN tot t)
         SELECT digit, n_d, obs_ppm, exp_ppm,
           abs(obs_ppm - exp_ppm) AS dev_ppm,
           CAST(n_d AS DOUBLE) / n AS share,
           abs(obs_ppm - exp_ppm) >= $BenfordTolPpm AS flagged
         FROM j"""
    },

    // q188: identical arithmetic dow, grid, ppm and cross-multiply gate.
    "q188_seasonality" ->
      s"""WITH cnt AS (
           SELECT event_type,
             (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         grid AS (
           SELECT DISTINCT c.event_type, CAST(r.range AS BIGINT) AS dow
           FROM cnt c CROSS JOIN range(0, 7) r),
         tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total
                 FROM cnt GROUP BY 1),
         j AS (
           SELECT g.event_type, g.dow, coalesce(c.n, 0) AS n, t.total
           FROM grid g LEFT JOIN cnt c
             ON c.event_type = g.event_type AND c.dow = g.dow
           JOIN tot t ON t.event_type = g.event_type)
         SELECT event_type, dow, n, total,
           n * $DiscMass // total AS obs_ppm,
           CAST(${DiscMass / 7} AS BIGINT) AS exp_ppm,
           abs(n * 7 - total) * $SeasonDen >= total * $SeasonNum AS flagged
         FROM j""",

    // q189: identical gap window, HUGEINT mirrors the DECIMAL(38,0)
    // route, identical mass division and bars.
    "q189_burstiness" ->
      s"""WITH g AS (
           SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts) ASC, event_id ASC) AS g
           FROM events),
         a AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(g) AS BIGINT) AS sum_gap,
             sum(CAST(g AS HUGEINT) * CAST(g AS HUGEINT)) AS sum_gap2
           FROM g WHERE g IS NOT NULL GROUP BY 1
           HAVING count(*) >= 2 AND sum(g) > 0),
         m AS (
           SELECT user_id, n_gaps, sum_gap,
             CAST(((CAST(n_gaps AS HUGEINT) * sum_gap2
               - CAST(sum_gap AS HUGEINT) * CAST(sum_gap AS HUGEINT))
               * $CvMass)
               // (CAST(sum_gap AS HUGEINT) * CAST(sum_gap AS HUGEINT))
               AS BIGINT) AS cv2_ppm
           FROM a)
         SELECT user_id, n_gaps, sum_gap, cv2_ppm,
           CASE WHEN cv2_ppm > $BurstyCv2Ppm THEN 'bursty'
                WHEN cv2_ppm < $RegularCv2Ppm THEN 'regular'
                ELSE 'poissonish' END AS label
         FROM m""",

    // q193: q112's chain with the per-stage window bound.
    "q193_windowed_funnel" ->
      s"""WITH s1 AS (
           SELECT user_id, min(epoch_us(ts)) AS t_view
           FROM events WHERE event_type = 'view' GROUP BY 1),
         s2 AS (
           SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
           FROM events e JOIN s1 ON s1.user_id = e.user_id
           WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s1.t_view
             AND epoch_us(e.ts) <= s1.t_view + $FunnelWindowUs
           GROUP BY 1),
         s3 AS (
           SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
           FROM events e JOIN s2 ON s2.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s2.t_click
             AND epoch_us(e.ts) <= s2.t_click + $FunnelWindowUs
           GROUP BY 1)
         SELECT u.user_id,
           CAST(CASE WHEN s3.t_purchase IS NOT NULL THEN 3
                     WHEN s2.t_click IS NOT NULL THEN 2
                     WHEN s1.t_view IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS stage,
           s1.t_view, s2.t_click, s3.t_purchase,
           s3.t_purchase - s1.t_view AS micros_to_convert
         FROM (SELECT DISTINCT user_id FROM events) u
         LEFT JOIN s1 ON s1.user_id = u.user_id
         LEFT JOIN s2 ON s2.user_id = u.user_id
         LEFT JOIN s3 ON s3.user_id = u.user_id""",

    // q184: identical histogram chains, bin-midpoint grid arithmetic
    // (same operand order), MAD gate. min() stands in for Spark's
    // first() on the per-type constants.
    "q184_mad_outliers" ->
      s"""WITH st AS (
           SELECT event_type, min(value) AS lo, max(value) AS hi,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
         b1 AS (
           SELECT e.event_type, st.n,
             CASE WHEN st.hi = st.lo THEN 0 ELSE
               least(${MadBins - 1}, greatest(0,
                 CAST(floor((e.value - st.lo) / (st.hi - st.lo)
                   * $MadBins) AS BIGINT))) END AS bin
           FROM events e JOIN st USING (event_type)),
         c1 AS (
           SELECT event_type, n, bin,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin ASC)
               AS cum
           FROM (SELECT event_type, n, bin, count(*) AS cnt
                 FROM b1 GROUP BY 1, 2, 3)),
         m1 AS (
           SELECT event_type,
             min(CASE WHEN cum * 2 >= n THEN bin END) AS med_bin
           FROM c1 GROUP BY 1),
         med AS (
           SELECT st.event_type, st.n,
             st.lo + (CAST(m1.med_bin AS DOUBLE) + 0.5)
               * (st.hi - st.lo) / ${MadBins.toDouble} AS med,
             greatest(
               st.hi - (st.lo + (CAST(m1.med_bin AS DOUBLE) + 0.5)
                 * (st.hi - st.lo) / ${MadBins.toDouble}),
               (st.lo + (CAST(m1.med_bin AS DOUBLE) + 0.5)
                 * (st.hi - st.lo) / ${MadBins.toDouble}) - st.lo)
               AS max_dev
           FROM st JOIN m1 USING (event_type)),
         d AS (
           SELECT e.event_type, med.n, med.med, med.max_dev,
             abs(e.value - med.med) AS dev
           FROM events e JOIN med USING (event_type)),
         b2 AS (
           SELECT event_type, n,
             CASE WHEN max_dev = 0.0 THEN 0 ELSE
               least(${MadBins - 1}, greatest(0,
                 CAST(floor((dev - 0.0) / (max_dev - 0.0) * $MadBins)
                   AS BIGINT))) END AS bin
           FROM d),
         c2 AS (
           SELECT event_type, n, bin,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin ASC)
               AS cum
           FROM (SELECT event_type, n, bin, count(*) AS cnt
                 FROM b2 GROUP BY 1, 2, 3)),
         m2 AS (
           SELECT event_type,
             min(CASE WHEN cum * 2 >= n THEN bin END) AS mad_bin
           FROM c2 GROUP BY 1),
         mad AS (
           SELECT med.event_type,
             (CAST(m2.mad_bin AS DOUBLE) + 0.5) * med.max_dev
               / ${MadBins.toDouble} AS mad
           FROM med JOIN m2 USING (event_type))
         SELECT d.event_type, CAST(count(*) AS BIGINT) AS n_events,
           min(d.med) AS med, min(mad.mad) AS mad,
           CAST(sum(CASE WHEN d.dev > mad.mad * $MadK THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers,
           CAST(sum(CASE WHEN d.dev > mad.mad * $MadK THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*) AS outlier_frac
         FROM d JOIN mad USING (event_type) GROUP BY 1""",

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(38,6))),2) AS DOUBLE) AS sum_qty,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,6))),2) AS DOUBLE) AS sum_base_price,
         CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))),2) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)/count(*) AS avg_qty,
         CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE)/count(*) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",

    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
         l_extendedprice, l_shipdate
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_discount > 0.08
           AND l_quantity < 10.0""",

    "q03_join_agg" ->
      """SELECT o_orderkey, o_orderdate,
         CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))),2) AS DOUBLE) AS rev
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1999-01-01'
           AND l_shipdate > TIMESTAMP '1997-01-01'
         GROUP BY o_orderkey, o_orderdate""",

    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         GROUP BY o_orderpriority""",

    "q05_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
         FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",

    "q06_star_join" ->
      """SELECT r_name, n_name,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))),2) AS DOUBLE) AS total_rev,
         count(*) AS n_orders
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         JOIN orders ON o_custkey = c_custkey
         GROUP BY r_name, n_name""",

    "q07_scan_agg" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice*l_discount AS DECIMAL(38,6))),2) AS DOUBLE) AS rev,
         count(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07
           AND l_quantity < 24.0""",

    "q08_distinct" ->
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
         count(*) AS n_cust
         FROM customer GROUP BY c_mktsegment""",

    "q09_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) WHERE rn <= 3""",

    "q10_window_running" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend,
         round(coalesce(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate ASC, o_orderkey ASC), 0.0),2) AS prev_price
         FROM orders""",

    "q11_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rf,
         coalesce(l_linestatus,'ALL') AS ls,
         count(*) AS n, round(sum(l_quantity),2) AS qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",

    "q12_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",

    "q13_setops" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""",

    "q14_union_agg" ->
      """SELECT band, count(*) AS n FROM (
           SELECT l_orderkey, 'hi' AS band FROM lineitem WHERE l_quantity >= 40.0
           UNION ALL
           SELECT l_orderkey, 'lo' AS band FROM lineitem WHERE l_quantity <= 5.0)
         GROUP BY band""",

    "q15_range_join" ->
      """SELECT s_suppkey, count(*) AS n_close,
         CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)/count(*) AS avg_bal
         FROM customer JOIN supplier
           ON c_acctbal >= s_acctbal - 50.0 AND c_acctbal <= s_acctbal + 50.0
         GROUP BY s_suppkey""",

    "q16_json" ->
      """SELECT event_type, count(*) AS n,
         avg(CAST(json_extract_string(props, '$.k') AS INT)) AS avg_k,
         CAST(round(sum(CAST(value AS DECIMAL(38,6))),2) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type""",

    "q17_time_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n,
         CAST(round(sum(CAST(value AS DECIMAL(38,6))),2) AS DOUBLE) AS v
         FROM events GROUP BY 1, 2""",

    // integer day buckets mirror unix_micros DIV exactly (both
    // operands positive, floor == trunc)
    "q113_retention" ->
      """WITH ev AS (
           SELECT user_id, event_type,
             epoch_us(ts) // 86400000000 AS day
           FROM events),
         coh AS (SELECT user_id, min(day) AS cohort_day FROM ev
                 WHERE event_type = 'signup' GROUP BY 1),
         act AS (SELECT DISTINCT user_id, day FROM ev)
         SELECT cohort_day, day - cohort_day AS day_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM act JOIN coh USING (user_id)
         WHERE day >= cohort_day GROUP BY 1, 2""",

    // q161: the same lead-bigram / count / floor-mass / argmax chain —
    // integers end-to-end, // matches Spark's DIV on positives.
    "q161_markov" ->
      s"""WITH seq AS (
           SELECT event_type, lead(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
           FROM events),
         big AS (
           SELECT event_type AS prev_type, next_type,
             CAST(count(*) AS BIGINT) AS cnt
           FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
         tot AS (
           SELECT prev_type, CAST(sum(cnt) AS BIGINT) AS row_total
           FROM big GROUP BY 1)
         SELECT b.prev_type, b.next_type, b.cnt, t.row_total,
           CAST(b.cnt * $MarkovMass // t.row_total AS BIGINT) AS p_mass,
           (row_number() OVER (PARTITION BY b.prev_type
              ORDER BY b.cnt DESC, b.next_type ASC)) = 1 AS is_top
         FROM big b JOIN tot t USING (prev_type)""",

    // q175: the same one-window two-model attribution; IGNORE NULLS
    // frames match Spark's ignoreNulls last/first exactly.
    "q175_attribution" -> {
      def model(m: String, c: String): String =
        s"""SELECT '$m' AS model, coalesce($c, 'direct') AS channel,
             CAST(count(*) AS BIGINT) AS n_purchases,
             CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE)
               AS revenue
           FROM p GROUP BY 2"""
      s"""WITH a AS (
           SELECT event_type, value,
             last_value(CASE WHEN event_type IN ('view', 'click')
                 THEN event_type END IGNORE NULLS) OVER w AS lt,
             first_value(CASE WHEN event_type IN ('view', 'click')
                 THEN event_type END IGNORE NULLS) OVER w AS ft
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         p AS (SELECT * FROM a WHERE event_type = 'purchase')
         ${model("last", "lt")}
         UNION ALL ${model("first", "ft")}"""
    },

    // q182: the same RANGE frame over epoch micros, identical bar.
    "q182_burst_detect" ->
      s"""WITH b AS (
           SELECT user_id, count(*) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts)
             RANGE BETWEEN $BurstWindowUs PRECEDING AND CURRENT ROW)
             AS burst
           FROM events)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(burst) AS BIGINT) AS max_burst,
           max(burst) >= $BurstK AS flagged
         FROM b GROUP BY 1""",

    // q181: the same three histogram chains, quantile picks and
    // bin-comparison quartiles — r/f as exact small ints in doubles,
    // m through the identical decimal route.
    "q181_rfm" -> {
      def chain(sfx: String): String =
        s"""st_$sfx AS (
             SELECT min($sfx) AS lo, max($sfx) AS hi,
               CAST(count(*) AS BIGINT) AS n
             FROM users),
           b_$sfx AS (
             SELECT user_id, st.n,
               CASE WHEN st.hi = st.lo THEN 0 ELSE
                 least(${RfmBins - 1}, greatest(0,
                   CAST(floor(($sfx - st.lo) / (st.hi - st.lo) * $RfmBins)
                     AS BIGINT))) END AS bin
             FROM users CROSS JOIN st_$sfx st),
           cc_$sfx AS (
             SELECT bin, n, sum(cnt) OVER (ORDER BY bin ASC) AS cum
             FROM (SELECT bin, n, count(*) AS cnt
                   FROM b_$sfx GROUP BY 1, 2)),
           qs_$sfx AS (
             SELECT min(CASE WHEN cum * 100 >= 25 * n THEN bin END) AS q25,
               min(CASE WHEN cum * 100 >= 50 * n THEN bin END) AS q50,
               min(CASE WHEN cum * 100 >= 75 * n THEN bin END) AS q75
             FROM cc_$sfx),
           a_$sfx AS (
             SELECT user_id, CAST(1
               + CASE WHEN bin > q.q25 THEN 1 ELSE 0 END
               + CASE WHEN bin > q.q50 THEN 1 ELSE 0 END
               + CASE WHEN bin > q.q75 THEN 1 ELSE 0 END AS BIGINT)
               AS ${sfx}_q
             FROM b_$sfx CROSS JOIN qs_$sfx q)"""
      s"""WITH mx AS (
           SELECT max(epoch_us(ts) // 86400000000) AS dmax FROM events),
         users AS (
           SELECT user_id,
             CAST(mx.dmax - max(epoch_us(ts) // 86400000000)
               AS DOUBLE) AS r,
             CAST(count(*) AS DOUBLE) AS f,
             CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS m
           FROM events CROSS JOIN mx GROUP BY user_id, mx.dmax),
         ${chain("r")},
         ${chain("f")},
         ${chain("m")}
         SELECT a_r.r_q, a_f.f_q, a_m.m_q,
           CAST(count(*) AS BIGINT) AS n_users
         FROM a_r JOIN a_f USING (user_id) JOIN a_m USING (user_id)
         GROUP BY 1, 2, 3"""
    },

    // q176: same grid, same bounded running sum, same floor mass.
    "q176_discretize" ->
      s"""WITH st AS (
           SELECT min(value) AS lo, max(value) AS hi,
             CAST(count(*) AS BIGINT) AS n
           FROM events),
         binned AS (
           SELECT event_id, st.n,
             CASE WHEN st.hi = st.lo THEN 0 ELSE
               least(${DiscBins - 1}, greatest(0,
                 CAST(floor((value - st.lo) / (st.hi - st.lo) * $DiscBins)
                   AS BIGINT))) END AS bin
           FROM events CROSS JOIN st),
         cum AS (
           SELECT bin, CAST(coalesce(sum(cnt) OVER (ORDER BY bin ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS cum_below
           FROM (SELECT bin, count(*) AS cnt FROM binned GROUP BY 1))
         SELECT b.event_id, b.bin,
           CAST(c.cum_below * $DiscMass // b.n AS BIGINT) AS pct_mass
         FROM binned b JOIN cum c USING (bin)""",

    // q177: same day-origin scalar, the identical power-of-two decay.
    "q177_decayed_popularity" ->
      s"""WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day
           FROM events),
         mx AS (SELECT max(day) AS dmax FROM daily),
         mass AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN (mx.dmax - day) // $PopHalfLifeDays > 20
               THEN 0 ELSE $PopMass >> CAST((mx.dmax - day)
               // $PopHalfLifeDays AS INT) END) AS BIGINT) AS decayed_mass
           FROM daily CROSS JOIN mx GROUP BY 1),
         tot AS (SELECT CAST(sum(decayed_mass) AS BIGINT) AS t FROM mass)
         SELECT event_type, n_events, decayed_mass,
           CAST(decayed_mass AS DOUBLE) / tot.t AS share
         FROM mass CROSS JOIN tot""",

    // q174: same ladder, identical group-size profiles per level.
    "q174_k_anonymity" -> {
      def lvl(l: Int, desc: String, keys: String): String =
        s"""SELECT CAST($l AS BIGINT) AS level, '$desc' AS qi,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(min(k) AS BIGINT) AS min_k,
             CAST(sum(CASE WHEN k < $KAnonK THEN 1 ELSE 0 END)
               AS BIGINT) AS n_risky_groups,
             CAST(sum(CASE WHEN k < $KAnonK THEN k ELSE 0 END)
               AS BIGINT) AS n_risky_rows,
             CAST(sum(CASE WHEN k < $KAnonK THEN k ELSE 0 END) AS DOUBLE)
               / sum(k) AS risky_frac,
             min(k) >= $KAnonK AS k_anonymous
           FROM (SELECT $keys, count(*) AS k FROM c GROUP BY ALL)"""
      s"""WITH c AS (
           SELECT n.n_regionkey AS region, c_mktsegment,
             CAST(floor(c_acctbal / 2000) AS BIGINT) AS band
           FROM customer JOIN nation n ON n.n_nationkey = c_nationkey)
         ${lvl(0, "region+segment+band", "region, c_mktsegment, band")}
         UNION ALL ${lvl(1, "region+segment", "region, c_mktsegment")}
         UNION ALL ${lvl(2, "region", "region")}"""
    },

    // q169: same rollup, basket join, strict-precedence test, gate
    // and single division.
    "q169_seq_patterns" ->
      s"""WITH tm AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             event_type, min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
           FROM events GROUP BY 1, 2, 3),
         nb AS (
           SELECT CAST(count(*) AS BIGINT) AS n_baskets
           FROM (SELECT DISTINCT user_id, day FROM tm)),
         pairs AS (
           SELECT a.event_type AS x, b.event_type AS y, a.mn, b.mx
           FROM tm a JOIN tm b
             ON a.user_id = b.user_id AND a.day = b.day
             AND a.event_type <> b.event_type),
         sup AS (
           SELECT x, y, CAST(count(*) AS BIGINT) AS support
           FROM pairs WHERE mn < mx GROUP BY 1, 2),
         withboth AS (
           SELECT x, y, CAST(count(*) AS BIGINT) AS n_both
           FROM pairs GROUP BY 1, 2)
         SELECT s.x, s.y, s.support, b.n_both, nb.n_baskets,
           CAST(s.support AS DOUBLE) / b.n_both AS confidence
         FROM sup s JOIN withboth b ON b.x = s.x AND b.y = s.y
         CROSS JOIN nb
         WHERE s.support * $SeqSupDen >= nb.n_baskets""",

    // q166: same distinct projection, parity split and cross-multiply
    // — HUGEINT mirrors the DECIMAL(38,0) routing, booleans exact.
    "q166_ab_test" ->
      s"""WITH ut AS (
           SELECT user_id, event_type, count(*) AS k
           FROM events GROUP BY 1, 2),
         users AS (
           SELECT user_id % 2 AS variant,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n
           FROM ut GROUP BY 1),
         conv AS (
           SELECT event_type, user_id % 2 AS variant,
             CAST(count(*) AS BIGINT) AS c
           FROM ut WHERE k >= $AbConvK GROUP BY 1, 2),
         grid AS (
           SELECT t.event_type, u.variant, u.n
           FROM (SELECT DISTINCT event_type FROM ut) t CROSS JOIN users u),
         wide AS (
           SELECT g.event_type,
             CAST(sum(CASE WHEN g.variant = 0
               THEN coalesce(c.c, 0) END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN g.variant = 0 THEN g.n END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN g.variant = 1
               THEN coalesce(c.c, 0) END) AS BIGINT) AS c2,
             CAST(sum(CASE WHEN g.variant = 1 THEN g.n END) AS BIGINT) AS n2
           FROM grid g LEFT JOIN conv c
             ON c.event_type = g.event_type AND c.variant = g.variant
           GROUP BY 1)
         SELECT event_type, n1, c1, n2, c2,
           CAST(c1 AS DOUBLE) / n1 AS rate1,
           CAST(c2 AS DOUBLE) / n2 AS rate2,
           (CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1) *
             (CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1) *
             (n1 + n2) * $AbZsqDen >
           CAST($AbZsqNum AS HUGEINT) * n1 * n2 * (c1 + c2) *
             (n1 + n2 - c1 - c2) AS significant
         FROM wide""",

    // q165: same bucketing, interleave, block grids and zone-map box
    // test — DuckDB's native >>/<</& mirror Spark's shift functions.
    "q165_zorder" -> {
      val zSql = (0 until ZDimBits).map(i =>
        s"((((ub >> $i) & 1) << ${2 * i}) + (((db >> $i) & 1) << ${2 * i + 1}))")
        .mkString(" + ")
      s"""WITH d0 AS (
           SELECT min(epoch_us(ts) // 86400000000) AS d0 FROM events),
         dims AS (
           SELECT CAST(user_id % 32 AS BIGINT) AS ub,
             CAST(least(epoch_us(ts) // 86400000000 - d0.d0, 31)
               AS BIGINT) AS db
           FROM events CROSS JOIN d0),
         zd AS (SELECT ub, db, CAST($zSql AS BIGINT) AS z FROM dims),
         zb AS (
           SELECT 'zorder' AS layout, z // $ZBlockCells AS block,
             CAST(count(*) AS BIGINT) AS n_rows,
             min(ub) AS u_min, max(ub) AS u_max,
             min(db) AS d_min, max(db) AS d_max
           FROM zd GROUP BY 2),
         lb AS (
           SELECT 'linear' AS layout, ub AS block,
             CAST(count(*) AS BIGINT) AS n_rows,
             min(ub) AS u_min, max(ub) AS u_max,
             min(db) AS d_min, max(db) AS d_max
           FROM zd GROUP BY 2),
         ab AS (SELECT * FROM zb UNION ALL SELECT * FROM lb)
         SELECT layout, block, n_rows, u_min, u_max, d_min, d_max,
           (u_min <= $ZBoxHi AND u_max >= $ZBoxLo AND
            d_min <= $ZBoxHi AND d_max >= $ZBoxLo) AS touched
         FROM ab"""
    },

    // q164: same count/log-bin/summary derivation; bit shifts and the
    // single share division match exactly.
    "q164_key_skew" ->
      """WITH c AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
         bins AS (
           SELECT CAST(length(bin(cnt)) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n_keys_in_bin,
             CAST(sum(cnt) AS BIGINT) AS rows_in_bin
           FROM c GROUP BY 1),
         summ AS (
           SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(cnt) AS BIGINT) AS total_rows,
             CAST(max(cnt) AS BIGINT) AS max_cnt
           FROM c)
         SELECT bin, CAST(1 AS BIGINT) << (bin - 1) AS bin_lo,
           (CAST(1 AS BIGINT) << bin) - 1 AS bin_hi,
           n_keys_in_bin, rows_in_bin, n_keys, total_rows, max_cnt,
           CAST(max_cnt AS DOUBLE) / total_rows AS max_share
         FROM bins CROSS JOIN summ""",

    // q162: the same rollup / prefix-dev / prefix-min / squared-bar
    // chain — HUGEINT squares on the DuckDB side mirror the
    // DECIMAL(38,0) routing, booleans compare exactly.
    "q162_cusum" ->
      s"""WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         tot AS (
           SELECT event_type, CAST(sum(x) AS BIGINT) AS t_total,
             CAST(count(*) AS BIGINT) AS n_days
           FROM daily GROUP BY 1),
         p1 AS (
           SELECT d.event_type, d.day, d.x, t.t_total, t.n_days,
             CAST(sum(d.x * t.n_days - t.t_total) OVER
               (PARTITION BY d.event_type ORDER BY d.day ASC)
               AS BIGINT) AS pd
           FROM daily d JOIN tot t USING (event_type)),
         p2 AS (
           SELECT *, CAST(least(min(pd) OVER
               (PARTITION BY event_type ORDER BY day ASC), 0)
               AS BIGINT) AS smin
           FROM p1)
         SELECT event_type, day, x, t_total, n_days,
           pd - smin AS s_scaled,
           CAST(pd - smin AS HUGEINT) * (pd - smin) >=
             CAST($CusumHsq AS HUGEINT) * t_total * n_days AS alarm
         FROM p2""",

    // q144: the same lag-compress / lead-stitch pipeline; floor(/100)
    // is one double divide on both engines so the band is bit-exact.
    "q144_scd2" ->
      """WITH c AS (
           SELECT user_id, ts, event_id,
             CAST(floor(value / 100) AS BIGINT) AS band,
             lag(CAST(floor(value / 100) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_band
           FROM events),
         ch AS (SELECT user_id, ts, event_id, band FROM c
                WHERE prev_band IS NULL OR band <> prev_band)
         SELECT user_id, ts AS valid_from, lead(ts) OVER w AS valid_to,
           band, CAST(row_number() OVER w AS BIGINT) AS version,
           CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END
                AS BIGINT) AS is_current
         FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",

    // q151: same basket/item/pair derivation; // on positive micros
    // matches Spark's truncating DIV, the support gate is the same
    // integer cross-multiply, and both doubles are the same fixed
    // operand chains over exactly-representable integers.
    "q151_assoc_rules" ->
      s"""WITH items AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day,
             event_type
           FROM events),
         nb AS (SELECT count(*) AS n_baskets
                FROM (SELECT DISTINCT user_id, day FROM items)),
         cx AS (SELECT event_type, count(*) AS c FROM items GROUP BY 1),
         gated AS (
           SELECT p.x, p.y, p.c_xy, nb.n_baskets FROM (
             SELECT a.event_type AS x, b.event_type AS y,
               count(*) AS c_xy
             FROM items a JOIN items b
               ON a.user_id = b.user_id AND a.day = b.day
             WHERE a.event_type < b.event_type
             GROUP BY 1, 2) p
           CROSS JOIN nb
           WHERE p.c_xy * $AsrMinSupDen >= nb.n_baskets),
         rules AS (
           SELECT x, y, c_xy, n_baskets FROM gated
           UNION ALL SELECT y, x, c_xy, n_baskets FROM gated)
         SELECT r.x AS antecedent, r.y AS consequent, r.c_xy,
           cx1.c AS c_x, cx2.c AS c_y, r.n_baskets,
           CAST(r.c_xy AS DOUBLE) / cx1.c AS confidence,
           (CAST(r.c_xy AS DOUBLE) * r.n_baskets) / cx1.c / cx2.c AS lift
         FROM rules r JOIN cx cx1 ON cx1.event_type = r.x
                      JOIN cx cx2 ON cx2.event_type = r.y""",

    // q124: same trailing frame, same cross-multiplied integer z-test.
    // DuckDB's sum(BIGINT) widens to HUGEINT — harmless inside the
    // comparison, CAST back to BIGINT on output so dtypes line up.
    "q124_anomaly" ->
      s"""WITH ev AS (
           SELECT event_id, user_id, event_type, epoch_us(ts) AS t,
             CAST(floor(value * 10000.0) AS BIGINT) AS v
           FROM events),
         win AS (
           SELECT event_id, user_id, event_type, v,
             count(v) OVER w AS n,
             sum(v) OVER w AS sm,
             sum(v * v) OVER w AS s2
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                        ROWS BETWEEN $AnomWin PRECEDING AND 1 PRECEDING))
         SELECT event_id, user_id, event_type, v AS v_scaled,
           CAST(n AS BIGINT) AS win_n,
           CAST((n * v - sm) * (n * v - sm) AS BIGINT) AS zsq_num,
           CAST($AnomZsq * (n * s2 - sm * sm) AS BIGINT) AS zsq_den
         FROM win
         WHERE n >= $AnomMinWin
           AND (n * v - sm) * (n * v - sm) > $AnomZsq * (n * s2 - sm * sm)""",

    // the same three chained user-keyed mins; epoch_us mirrors
    // unix_micros, so every compared value is an integer
    "q112_funnel" ->
      """WITH s1 AS (
           SELECT user_id, min(epoch_us(ts)) AS t_view
           FROM events WHERE event_type = 'view' GROUP BY 1),
         s2 AS (
           SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
           FROM events e JOIN s1 ON s1.user_id = e.user_id
           WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s1.t_view
           GROUP BY 1),
         s3 AS (
           SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
           FROM events e JOIN s2 ON s2.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s2.t_click
           GROUP BY 1)
         SELECT u.user_id,
           CAST(CASE WHEN s3.t_purchase IS NOT NULL THEN 3
                     WHEN s2.t_click IS NOT NULL THEN 2
                     WHEN s1.t_view IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS stage,
           s1.t_view, s2.t_click, s3.t_purchase,
           s3.t_purchase - s1.t_view AS micros_to_convert
         FROM (SELECT DISTINCT user_id FROM events) u
         LEFT JOIN s1 ON s1.user_id = u.user_id
         LEFT JOIN s2 ON s2.user_id = u.user_id
         LEFT JOIN s3 ON s3.user_id = u.user_id""",

    "q18_sessionize" ->
      """SELECT user_id, max(sess_id) AS n_sessions, count(*) AS n_events FROM (
           SELECT user_id, event_id,
             CAST(sum(new_sess) OVER (PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
           FROM (
             SELECT user_id, event_id, ts,
               CASE WHEN prev_ts IS NULL
                    OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_sess
             FROM (
               SELECT user_id, event_id, ts,
                 lag(ts, 1) OVER (PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC) AS prev_ts
               FROM events))) GROUP BY user_id""",

    "q60_session_stats" ->
      """WITH e AS (
           SELECT user_id, event_id, ts, event_type, value,
             epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
         s AS (
           SELECT *, sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                              THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
           FROM e),
         w AS (
           SELECT *, row_number() OVER (PARTITION BY user_id, sess
                                        ORDER BY ts, event_id) AS rn,
             lag(value) OVER (PARTITION BY user_id, sess
                              ORDER BY ts, event_id) AS prev_v
           FROM s)
         SELECT user_id, min(ts) AS sess_start, max(ts) AS sess_end,
           count(*) AS n_events,
           CAST(sum(CASE WHEN value > prev_v THEN 1 ELSE 0 END) AS BIGINT)
             AS n_increasing,
           string_agg(event_type, ',' ORDER BY ts, event_id)
             FILTER (WHERE rn <= 3) AS first_types
         FROM w GROUP BY user_id, sess""",

    // q215: the same lattice via GROUP BY GROUPING SETS.
    "q215_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
           coalesce(o_orderpriority, 'ALL') AS pri,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2)
             AS DOUBLE) AS rev
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
           (o_orderstatus), ())""",

    // q216: identical per-side rollups, full-outer presence classes,
    // decimal ledger.
    "q216_reconcile" ->
      """WITH o AS (
           SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS n_orders,
             sum(CAST(o_totalprice AS DECIMAL(38,6))) AS price
           FROM orders GROUP BY 1),
         l AS (
           SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n_lines,
             sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS gross
           FROM lineitem GROUP BY 1),
         j AS (
           SELECT CASE WHEN o.n_orders IS NOT NULL
                        AND l.n_lines IS NOT NULL THEN 'both'
                       WHEN o.n_orders IS NOT NULL THEN 'order_only'
                       ELSE 'lineitem_only' END AS side,
             coalesce(o.n_orders, 0) AS n_orders,
             coalesce(l.n_lines, 0) AS n_lines,
             coalesce(o.price, 0) AS price,
             coalesce(l.gross, 0) AS gross
           FROM o FULL OUTER JOIN l ON o.k = l.k)
         SELECT side, CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n_orders) AS BIGINT) AS n_orders,
           CAST(sum(n_lines) AS BIGINT) AS n_lines,
           CAST(round(sum(price), 2) AS DOUBLE) AS total_price,
           CAST(round(sum(gross), 2) AS DOUBLE) AS total_gross
         FROM j GROUP BY 1""",

    // q195: the UNION ALL long form of the same melt, identical
    // decimal-routed rollup.
    "q195_unpivot" ->
      """WITH u AS (
           SELECT l_returnflag, 'l_extendedprice' AS measure,
             l_extendedprice AS value FROM lineitem
           UNION ALL
           SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
           UNION ALL
           SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
         SELECT l_returnflag, measure, CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE)
             AS total,
           min(value) AS vmin, max(value) AS vmax
         FROM u GROUP BY 1, 2""",

    // q219: identical grid and re-based x, HUGEINT mirrors the
    // DECIMAL(38,0) sufficient statistics, doubles only at output —
    // slope/intercept are single divisions of the same exact integers.
    "q219_ols_trend" ->
      s"""WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         grid AS (
           SELECT t.event_type, s.d0, s.d0 + r.range AS day
           FROM (SELECT DISTINCT event_type FROM daily) t
           CROSS JOIN span s CROSS JOIN range(0, $MaxGridDays) r
           WHERE $oracleGridWhere),
         terms AS (
           SELECT g.event_type,
             CAST(g.day - g.d0 AS HUGEINT) AS x,
             CAST(coalesce(d.n, 0) AS HUGEINT) AS y
           FROM grid g LEFT JOIN daily d
             ON d.event_type = g.event_type AND d.day = g.day),
         a AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(y) AS BIGINT) AS total,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
           FROM terms GROUP BY 1),
         b AS (
           SELECT event_type, n_days, total,
             n_days * sxy - sx * sy AS num,
             n_days * sxx - sx * sx AS den,
             sy * sxx - sx * sxy AS inum
           FROM a)
         SELECT event_type, n_days, total,
           CASE WHEN den = 0 THEN 0.0
                ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS slope,
           CASE WHEN den = 0 THEN CAST(total AS DOUBLE) / n_days
                ELSE CAST(inum AS DOUBLE) / CAST(den AS DOUBLE) END
             AS intercept,
           num > 0 AS rising
         FROM b""",

    // q233: the INDEPENDENT brute derivation — per-user candidate
    // join, |Δt| rank with the same earlier-side tie order.
    "q233_nearest_asof" ->
      """WITH e AS (
           SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
           FROM events),
         err AS (SELECT event_id, user_id, tus FROM e
                 WHERE event_type = 'error'),
         pur AS (SELECT user_id, tus AS ptus FROM e
                 WHERE event_type = 'purchase'),
         cand AS (
           SELECT l.event_id, l.user_id, l.tus, r.ptus,
             row_number() OVER (PARTITION BY l.event_id
               ORDER BY abs(r.ptus - l.tus), r.ptus) AS rn
           FROM err l JOIN pur r ON r.user_id = l.user_id)
         SELECT event_id, user_id, tus, ptus,
           ptus - tus AS dt_us, ptus <= tus AS matched_backward
         FROM cand WHERE rn = 1""",

    // q224: identical grid; HUGEINT mirrors the cleared-denominator
    // residuals and both quadratic sums; one division per lag.
    "q224_acf" ->
      s"""WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         grid AS (
           SELECT t.event_type, s.d0 + r.range AS day
           FROM (SELECT DISTINCT event_type FROM daily) t
           CROSS JOIN span s CROSS JOIN range(0, $MaxGridDays) r
           WHERE $oracleGridWhere),
         g AS (
           SELECT g.event_type, g.day,
             CAST(coalesce(d.n, 0) AS HUGEINT) AS y
           FROM grid g LEFT JOIN daily d
             ON d.event_type = g.event_type AND d.day = g.day),
         tot AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS nd,
                   sum(y) AS sy FROM g GROUP BY 1),
         cent AS (
           SELECT g.event_type, g.day, t.nd * g.y - t.sy AS e
           FROM g JOIN tot t ON t.event_type = g.event_type),
         c0 AS (SELECT event_type, sum(e * e) AS den
                FROM cent GROUP BY 1),
         nums AS (
           SELECT a.event_type, k.range AS lag, sum(a.e * b.e) AS num
           FROM cent a CROSS JOIN range(1, ${AcfMaxLag + 1}) k
           JOIN cent b ON b.event_type = a.event_type
             AND b.day = a.day + k.range
           GROUP BY 1, 2)
         SELECT n.event_type, CAST(n.lag AS BIGINT) AS lag,
           CASE WHEN c.den = 0 THEN 0.0
                ELSE CAST(n.num AS DOUBLE) / CAST(c.den AS DOUBLE) END AS r,
           n.num > 0 AS positive_memory
         FROM nums n JOIN c0 c ON c.event_type = n.event_type""",

    // q222: identical group counts, cumulated by an ORDER BY value
    // window (rows are unique per (type, value), so the frame is
    // unambiguous); HUGEINT mirrors the cross-multiplied gap.
    "q222_ks_audit" ->
      """WITH e AS (
           SELECT event_type, value,
             (epoch_us(ts) // 86400000000 + 4) % 7 >= 5 AS we
           FROM events),
         cnt AS (
           SELECT event_type, value,
             CAST(count(*) FILTER (we) AS BIGINT) AS cwe,
             CAST(count(*) FILTER (NOT we) AS BIGINT) AS cwd
           FROM e GROUP BY 1, 2),
         tot AS (SELECT event_type, CAST(sum(cwe) AS BIGINT) AS nwe,
                   CAST(sum(cwd) AS BIGINT) AS nwd
                 FROM cnt GROUP BY 1),
         c AS (
           SELECT event_type,
             sum(cwe) OVER w AS cum_we, sum(cwd) OVER w AS cum_wd
           FROM cnt
           WINDOW w AS (PARTITION BY event_type ORDER BY value
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         g AS (
           SELECT c.event_type, t.nwe, t.nwd,
             abs(CAST(c.cum_we AS HUGEINT) * t.nwd
               - CAST(c.cum_wd AS HUGEINT) * t.nwe) AS gap
           FROM c JOIN tot t ON t.event_type = c.event_type),
         m AS (SELECT event_type, max(nwe) AS n_weekend,
                 max(nwd) AS n_weekday, max(gap) AS dnum
               FROM g GROUP BY 1)
         SELECT event_type, n_weekend, n_weekday,
           CASE WHEN n_weekend = 0 OR n_weekday = 0 THEN 0.0
                ELSE CAST(dnum AS DOUBLE)
                  / CAST(CAST(n_weekend AS HUGEINT) * n_weekday AS DOUBLE)
                END AS d_stat,
           n_weekend > 0 AND n_weekday > 0 AND
             (CASE WHEN n_weekend = 0 OR n_weekday = 0 THEN 0.0
                   ELSE CAST(dnum AS DOUBLE)
                     / CAST(CAST(n_weekend AS HUGEINT) * n_weekday
                         AS DOUBLE) END)
             > 1.358 * sqrt(CAST(n_weekend + n_weekday AS DOUBLE)
                 / (CAST(n_weekend AS DOUBLE) * CAST(n_weekday AS DOUBLE)))
             AS significant
         FROM m""",

    // q223: the INDEPENDENT brute rank — DuckDB sorts the raw values
    // and picks the same explicit k = ceil(p·n) ordinals, so the
    // Spark side's histogram/selection machinery is verified end to
    // end without sharing any of it.
    "q223_exact_quantiles" ->
      """WITH st AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
         r AS (
           SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
               ORDER BY value) AS rn
           FROM events)
         SELECT r.event_type, s.n,
           max(CASE WHEN r.rn = (s.n + 1) // 2 THEN r.value END) AS p50,
           max(CASE WHEN r.rn = (9 * s.n + 9) // 10 THEN r.value END) AS p90
         FROM r JOIN st s ON s.event_type = r.event_type
         GROUP BY 1, 2""",

    // q204: identical grid, the same interpolated integer weight table,
    // HUGEINT mirrors the DECIMAL(38,0) route, double only at output.
    "q204_ewma_trend" -> {
      val wCase = (0 until EwmaK)
        .map(j => s"WHEN $j THEN ${ewmaWeight(j)}").mkString(" ")
      s"""WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         grid AS (
           SELECT t.event_type, s.d0 + r.range AS day
           FROM (SELECT DISTINCT event_type FROM daily) t
           CROSS JOIN span s CROSS JOIN range(0, $MaxGridDays) r
           WHERE $oracleGridWhere),
         terms AS (
           SELECT g.event_type, g.day,
             CAST(d.n AS HUGEINT) *
               CAST((CASE r.range $wCase END) AS HUGEINT) AS term
           FROM grid g CROSS JOIN range(0, $EwmaK) r
           JOIN daily d ON d.event_type = g.event_type
             AND d.day = g.day - r.range),
         mass AS (
           SELECT event_type, day, sum(term) AS mass
           FROM terms GROUP BY 1, 2),
         j AS (
           SELECT g.event_type, g.day, coalesce(d.n, 0) AS n,
             coalesce(m.mass, 0) AS mass
           FROM grid g
           LEFT JOIN daily d ON d.event_type = g.event_type
             AND d.day = g.day
           LEFT JOIN mass m ON m.event_type = g.event_type
             AND m.day = g.day),
         l AS (
           SELECT event_type, day, n, mass,
             lag(mass) OVER (PARTITION BY event_type ORDER BY day ASC)
               AS prev_mass
           FROM j)
         SELECT event_type, day, n, CAST(mass AS DOUBLE) AS ewma_mass,
           CASE WHEN prev_mass IS NULL THEN FALSE
                ELSE mass > prev_mass END AS rising
         FROM l"""
    },

    // q208: identical 256-bin histogram, bin-bracket cross-multiply
    // percentiles, the same IEEE edge expression and decimal means.
    "q208_winsor_stats" ->
      s"""WITH st AS (
           SELECT event_type, min(value) AS lo, max(value) AS hi,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
         b AS (
           SELECT e.event_type, e.value, s.lo, s.hi, s.n,
             CASE WHEN s.hi = s.lo THEN 0
                  ELSE least(${DiscBins - 1}, greatest(0,
                    CAST(floor((e.value - s.lo) / (s.hi - s.lo)
                      * $DiscBins) AS BIGINT)))
             END AS bin
           FROM events e JOIN st s ON s.event_type = e.event_type),
         cum AS (
           SELECT event_type, n, bin, count(*) AS cnt,
             sum(count(*)) OVER (PARTITION BY event_type
               ORDER BY bin ASC) AS cum
           FROM b GROUP BY event_type, n, bin),
         qs AS (
           SELECT event_type,
             min(CASE WHEN cum * 100 >= n * $WinsorLoPct THEN bin END)
               AS b_lo,
             min(CASE WHEN cum * 100 >= n * $WinsorHiPct THEN bin END)
               AS b_hi
           FROM cum GROUP BY 1),
         e2 AS (
           SELECT b.event_type, b.n, b.value,
             b.lo + CAST(q.b_lo AS DOUBLE) * (b.hi - b.lo) / $DiscBins
               AS lo_edge,
             b.lo + CAST(q.b_hi + 1 AS DOUBLE) * (b.hi - b.lo) / $DiscBins
               AS hi_edge
           FROM b JOIN qs q ON q.event_type = b.event_type)
         SELECT event_type, n, min(lo_edge) AS p05_edge,
           min(hi_edge) AS p95_edge,
           CAST(sum(CASE WHEN value < lo_edge THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clip_lo,
           CAST(sum(CASE WHEN value > hi_edge THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clip_hi,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / n
             AS mean_raw,
           CAST(sum(CAST(least(greatest(value, lo_edge), hi_edge)
             AS DECIMAL(38,6))) AS DOUBLE) / n AS mean_winsor
         FROM e2 GROUP BY event_type, n""",

    // q209: the q60 ordered string_agg idiom over the same rn ≤ 3 cut.
    "q209_session_paths" ->
      """WITH r AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             event_type, ts, event_id,
             row_number() OVER (
               PARTITION BY user_id, epoch_us(ts) // 86400000000
               ORDER BY ts ASC, event_id ASC) AS rn
           FROM events),
         p AS (
           SELECT string_agg(event_type, '>' ORDER BY ts ASC,
             event_id ASC) AS path
           FROM r WHERE rn <= 3 GROUP BY user_id, day),
         c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
               FROM p GROUP BY 1)
         SELECT path, n_sessions,
           CAST(rank() OVER (ORDER BY n_sessions DESC, path ASC)
             AS BIGINT) AS rnk,
           rank() OVER (ORDER BY n_sessions DESC, path ASC) <= 10
             AS is_top10
         FROM c""",

    // q210: the INDEPENDENT quadratic derivation — explode every
    // (grid day × prior event) and count distinct per cell; the Spark
    // plan's first-seen identity must reproduce it exactly.
    "q210_cumulative_distinct" ->
      s"""WITH e AS (
           SELECT event_type, user_id,
             epoch_us(ts) // 86400000000 AS day
           FROM events),
         f0 AS (SELECT event_type, user_id, min(day) AS day
                FROM e GROUP BY 1, 2),
         fs AS (SELECT event_type, day,
             CAST(count(*) AS BIGINT) AS new_users
           FROM f0 GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
         grid AS (
           SELECT t.event_type, s.d0 + r.range AS day
           FROM (SELECT DISTINCT event_type FROM e) t
           CROSS JOIN span s CROSS JOIN range(0, $MaxGridDays) r
           WHERE $oracleGridWhere),
         j AS (SELECT g.event_type, g.day, e2.user_id
               FROM grid g LEFT JOIN e e2
                 ON e2.event_type = g.event_type AND e2.day <= g.day)
         SELECT j.event_type, j.day,
           coalesce(f.new_users, 0) AS new_users,
           CAST(count(DISTINCT j.user_id) AS BIGINT) AS cum_users
         FROM j LEFT JOIN fs f ON f.event_type = j.event_type
           AND f.day = j.day
         GROUP BY j.event_type, j.day, f.new_users""",

    "q49_pivot" ->
      """SELECT o_orderpriority,
         count(*) FILTER (o_orderstatus = 'F') AS n_f,
         count(*) FILTER (o_orderstatus = 'O') AS n_o,
         count(*) FILTER (o_orderstatus = 'P') AS n_p
         FROM orders GROUP BY o_orderpriority""",

    "q50_minmax_by" ->
      """SELECT c_mktsegment,
         min_by(c_custkey, CAST(floor(c_acctbal*100) AS BIGINT)*10000000 + c_custkey) AS poorest,
         max_by(c_custkey, CAST(floor(c_acctbal*100) AS BIGINT)*10000000 + c_custkey) AS richest
         FROM customer GROUP BY c_mktsegment""",

    "q44_cube" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS st,
         coalesce(o_orderpriority,'ALL') AS pri,
         count(*) AS n,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))),2) AS DOUBLE) AS rev
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",

    "q19_asof_join" ->
      """SELECT p.event_id AS event_id, p.user_id AS user_id, p.ts AS ts,
         c.ts AS click_ts
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id AND p.ts >= c.ts""",

    "q51_interval_join" ->
      """SELECT l_returnflag, o_orderpriority, count(*) AS n_pairs,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,6))),2) AS DOUBLE) AS sum_price
         FROM lineitem JOIN orders
           ON l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 2 DAY
         WHERE l_quantity > 49.0
         GROUP BY l_returnflag, o_orderpriority""",

    // q235: identical (type, value) group counts and midrank algebra —
    // the cumulative combined count via an ORDER BY value window (rows
    // unique per (type, value)); HUGEINT mirrors the doubled rank-sum
    // and the tie term; u/z/flag are the same IEEE chain.
    "q235_mwu_audit" ->
      """WITH e AS (
           SELECT event_type, value,
             (epoch_us(ts) // 86400000000 + 4) % 7 >= 5 AS we
           FROM events),
         cnt AS (
           SELECT event_type, value,
             CAST(count(*) FILTER (we) AS BIGINT) AS cwe,
             CAST(count(*) FILTER (NOT we) AS BIGINT) AS cwd,
             CAST(count(*) AS BIGINT) AS c
           FROM e GROUP BY 1, 2),
         tot AS (
           SELECT event_type, CAST(sum(cwe) AS BIGINT) AS nwe,
             CAST(sum(cwd) AS BIGINT) AS nwd,
             sum(CAST(c AS HUGEINT) * c * c - c) AS tie_t
           FROM cnt GROUP BY 1),
         cum AS (
           SELECT event_type, cwe, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
           FROM cnt),
         r AS (
           SELECT event_type,
             sum(CAST(cwe AS HUGEINT) * (2 * (cumc - c) + c + 1)) AS r2
           FROM cum GROUP BY 1),
         s AS (
           SELECT r.event_type, t.nwe, t.nwd, t.nwe + t.nwd AS nn,
             r.r2 - CAST(t.nwe AS HUGEINT) * (t.nwe + 1) AS u2, t.tie_t
           FROM r JOIN tot t ON t.event_type = r.event_type),
         v AS (
           SELECT event_type, nwe, nwd,
             CAST(u2 AS DOUBLE) / 2.0 AS u,
             CAST(nwe AS DOUBLE) * CAST(nwd AS DOUBLE) / 2.0 AS mu,
             CAST(nwe AS DOUBLE) * CAST(nwd AS DOUBLE) / 12.0 *
               ((CAST(nn AS DOUBLE) + 1.0) - CAST(tie_t AS DOUBLE) /
                 (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))) AS var_u
           FROM s)
         SELECT event_type, nwe AS n_weekend, nwd AS n_weekday, u,
           CASE WHEN nwe = 0 OR nwd = 0 OR NOT (var_u > 0.0) THEN 0.0
                ELSE (u - mu) / sqrt(var_u) END AS z,
           abs(CASE WHEN nwe = 0 OR nwd = 0 OR NOT (var_u > 0.0) THEN 0.0
                ELSE (u - mu) / sqrt(var_u) END) > 1.96 AS significant
         FROM v""",

    // q236: identical grid; the pair table is the same calendar²-
    // bounded self-join; S, n and the tie sum stay BIGINT (calendar-
    // capped); z is the same S∓1 continuity-corrected IEEE chain.
    "q236_mann_kendall" ->
      s"""WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         grid AS (
           SELECT t.event_type, s.d0 + r.range AS day
           FROM (SELECT DISTINCT event_type FROM daily) t
           CROSS JOIN span s CROSS JOIN range(0, $MaxGridDays) r
           WHERE $oracleGridWhere),
         g AS (
           SELECT g.event_type, g.day,
             CAST(coalesce(d.n, 0) AS BIGINT) AS y
           FROM grid g LEFT JOIN daily d
             ON d.event_type = g.event_type AND d.day = g.day),
         s AS (
           SELECT a.event_type,
             CAST(sum(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
           FROM g a JOIN g b
             ON b.event_type = a.event_type AND a.day < b.day
           GROUP BY 1),
         nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
                FROM g GROUP BY 1),
         ties AS (
           SELECT event_type,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_sum
           FROM (SELECT event_type, y, CAST(count(*) AS BIGINT) AS t
                 FROM g GROUP BY 1, 2) GROUP BY 1),
         v AS (
           SELECT s.event_type, nd.n_days, s.s_stat,
             nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5) - t.tie_sum
               AS var18
           FROM s JOIN nd ON nd.event_type = s.event_type
           JOIN ties t ON t.event_type = s.event_type)
         SELECT event_type, n_days, s_stat,
           CAST(var18 AS DOUBLE) / 18.0 AS var_s,
           CASE WHEN var18 = 0 THEN 0.0
                WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
                  / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
                  / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                ELSE 0.0 END AS z,
           abs(CASE WHEN var18 = 0 THEN 0.0
                WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
                  / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
                  / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                ELSE 0.0 END) > 1.96 AS trending,
           CASE WHEN s_stat > 0 THEN 'up' WHEN s_stat < 0 THEN 'down'
                ELSE 'flat' END AS direction
         FROM v""",

    // q237: identical pair slopes (one IEEE division of the same
    // exact integers); the lower-median ordinal's VALUE is tie-order-
    // free, so row_number in any slope order is a faithful mirror of
    // the ScanSum running count.
    "q237_sen_slope" ->
      s"""WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         grid AS (
           SELECT t.event_type, s.d0 + r.range AS day
           FROM (SELECT DISTINCT event_type FROM daily) t
           CROSS JOIN span s CROSS JOIN range(0, $MaxGridDays) r
           WHERE $oracleGridWhere),
         g AS (
           SELECT g.event_type, g.day,
             CAST(coalesce(d.n, 0) AS BIGINT) AS y
           FROM grid g LEFT JOIN daily d
             ON d.event_type = g.event_type AND d.day = g.day),
         p AS (
           SELECT a.event_type,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
               AS slope
           FROM g a JOIN g b
             ON b.event_type = a.event_type AND a.day < b.day),
         m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs
               FROM p GROUP BY 1),
         r AS (
           SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type ORDER BY slope)
               AS rk
           FROM p)
         SELECT r.event_type, m.n_pairs, r.slope AS sen_slope
         FROM r JOIN m ON m.event_type = r.event_type
         WHERE r.rk = (m.n_pairs + 1) // 2""",

    // q238: identical (type, user) pre/post rollup and variant split;
    // HUGEINT mirrors the five sufficient statistics; theta/deltas/ρ²
    // are the same IEEE chains (ρ² multiplies as doubles AFTER the
    // exact numerator on both sides).
    "q238_cuped" ->
      """WITH ev AS (
           SELECT event_type, user_id,
             epoch_us(ts) // 86400000000 AS day
           FROM events),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
         ux AS (
           SELECT event_type, user_id,
             CAST(count(*) FILTER (day < d0 + (d1 - d0 + 1) // 2)
               AS BIGINT) AS x,
             CAST(count(*) FILTER (day >= d0 + (d1 - d0 + 1) // 2)
               AS BIGINT) AS y,
             user_id % 2 AS v
           FROM ev CROSS JOIN span GROUP BY 1, 2, d0, d1),
         pooled AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM ux GROUP BY 1),
         pq AS (
           SELECT event_type, n, n * sxy - sx * sy AS num,
             n * sxx - sx * sx AS denx, n * syy - sy * sy AS deny
           FROM pooled),
         byv AS (
           SELECT event_type,
             CAST(count(*) FILTER (v = 0) AS BIGINT) AS n0,
             CAST(count(*) FILTER (v = 1) AS BIGINT) AS n1,
             CAST(coalesce(sum(x) FILTER (v = 0), 0) AS BIGINT) AS sx0,
             CAST(coalesce(sum(x) FILTER (v = 1), 0) AS BIGINT) AS sx1,
             CAST(coalesce(sum(y) FILTER (v = 0), 0) AS BIGINT) AS sy0,
             CAST(coalesce(sum(y) FILTER (v = 1), 0) AS BIGINT) AS sy1
           FROM ux GROUP BY 1),
         j AS (
           SELECT p.event_type, p.n, b.n0, b.n1,
             CASE WHEN p.denx = 0 THEN 0.0
                  ELSE CAST(p.num AS DOUBLE) / CAST(p.denx AS DOUBLE) END
               AS theta,
             CASE WHEN b.n0 = 0 OR b.n1 = 0 THEN 0.0
                  ELSE CAST(b.sy1 AS DOUBLE) / CAST(b.n1 AS DOUBLE)
                     - CAST(b.sy0 AS DOUBLE) / CAST(b.n0 AS DOUBLE) END
               AS diff_raw,
             b.sx0, b.sx1, p.num, p.denx, p.deny
           FROM pq p JOIN byv b ON b.event_type = p.event_type)
         SELECT event_type, n AS n_users, n0, n1, theta, diff_raw,
           CASE WHEN n0 = 0 OR n1 = 0 THEN 0.0
                ELSE diff_raw - theta *
                  (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)) END
             AS diff_adj,
           CASE WHEN denx = 0 OR deny = 0 THEN 0.0
                ELSE CAST(num AS DOUBLE) * CAST(num AS DOUBLE) /
                  (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)) END
             AS var_reduction
         FROM j""",

    // q239: identical lifetimes/censor rule; the risk set is the same
    // prefix count (an ORDER BY t window — rows unique per (type, t));
    // ln terms rounded to ppb integers the same way, summed exactly;
    // survival = exp of the shared integer.
    "q239_survival" ->
      s"""WITH ev AS (
           SELECT event_type, user_id,
             epoch_us(ts) // 86400000000 AS day
           FROM events),
         dm AS (SELECT max(day) AS d1 FROM ev),
         pu AS (
           SELECT event_type, user_id, min(day) AS fday, max(day) AS lday
           FROM ev GROUP BY 1, 2),
         pc AS (
           SELECT p.event_type, p.lday - p.fday AS t,
             p.lday <= d.d1 - $KmCensorDays AS churned
           FROM pu p CROSS JOIN dm d),
         dur AS (
           SELECT event_type, t, CAST(count(*) AS BIGINT) AS ct,
             CAST(count(*) FILTER (churned) AS BIGINT) AS d
           FROM pc GROUP BY 1, 2),
         ntot AS (SELECT event_type, CAST(sum(ct) AS BIGINT) AS n_users
                  FROM dur GROUP BY 1),
         r AS (
           SELECT du.event_type, du.t, du.ct, du.d,
             CAST(n.n_users - (sum(du.ct) OVER w - du.ct) AS BIGINT)
               AS n_risk
           FROM dur du JOIN ntot n ON n.event_type = du.event_type
           WINDOW w AS (PARTITION BY du.event_type ORDER BY du.t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         l AS (
           SELECT *, CASE WHEN d = 0 OR n_risk = d THEN 0
             ELSE CAST(CAST(ln(CAST(n_risk - d AS DOUBLE)
               / CAST(n_risk AS DOUBLE)) AS DECIMAL(20,9))
               * 1000000000 AS BIGINT) END AS ln_ppb
           FROM r),
         c AS (
           SELECT *, CAST(sum(ln_ppb) OVER (PARTITION BY event_type
             ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS ln_surv_ppb
           FROM l)
         SELECT event_type, t AS t_days, n_risk, d AS d_churn,
           ct - d AS n_censored, ln_surv_ppb,
           CASE WHEN n_risk = d THEN 0.0
                ELSE exp(CAST(ln_surv_ppb AS DOUBLE) / 1.0e9) END
             AS survival
         FROM c""",

    // q249: the INDEPENDENT brute derivation — per-user candidate
    // join, max prior click inside the window, LEFT JOIN keeps the
    // unmatched errors with nulls.
    "q249_tolerant_asof" ->
      s"""WITH e AS (
           SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
           FROM events),
         err AS (SELECT event_id, user_id, tus FROM e
                 WHERE event_type = 'error'),
         clk AS (SELECT user_id, tus AS ctus FROM e
                 WHERE event_type = 'click'),
         best AS (
           SELECT l.event_id, max(r.ctus) AS m
           FROM err l JOIN clk r
             ON r.user_id = l.user_id AND r.ctus <= l.tus
            AND l.tus - r.ctus <= $AsOfToleranceUs
           GROUP BY 1)
         SELECT l.event_id, l.user_id, l.tus, b.m AS ctus,
           b.m IS NOT NULL AS matched, l.tus - b.m AS age_us
         FROM err l LEFT JOIN best b ON b.event_id = l.event_id""",

    // q252: the q239 CTE chain (identical lifetimes/censor/ppb-ln
    // rounding) + the q219 OLS closed form over (t, ln_surv_ppb);
    // HUGEINT statistics, the same λ/half-life IEEE chain.
    "q252_churn_halflife" ->
      s"""WITH ev AS (
           SELECT event_type, user_id,
             epoch_us(ts) // 86400000000 AS day
           FROM events),
         dm AS (SELECT max(day) AS d1 FROM ev),
         pu AS (
           SELECT event_type, user_id, min(day) AS fday, max(day) AS lday
           FROM ev GROUP BY 1, 2),
         pc AS (
           SELECT p.event_type, p.lday - p.fday AS t,
             p.lday <= d.d1 - $KmCensorDays AS churned
           FROM pu p CROSS JOIN dm d),
         dur AS (
           SELECT event_type, t, CAST(count(*) AS BIGINT) AS ct,
             CAST(count(*) FILTER (churned) AS BIGINT) AS d
           FROM pc GROUP BY 1, 2),
         ntot AS (SELECT event_type, CAST(sum(ct) AS BIGINT) AS n_users
                  FROM dur GROUP BY 1),
         r AS (
           SELECT du.event_type, du.t, du.ct, du.d,
             CAST(n.n_users - (sum(du.ct) OVER w - du.ct) AS BIGINT)
               AS n_risk
           FROM dur du JOIN ntot n ON n.event_type = du.event_type
           WINDOW w AS (PARTITION BY du.event_type ORDER BY du.t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         l AS (
           SELECT *, CASE WHEN d = 0 OR n_risk = d THEN 0
             ELSE CAST(CAST(ln(CAST(n_risk - d AS DOUBLE)
               / CAST(n_risk AS DOUBLE)) AS DECIMAL(20,9))
               * 1000000000 AS BIGINT) END AS ln_ppb
           FROM r),
         c AS (
           SELECT event_type, t AS x,
             CAST(sum(ln_ppb) OVER (PARTITION BY event_type
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS y
           FROM l),
         a AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx
           FROM c GROUP BY 1),
         b AS (
           SELECT event_type, n, n * sxy - sx * sy AS num,
             n * sxx - sx * sx AS den
           FROM a),
         s AS (
           SELECT event_type, n,
             CASE WHEN den = 0 THEN 0.0
                  ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END
               AS slope_ppb
           FROM b),
         z AS (
           SELECT event_type, n, -slope_ppb / 1.0e9 AS lambda_per_day
           FROM s)
         SELECT event_type, n AS n_points, lambda_per_day,
           CASE WHEN lambda_per_day > 0.0
                THEN 0.6931471805599453 / lambda_per_day
                ELSE 0.0 END AS half_life_days,
           lambda_per_day > 0.0 AS decaying
         FROM z""",

    // q256: identical weekend split and value-count table; gt comes
    // from the same strictly-below prefix (a window over the
    // value-count rows — unique per (type, value)); HUGEINT pair
    // counts mirror DECIMAL(38,0); identical δ division + ladder.
    "q256_cliffs_delta" ->
      """WITH ev AS (
           SELECT event_type, value,
             (epoch_us(ts) // 86400000000 + 4) % 7 >= 5 AS we
           FROM events),
         cnt AS (
           SELECT event_type, value,
             CAST(count(*) FILTER (we) AS BIGINT) AS cwe,
             CAST(count(*) FILTER (NOT we) AS BIGINT) AS cwd
           FROM ev GROUP BY 1, 2),
         cum AS (
           SELECT *, CAST(sum(cwd) OVER (PARTITION BY event_type
             ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW) AS BIGINT) AS cumwd
           FROM cnt),
         a AS (
           SELECT event_type,
             CAST(sum(cwe) AS BIGINT) AS n_weekend,
             CAST(sum(cwd) AS BIGINT) AS n_weekday,
             CAST(sum(CAST(cwe AS HUGEINT) * (cumwd - cwd)) AS HUGEINT)
               AS gt,
             CAST(sum(CAST(cwe AS HUGEINT) * cwd) AS HUGEINT) AS eq
           FROM cum GROUP BY 1),
         b AS (
           SELECT *, CAST(n_weekend AS HUGEINT) * n_weekday AS np
           FROM a),
         c AS (
           SELECT *, np - gt - eq AS lt,
             CASE WHEN n_weekend = 0 OR n_weekday = 0 THEN 0.0
                  ELSE CAST(gt - (np - gt - eq) AS DOUBLE)
                     / CAST(np AS DOUBLE) END AS delta
           FROM b)
         SELECT event_type, n_weekend, n_weekday,
           CAST(gt AS DOUBLE) AS n_gt, CAST(lt AS DOUBLE) AS n_lt,
           CAST(eq AS DOUBLE) AS n_eq, delta,
           CASE WHEN abs(delta) < 0.147 THEN 'negligible'
                WHEN abs(delta) < 0.33 THEN 'small'
                WHEN abs(delta) < 0.474 THEN 'medium'
                ELSE 'large' END AS magnitude
         FROM c""",

    // q258: the q239 lifetimes/censor/risk-set chain + the additive
    // hazard tail — increments as the same (d·10⁹) // n integral
    // division (HUGEINT == DECIMAL(38,0) DIV), prefix-summed exactly.
    "q258_nelson_aalen" ->
      s"""WITH ev AS (
           SELECT event_type, user_id,
             epoch_us(ts) // 86400000000 AS day
           FROM events),
         dm AS (SELECT max(day) AS d1 FROM ev),
         pu AS (
           SELECT event_type, user_id, min(day) AS fday, max(day) AS lday
           FROM ev GROUP BY 1, 2),
         pc AS (
           SELECT p.event_type, p.lday - p.fday AS t,
             p.lday <= d.d1 - $KmCensorDays AS churned
           FROM pu p CROSS JOIN dm d),
         dur AS (
           SELECT event_type, t, CAST(count(*) AS BIGINT) AS ct,
             CAST(count(*) FILTER (churned) AS BIGINT) AS d
           FROM pc GROUP BY 1, 2),
         ntot AS (SELECT event_type, CAST(sum(ct) AS BIGINT) AS n_users
                  FROM dur GROUP BY 1),
         r AS (
           SELECT du.event_type, du.t, du.ct, du.d,
             CAST(n.n_users - (sum(du.ct) OVER w - du.ct) AS BIGINT)
               AS n_risk
           FROM dur du JOIN ntot n ON n.event_type = du.event_type
           WINDOW w AS (PARTITION BY du.event_type ORDER BY du.t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         h AS (
           SELECT event_type, t, n_risk, d,
             CAST(CAST(d AS HUGEINT) * 1000000000 // n_risk AS BIGINT)
               AS hz_ppb
           FROM r)
         SELECT event_type, t AS t_days, n_risk, d AS d_churn, hz_ppb,
           CAST(sum(hz_ppb) OVER (PARTITION BY event_type ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_haz_ppb,
           CAST(CAST(sum(hz_ppb) OVER (PARTITION BY event_type ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS DOUBLE) / 1.0e9 AS cum_hazard
         FROM h""",

    // q259: identical per-variant lifetimes/censor rule; risk sets as
    // the same prefix over the zero-filled (variant × lifetime) grid;
    // the hypergeometric E/V terms are the identical IEEE chain over
    // the same exact integers, accumulated through the dsum mirror.
    "q259_logrank" ->
      s"""WITH ev AS (
           SELECT event_type, user_id,
             epoch_us(ts) // 86400000000 AS day
           FROM events),
         dm AS (SELECT max(day) AS d1 FROM ev),
         pu AS (
           SELECT event_type, user_id % 2 AS variant,
             min(day) AS fday, max(day) AS lday
           FROM ev GROUP BY 1, 2, user_id),
         pc AS (
           SELECT p.event_type, p.variant, p.lday - p.fday AS t,
             p.lday <= d.d1 - $KmCensorDays AS churned
           FROM pu p CROSS JOIN dm d),
         dur AS (
           SELECT event_type, variant, t,
             CAST(count(*) AS BIGINT) AS ct,
             CAST(count(*) FILTER (churned) AS BIGINT) AS d
           FROM pc GROUP BY 1, 2, 3),
         grid AS (
           SELECT g.event_type, v.variant, g.t,
             CAST(coalesce(du.ct, 0) AS BIGINT) AS ct,
             CAST(coalesce(du.d, 0) AS BIGINT) AS d
           FROM (SELECT DISTINCT event_type, t FROM dur) g
           CROSS JOIN (SELECT unnest([0, 1]) AS variant) v
           LEFT JOIN dur du ON du.event_type = g.event_type
             AND du.variant = v.variant AND du.t = g.t),
         ntot AS (
           SELECT event_type, variant, CAST(sum(ct) AS BIGINT) AS n_users
           FROM dur GROUP BY 1, 2),
         r AS (
           SELECT g.event_type, g.variant, g.t, g.ct, g.d,
             CAST(coalesce(n.n_users, 0)
               - (sum(g.ct) OVER w - g.ct) AS BIGINT) AS n_risk
           FROM grid g LEFT JOIN ntot n
             ON n.event_type = g.event_type AND n.variant = g.variant
           WINDOW w AS (PARTITION BY g.event_type, g.variant ORDER BY g.t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         bt AS (
           SELECT event_type, t,
             CAST(sum(CASE WHEN variant = 1 THEN n_risk ELSE 0 END)
               AS BIGINT) AS n1,
             CAST(sum(CASE WHEN variant = 0 THEN n_risk ELSE 0 END)
               AS BIGINT) AS n0,
             CAST(sum(CASE WHEN variant = 1 THEN d ELSE 0 END)
               AS BIGINT) AS d1,
             CAST(sum(CASE WHEN variant = 0 THEN d ELSE 0 END)
               AS BIGINT) AS d0
           FROM r GROUP BY 1, 2),
         ft AS (
           SELECT *, n0 + n1 AS nt, d0 + d1 AS dt FROM bt
           WHERE d0 + d1 > 0),
         a AS (
           SELECT event_type, CAST(sum(d1) AS BIGINT) AS o1,
             CAST(sum(CAST(CAST(dt AS DOUBLE) * CAST(n1 AS DOUBLE)
               / CAST(nt AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS e1,
             CAST(sum(CAST(CASE WHEN nt > 1 THEN
               CAST(dt AS DOUBLE) * CAST(n1 AS DOUBLE)
                 * CAST(n0 AS DOUBLE) * CAST(nt - dt AS DOUBLE)
                 / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)
                   * CAST(nt - 1 AS DOUBLE))
               ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE) AS var_lr
           FROM ft GROUP BY 1),
         z AS (
           SELECT event_type, o1, e1, var_lr,
             CASE WHEN var_lr > 0.0
               THEN (CAST(o1 AS DOUBLE) - e1) / sqrt(var_lr)
               ELSE 0.0 END AS z
           FROM a)
         SELECT event_type, o1 AS observed_1, e1 AS expected_1, var_lr,
           z, abs(z) > 1.96 AS significant
         FROM z""",

    // q260: identical zero-filled grid + pair join; C/D/tie counts
    // BIGINT exact; the same doubled-total radicand and 2S/√den4
    // division.
    "q260_kendall_tau" ->
      s"""WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         grid AS (
           SELECT t.event_type, s.d0 + r.range AS day
           FROM (SELECT DISTINCT event_type FROM daily) t
           CROSS JOIN span s CROSS JOIN range(0, $MaxGridDays) r
           WHERE $oracleGridWhere),
         g AS (
           SELECT g.event_type, g.day,
             CAST(coalesce(d.n, 0) AS BIGINT) AS y
           FROM grid g LEFT JOIN daily d
             ON d.event_type = g.event_type AND d.day = g.day),
         p AS (
           SELECT a.event_type,
             CAST(sum(CASE WHEN b.y > a.y THEN 1 ELSE 0 END) AS BIGINT)
               AS concordant,
             CAST(sum(CASE WHEN b.y < a.y THEN 1 ELSE 0 END) AS BIGINT)
               AS discordant
           FROM g a JOIN g b
             ON b.event_type = a.event_type AND a.day < b.day
           GROUP BY 1),
         nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
                FROM g GROUP BY 1),
         ties AS (
           SELECT event_type, CAST(sum(t * (t - 1)) AS BIGINT) AS tie2
           FROM (SELECT event_type, y, CAST(count(*) AS BIGINT) AS t
                 FROM g GROUP BY 1, 2) GROUP BY 1),
         f AS (
           SELECT p.event_type, nd.n_days, p.concordant, p.discordant,
             p.concordant - p.discordant AS s_stat,
             nd.n_days * (nd.n_days - 1) AS n0x2, t.tie2
           FROM p JOIN nd ON nd.event_type = p.event_type
           JOIN ties t ON t.event_type = p.event_type)
         SELECT event_type, n_days, concordant, discordant, s_stat,
           CASE WHEN (n0x2 - tie2) * n0x2 > 0
             THEN CAST(s_stat AS DOUBLE) * 2.0
               / sqrt(CAST((n0x2 - tie2) * n0x2 AS DOUBLE))
             ELSE 0.0 END AS tau_b
         FROM f""",

    // q261: identical cents route and variant split; HUGEINT
    // sufficient statistics; the same cleared-numerator pooled
    // variance, d, J-correction and ladder IEEE chain.
    "q261_cohens_d" ->
      """WITH ev AS (
           SELECT event_type, user_id % 2 AS variant,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events),
         st AS (
           SELECT event_type, variant, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS sc,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS scc
           FROM ev GROUP BY 1, 2),
         nv AS (SELECT *, n * scc - sc * sc AS nv_num FROM st),
         p AS (
           SELECT event_type,
             CAST(sum(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n1,
             max(CASE WHEN variant = 0 THEN sc END) AS s0,
             max(CASE WHEN variant = 1 THEN sc END) AS s1,
             max(CASE WHEN variant = 0 THEN nv_num END) AS q0,
             max(CASE WHEN variant = 1 THEN nv_num END) AS q1
           FROM nv GROUP BY 1),
         m AS (
           SELECT *, CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS mean0,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean1,
             (CAST(q0 AS DOUBLE) / CAST(n0 AS DOUBLE)
              + CAST(q1 AS DOUBLE) / CAST(n1 AS DOUBLE))
               / CAST(n0 + n1 - 2 AS DOUBLE) AS sp2
           FROM p),
         dd AS (
           SELECT *, CASE WHEN n0 > 0 AND n1 > 0 AND n0 + n1 > 2
               AND sp2 > 0.0
             THEN (mean1 - mean0) / sqrt(sp2) ELSE 0.0 END AS cohens_d
           FROM m)
         SELECT event_type, n0, n1, mean0 AS mean0_cents,
           mean1 AS mean1_cents, cohens_d,
           cohens_d * (1.0 - 3.0 / CAST((n0 + n1) * 4 - 9 AS DOUBLE))
             AS hedges_g,
           CASE WHEN abs(cohens_d) < 0.2 THEN 'negligible'
                WHEN abs(cohens_d) < 0.5 THEN 'small'
                WHEN abs(cohens_d) < 0.8 THEN 'medium'
                ELSE 'large' END AS magnitude
         FROM dd""",

    // q269: identical per-variant exact sufficient statistics
    // (HUGEINT cleared numerators, n·(n−1) HUGEINT), the same
    // per-variant variance division, se legs, t, and Satterthwaite df
    // IEEE chain.
    "q269_welch_t" ->
      """WITH ev AS (
           SELECT event_type, user_id % 2 AS variant,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events),
         st AS (
           SELECT event_type, variant, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS sc,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS scc
           FROM ev GROUP BY 1, 2),
         nv AS (
           SELECT *, n * scc - sc * sc AS nv_num,
             CAST(n AS HUGEINT) * (n - 1) AS nn1
           FROM st),
         p AS (
           SELECT event_type,
             CAST(sum(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n1,
             max(CASE WHEN variant = 0 THEN sc END) AS s0,
             max(CASE WHEN variant = 1 THEN sc END) AS s1,
             max(CASE WHEN variant = 0 THEN nv_num END) AS q0,
             max(CASE WHEN variant = 1 THEN nv_num END) AS q1,
             max(CASE WHEN variant = 0 THEN nn1 END) AS m0,
             max(CASE WHEN variant = 1 THEN nn1 END) AS m1
           FROM nv GROUP BY 1),
         m AS (
           SELECT *, CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS mean0,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean1,
             CAST(q0 AS DOUBLE) / CAST(m0 AS DOUBLE) AS v0,
             CAST(q1 AS DOUBLE) / CAST(m1 AS DOUBLE) AS v1
           FROM p),
         se AS (
           SELECT *, v0 / CAST(n0 AS DOUBLE) AS se0,
             v1 / CAST(n1 AS DOUBLE) AS se1,
             v0 / CAST(n0 AS DOUBLE) + v1 / CAST(n1 AS DOUBLE) AS se2
           FROM m),
         t AS (
           SELECT *, CASE WHEN n0 > 1 AND n1 > 1 AND se2 > 0.0
               THEN (mean1 - mean0) / sqrt(se2) ELSE 0.0 END AS t_welch,
             CASE WHEN n0 > 1 AND n1 > 1 AND se2 > 0.0
               THEN se2 * se2 / (se0 * se0 / CAST(n0 - 1 AS DOUBLE)
                 + se1 * se1 / CAST(n1 - 1 AS DOUBLE))
               ELSE 0.0 END AS df_welch
           FROM se)
         SELECT event_type, n0, n1, mean0 AS mean0_cents,
           mean1 AS mean1_cents, v0 AS var0, v1 AS var1, t_welch,
           df_welch, abs(t_welch) > 1.96 AS significant
         FROM t""",

    // q270: identical per-type exact sufficient statistics, the dsum
    // mirror for Σ S²/n, the same SS decomposition / F / ladder-lookup
    // chain (list_extract OOB → NULL == the Spark guard's NULL).
    "q270_anova_f" ->
      s"""WITH ev AS (
           SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events),
         st AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS sc,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS scc
           FROM ev GROUP BY 1),
         a AS (
           SELECT CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n) AS BIGINT) AS n_total,
             CAST(sum(sc) AS HUGEINT) AS t,
             CAST(sum(scc) AS HUGEINT) AS qtot,
             CAST(sum(CAST(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
               / CAST(n AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS b
           FROM st),
         f AS (
           SELECT *, CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
               / CAST(n_total AS DOUBLE) AS tt,
             n_groups - 1 AS df1
           FROM a),
         g AS (
           SELECT n_groups, n_total, b - tt AS ss_between,
             CAST(qtot AS DOUBLE) - b AS ss_within, df1
           FROM f),
         h AS (
           SELECT *, CASE WHEN df1 >= 1 AND n_total > n_groups
               AND ss_within > 0.0
             THEN (ss_between / CAST(df1 AS DOUBLE))
               / (ss_within / CAST(n_total - n_groups AS DOUBLE))
             ELSE 0.0 END AS f_stat
           FROM g)
         SELECT n_groups, n_total, ss_between, ss_within, f_stat,
           f_stat * CAST(df1 AS DOUBLE)
             > list_extract([${QualityQueries.Chi2Crit95.mkString(", ")}],
                 CAST(df1 AS INT)) AS significant_asymp
         FROM h""",

    // q271: identical 1-row span midpoint, per-(type, user) half
    // flags, and the zero-floored continuity chain
    // (max(|b−c|−1, 0))²/(b+c).
    "q271_mcnemar" ->
      """WITH ev AS (
           SELECT event_type, user_id,
             epoch_us(ts) // 86400000000 AS day
           FROM events),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
         pu AS (
           SELECT e.event_type, e.user_id,
             CAST(max(CASE WHEN e.day < (s.d0 + s.d1 + 1) // 2
               THEN 1 ELSE 0 END) AS BIGINT) AS first_half,
             CAST(max(CASE WHEN e.day >= (s.d0 + s.d1 + 1) // 2
               THEN 1 ELSE 0 END) AS BIGINT) AS second_half
           FROM ev e CROSS JOIN span s GROUP BY 1, 2),
         c AS (
           SELECT event_type,
             CAST(sum(CASE WHEN first_half = 1 AND second_half = 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_first_only,
             CAST(sum(CASE WHEN first_half = 0 AND second_half = 1
               THEN 1 ELSE 0 END) AS BIGINT) AS n_second_only,
             CAST(sum(CASE WHEN first_half = 1 AND second_half = 1
               THEN 1 ELSE 0 END) AS BIGINT) AS n_both
           FROM pu GROUP BY 1),
         x AS (
           SELECT *, n_first_only + n_second_only AS disc,
             CASE WHEN n_first_only + n_second_only > 0
               THEN CAST(CAST(greatest(0,
                     abs(n_first_only - n_second_only) - 1) AS HUGEINT)
                 * greatest(0, abs(n_first_only - n_second_only) - 1)
                   AS DOUBLE)
                 / CAST(n_first_only + n_second_only AS DOUBLE)
               ELSE 0.0 END AS chi2_mcnemar
           FROM c)
         SELECT event_type, n_first_only, n_second_only, n_both,
           chi2_mcnemar, chi2_mcnemar > 3.8415 AS significant
         FROM x""",

    // q272: identical zero-filled grid, the same (n+1) DIV 2 offset
    // pairing, tie-dropped sign counts, and the S∓1 continuity chain.
    "q272_cox_stuart" ->
      s"""WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         grid AS (
           SELECT t.event_type, s.d0 + r.range AS day
           FROM (SELECT DISTINCT event_type FROM daily) t
           CROSS JOIN span s CROSS JOIN range(0, $MaxGridDays) r
           WHERE $oracleGridWhere),
         g AS (
           SELECT g.event_type, g.day,
             CAST(coalesce(d.n, 0) AS BIGINT) AS y
           FROM grid g LEFT JOIN daily d
             ON d.event_type = g.event_type AND d.day = g.day),
         nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
                FROM g GROUP BY 1),
         pairs AS (
           SELECT a.event_type, nd.n_days, a.y AS ya, b.y AS yb
           FROM g a JOIN nd ON nd.event_type = a.event_type
           JOIN g b ON b.event_type = a.event_type
             AND b.day = a.day + (nd.n_days + 1) // 2),
         c AS (
           SELECT event_type, n_days,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN yb > ya THEN 1 ELSE 0 END) AS BIGINT)
               AS n_plus,
             CAST(sum(CASE WHEN yb < ya THEN 1 ELSE 0 END) AS BIGINT)
               AS n_minus
           FROM pairs GROUP BY 1, 2),
         zc AS (
           SELECT *, n_plus + n_minus AS m,
             n_plus * 2 - (n_plus + n_minus) AS s_stat
           FROM c),
         z AS (
           SELECT *, CASE WHEN m > 0 AND s_stat <> 0
             THEN CAST(s_stat - (CASE WHEN s_stat > 0 THEN 1 ELSE -1 END)
               AS DOUBLE) / sqrt(CAST(m AS DOUBLE))
             ELSE 0.0 END AS z
           FROM zc)
         SELECT event_type, n_days, n_pairs, n_plus, n_minus, z,
           CASE WHEN z > 1.96 THEN 'increasing'
                WHEN z < -1.96 THEN 'decreasing'
                ELSE 'none' END AS trend
         FROM z""",

    // q273: identical grid, consecutive-day triple joins, strict
    // extremum rule, and the 2(n−2)/3, (16n−29)/90 z chain.
    "q273_turning_point" ->
      s"""WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         grid AS (
           SELECT t.event_type, s.d0 + r.range AS day
           FROM (SELECT DISTINCT event_type FROM daily) t
           CROSS JOIN span s CROSS JOIN range(0, $MaxGridDays) r
           WHERE $oracleGridWhere),
         g AS (
           SELECT g.event_type, g.day,
             CAST(coalesce(d.n, 0) AS BIGINT) AS y
           FROM grid g LEFT JOIN daily d
             ON d.event_type = g.event_type AND d.day = g.day),
         nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
                FROM g GROUP BY 1),
         tp AS (
           SELECT c.event_type,
             CAST(sum(CASE WHEN (l.y < c.y AND c.y > r.y)
               OR (l.y > c.y AND c.y < r.y) THEN 1 ELSE 0 END)
               AS BIGINT) AS turning_points
           FROM g c
           JOIN g l ON l.event_type = c.event_type AND l.day = c.day - 1
           JOIN g r ON r.event_type = c.event_type AND r.day = c.day + 1
           GROUP BY 1),
         z AS (
           SELECT t.event_type, nd.n_days, t.turning_points,
             CASE WHEN nd.n_days > 3
               THEN (CAST(t.turning_points AS DOUBLE)
                 - CAST(nd.n_days - 2 AS DOUBLE) * 2.0 / 3.0)
                 / sqrt(CAST(nd.n_days * 16 - 29 AS DOUBLE) / 90.0)
               ELSE 0.0 END AS z
           FROM tp t JOIN nd ON nd.event_type = t.event_type)
         SELECT event_type, n_days, turning_points, z,
           abs(z) <= 1.96 AS random
         FROM z""",

    // q277: q166's exact 2×2 (same ut/users/conv/grid CTEs), the
    // Haldane-smoothed cells, the decimal(20,9) ln rounding, and the
    // log-scale Woolf interval — exp never enters the compared
    // columns.
    "q277_odds_ratio" ->
      s"""WITH ut AS (
           SELECT user_id, event_type, count(*) AS k
           FROM events GROUP BY 1, 2),
         users AS (
           SELECT user_id % 2 AS variant,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n
           FROM ut GROUP BY 1),
         conv AS (
           SELECT event_type, user_id % 2 AS variant,
             CAST(count(*) AS BIGINT) AS c
           FROM ut WHERE k >= $AbConvK GROUP BY 1, 2),
         grid AS (
           SELECT t.event_type, u.variant, u.n
           FROM (SELECT DISTINCT event_type FROM ut) t CROSS JOIN users u),
         wide AS (
           SELECT g.event_type,
             CAST(sum(CASE WHEN g.variant = 0
               THEN coalesce(c.c, 0) END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN g.variant = 0 THEN g.n END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN g.variant = 1
               THEN coalesce(c.c, 0) END) AS BIGINT) AS c2,
             CAST(sum(CASE WHEN g.variant = 1 THEN g.n END) AS BIGINT) AS n2
           FROM grid g LEFT JOIN conv c
             ON c.event_type = g.event_type AND c.variant = g.variant
           GROUP BY 1),
         sm AS (
           SELECT *, CAST(c1 AS DOUBLE) + 0.5 AS a,
             CAST(n1 - c1 AS DOUBLE) + 0.5 AS b,
             CAST(c2 AS DOUBLE) + 0.5 AS c,
             CAST(n2 - c2 AS DOUBLE) + 0.5 AS dd
           FROM wide),
         o AS (
           SELECT *, a * dd / (b * c) AS odds_ratio,
             CAST(CAST(ln(a * dd / (b * c)) AS DECIMAL(20,9)) AS DOUBLE)
               AS ln_or,
             sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / dd) AS se_ln
           FROM sm)
         SELECT event_type, c1 AS conv_a, n1 AS n_a, c2 AS conv_b,
           n2 AS n_b, odds_ratio, ln_or,
           ln_or - 1.96 * se_ln AS ln_lo, ln_or + 1.96 * se_ln AS ln_hi,
           ln_or - 1.96 * se_ln > 0.0 OR ln_or + 1.96 * se_ln < 0.0
             AS significant
         FROM o""",

    // q278: q259's exact risk-set CTEs, then the integer-weighted
    // Gehan terms (HUGEINT U) and the same dsum-accumulated variance
    // and z chain.
    "q278_gehan_wilcoxon" ->
      s"""WITH ev AS (
           SELECT event_type, user_id,
             epoch_us(ts) // 86400000000 AS day
           FROM events),
         dm AS (SELECT max(day) AS d1 FROM ev),
         pu AS (
           SELECT event_type, user_id % 2 AS variant,
             min(day) AS fday, max(day) AS lday
           FROM ev GROUP BY 1, 2, user_id),
         pc AS (
           SELECT p.event_type, p.variant, p.lday - p.fday AS t,
             p.lday <= d.d1 - $KmCensorDays AS churned
           FROM pu p CROSS JOIN dm d),
         dur AS (
           SELECT event_type, variant, t,
             CAST(count(*) AS BIGINT) AS ct,
             CAST(count(*) FILTER (churned) AS BIGINT) AS d
           FROM pc GROUP BY 1, 2, 3),
         grid AS (
           SELECT g.event_type, v.variant, g.t,
             CAST(coalesce(du.ct, 0) AS BIGINT) AS ct,
             CAST(coalesce(du.d, 0) AS BIGINT) AS d
           FROM (SELECT DISTINCT event_type, t FROM dur) g
           CROSS JOIN (SELECT unnest([0, 1]) AS variant) v
           LEFT JOIN dur du ON du.event_type = g.event_type
             AND du.variant = v.variant AND du.t = g.t),
         ntot AS (
           SELECT event_type, variant, CAST(sum(ct) AS BIGINT) AS n_users
           FROM dur GROUP BY 1, 2),
         r AS (
           SELECT g.event_type, g.variant, g.t, g.ct, g.d,
             CAST(coalesce(n.n_users, 0)
               - (sum(g.ct) OVER w - g.ct) AS BIGINT) AS n_risk
           FROM grid g LEFT JOIN ntot n
             ON n.event_type = g.event_type AND n.variant = g.variant
           WINDOW w AS (PARTITION BY g.event_type, g.variant ORDER BY g.t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         bt AS (
           SELECT event_type, t,
             CAST(sum(CASE WHEN variant = 1 THEN n_risk ELSE 0 END)
               AS BIGINT) AS n1,
             CAST(sum(CASE WHEN variant = 0 THEN n_risk ELSE 0 END)
               AS BIGINT) AS n0,
             CAST(sum(CASE WHEN variant = 1 THEN d ELSE 0 END)
               AS BIGINT) AS d1,
             CAST(sum(CASE WHEN variant = 0 THEN d ELSE 0 END)
               AS BIGINT) AS d0
           FROM r GROUP BY 1, 2),
         ft AS (
           SELECT *, n0 + n1 AS nt, d0 + d1 AS dt FROM bt
           WHERE d0 + d1 > 0),
         a AS (
           SELECT event_type,
             CAST(sum(CAST(nt AS HUGEINT) * d1
               - CAST(dt AS HUGEINT) * n1) AS HUGEINT) AS u,
             CAST(sum(CAST(CASE WHEN nt > 1 THEN
               CAST(dt AS DOUBLE) * CAST(n1 AS DOUBLE)
                 * CAST(n0 AS DOUBLE) * CAST(nt - dt AS DOUBLE)
                 / CAST(nt - 1 AS DOUBLE)
               ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE) AS var_gehan
           FROM ft GROUP BY 1)
         SELECT event_type, CAST(u AS DOUBLE) AS u_gehan, var_gehan,
           CASE WHEN var_gehan > 0.0
             THEN CAST(u AS DOUBLE) / sqrt(var_gehan)
             ELSE 0.0 END AS z,
           abs(CASE WHEN var_gehan > 0.0
             THEN CAST(u AS DOUBLE) / sqrt(var_gehan)
             ELSE 0.0 END) > 1.96 AS significant
         FROM a""",

    // q265: identical zero-filled grid + arithmetic dow; HUGEINT
    // sufficient statistics, the dsum mirror for the seven per-dow
    // terms, the same η² final chain.
    "q265_seasonal_strength" ->
      s"""WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         grid AS (
           SELECT t.event_type, s.d0 + r.range AS day
           FROM (SELECT DISTINCT event_type FROM daily) t
           CROSS JOIN span s CROSS JOIN range(0, $MaxGridDays) r
           WHERE $oracleGridWhere),
         g AS (
           SELECT g.event_type, g.day, (g.day + 4) % 7 AS dow,
             CAST(coalesce(d.n, 0) AS BIGINT) AS y
           FROM grid g LEFT JOIN daily d
             ON d.event_type = g.event_type AND d.day = g.day),
         bd AS (
           SELECT event_type, dow, CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(y) AS HUGEINT) AS td
           FROM g GROUP BY 1, 2),
         tot AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(y) AS HUGEINT) AS t,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
           FROM g GROUP BY 1),
         b AS (
           SELECT event_type,
             CAST(sum(CAST(CAST(td AS DOUBLE) * CAST(td AS DOUBLE)
               / CAST(nd AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS b
           FROM bd GROUP BY 1),
         f AS (
           SELECT t.event_type, t.n_days,
             b.b - CAST(t.t AS DOUBLE) * CAST(t.t AS DOUBLE)
               / CAST(t.n_days AS DOUBLE) AS ss_between,
             CAST(t.syy AS DOUBLE) - CAST(t.t AS DOUBLE)
               * CAST(t.t AS DOUBLE) / CAST(t.n_days AS DOUBLE)
               AS ss_total
           FROM tot t JOIN b ON b.event_type = t.event_type)
         SELECT event_type, n_days, ss_between, ss_total,
           CASE WHEN ss_total > 0.0 THEN ss_between / ss_total
                ELSE 0.0 END AS eta2,
           CASE WHEN ss_total > 0.0 THEN ss_between / ss_total
                ELSE 0.0 END > 0.2 AS seasonal
         FROM f""",

    // q266: identical grid, lower-median rank under the same (y, day)
    // total order, the same discard rule, adjacency as the
    // consecutive-index join, the same μ/σ²/z chain.
    "q266_runs_test" ->
      s"""WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         grid AS (
           SELECT t.event_type, s.d0 + r.range AS day
           FROM (SELECT DISTINCT event_type FROM daily) t
           CROSS JOIN span s CROSS JOIN range(0, $MaxGridDays) r
           WHERE $oracleGridWhere),
         g AS (
           SELECT g.event_type, g.day,
             CAST(coalesce(d.n, 0) AS BIGINT) AS y
           FROM grid g LEFT JOIN daily d
             ON d.event_type = g.event_type AND d.day = g.day),
         nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
                FROM g GROUP BY 1),
         rk AS (
           SELECT g.*, CAST(row_number() OVER (PARTITION BY g.event_type
             ORDER BY g.y, g.day) AS BIGINT) AS rk
           FROM g),
         med AS (
           SELECT r.event_type, r.y AS med
           FROM rk r JOIN nd ON nd.event_type = r.event_type
           WHERE r.rk = (nd.n_days + 1) // 2),
         kept AS (
           SELECT g.event_type, g.day, g.y > m.med AS above
           FROM g JOIN med m ON m.event_type = g.event_type
           WHERE g.y <> m.med),
         idx AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY event_type
             ORDER BY day) AS BIGINT) AS i
           FROM kept),
         chg AS (
           SELECT a.event_type,
             CAST(sum(CASE WHEN a.above <> b.above THEN 1 ELSE 0 END)
               AS BIGINT) AS chg
           FROM idx a JOIN idx b
             ON b.event_type = a.event_type AND a.i = b.i - 1
           GROUP BY 1),
         cnt AS (
           SELECT event_type,
             CAST(count(*) FILTER (above) AS BIGINT) AS n_above,
             CAST(count(*) FILTER (NOT above) AS BIGINT) AS n_below
           FROM kept GROUP BY 1),
         f AS (
           SELECT c.event_type, c.n_above, c.n_below,
             coalesce(h.chg, 0) + 1 AS runs,
             c.n_above + c.n_below AS m,
             c.n_above * c.n_below AS p
           FROM cnt c LEFT JOIN chg h ON h.event_type = c.event_type),
         zf AS (
           SELECT *, 1.0 + CAST(p * 2 AS DOUBLE) / CAST(m AS DOUBLE)
               AS mu,
             CASE WHEN m > 1 THEN
               CAST(p * 2 * (p * 2 - m) AS DOUBLE)
                 / CAST(m * m * (m - 1) AS DOUBLE)
             ELSE 0.0 END AS var_r
           FROM f),
         zz AS (
           SELECT *, CASE WHEN n_above > 0 AND n_below > 0
               AND var_r > 0.0
             THEN (CAST(runs AS DOUBLE) - mu) / sqrt(var_r)
             ELSE 0.0 END AS z
           FROM zf)
         SELECT event_type, n_above, n_below, CAST(runs AS BIGINT)
             AS runs, z, abs(z) <= 1.96 AS random
         FROM zz""",

    // q242: identical grid + arithmetic dow; pairs restricted to the
    // same stratum; per-stratum variance terms summed exactly; the
    // same S∓1 continuity-corrected IEEE chain.
    "q242_seasonal_mk" ->
      s"""WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         grid AS (
           SELECT t.event_type, s.d0 + r.range AS day
           FROM (SELECT DISTINCT event_type FROM daily) t
           CROSS JOIN span s CROSS JOIN range(0, $MaxGridDays) r
           WHERE $oracleGridWhere),
         g AS (
           SELECT g.event_type, (g.day + 4) % 7 AS dow, g.day,
             CAST(coalesce(d.n, 0) AS BIGINT) AS y
           FROM grid g LEFT JOIN daily d
             ON d.event_type = g.event_type AND d.day = g.day),
         s AS (
           SELECT a.event_type,
             CAST(sum(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
           FROM g a JOIN g b
             ON b.event_type = a.event_type AND b.dow = a.dow
            AND a.day < b.day
           GROUP BY 1),
         strata AS (
           SELECT event_type, dow, CAST(count(*) AS BIGINT) AS nk
           FROM g GROUP BY 1, 2),
         ties AS (
           SELECT event_type, dow,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_k
           FROM (SELECT event_type, dow, y, CAST(count(*) AS BIGINT) AS t
                 FROM g GROUP BY 1, 2, 3) GROUP BY 1, 2),
         v AS (
           SELECT st.event_type, CAST(count(*) AS BIGINT) AS n_strata,
             CAST(sum(st.nk) AS BIGINT) AS n_days,
             CAST(sum(st.nk * (st.nk - 1) * (2 * st.nk + 5) - t.tie_k)
               AS BIGINT) AS var18
           FROM strata st JOIN ties t
             ON t.event_type = st.event_type AND t.dow = st.dow
           GROUP BY 1)
         SELECT s.event_type, v.n_days, v.n_strata, s.s_stat,
           CAST(v.var18 AS DOUBLE) / 18.0 AS var_s,
           CASE WHEN v.var18 = 0 THEN 0.0
                WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
                  / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
                  / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                ELSE 0.0 END AS z,
           abs(CASE WHEN v.var18 = 0 THEN 0.0
                WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
                  / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
                  / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                ELSE 0.0 END) > 1.96 AS trending
         FROM s JOIN v ON v.event_type = s.event_type""",

    // q244: identical per-user rollup (cents through the same
    // DECIMAL(12,2)·100 route), HUGEINT sufficient statistics, and
    // the same delta-method IEEE chain — exact numerators cast to
    // double exactly where the Spark plan casts them.
    "q244_delta_ratio" ->
      """WITH ux AS (
           SELECT event_type, user_id,
             CAST(count(*) AS BIGINT) AS ne,
             CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
               AS BIGINT) AS sc,
             user_id % 2 AS v
           FROM events GROUP BY 1, 2),
         st AS (
           SELECT event_type, v, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ne) AS HUGEINT) AS sn,
             CAST(sum(sc) AS HUGEINT) AS ss,
             sum(CAST(ne AS HUGEINT) * ne) AS snn,
             sum(CAST(sc AS HUGEINT) * sc) AS sss,
             sum(CAST(sc AS HUGEINT) * ne) AS ssn
           FROM ux GROUP BY 1, 2),
         rv AS (
           SELECT event_type, v, n, sn, ss, snn, sss, ssn,
             CASE WHEN sn = 0 THEN 0.0
                  ELSE CAST(ss AS DOUBLE) / CAST(sn AS DOUBLE) END AS r
           FROM st),
         vv AS (
           SELECT event_type, v, n, r,
             CASE WHEN n < 2 OR sn = 0 THEN 0.0
                  ELSE CAST(n AS DOUBLE) *
                    (CAST(n * sss - ss * ss AS DOUBLE)
                     - 2.0 * r * CAST(n * ssn - ss * sn AS DOUBLE)
                     + r * r * CAST(n * snn - sn * sn AS DOUBLE)) /
                    (CAST(n - 1 AS DOUBLE)
                     * CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)) END AS vr
           FROM rv),
         wide AS (
           SELECT event_type,
             CAST(coalesce(sum(n) FILTER (v = 0), 0) AS BIGINT) AS n0,
             CAST(coalesce(sum(n) FILTER (v = 1), 0) AS BIGINT) AS n1,
             coalesce(sum(r) FILTER (v = 0), 0.0) AS r0,
             coalesce(sum(r) FILTER (v = 1), 0.0) AS r1,
             coalesce(sum(vr) FILTER (v = 0), 0.0) AS v0,
             coalesce(sum(vr) FILTER (v = 1), 0.0) AS v1
           FROM vv GROUP BY 1),
         z AS (
           SELECT event_type, n0, n1, r0, r1, r1 - r0 AS diff,
             CASE WHEN NOT (v0 + v1 > 0.0) THEN 0.0
                  ELSE (r1 - r0) / sqrt(v0 + v1) END AS z
           FROM wide)
         SELECT event_type, n0, n1, r0, r1, diff, z,
           abs(z) > 1.96 AS significant
         FROM z""",

    // q246: identical cents route and 10-digit grid; HUGEINT mirrors
    // the cleared numerator; one division + the same df=9 bar.
    "q246_digit_audit" ->
      """WITH e AS (
           SELECT event_type,
             abs(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) % 10
               AS digit
           FROM events),
         cnt AS (SELECT event_type, digit, CAST(count(*) AS BIGINT) AS o
                 FROM e GROUP BY 1, 2),
         tot AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS n
                 FROM cnt GROUP BY 1),
         grid AS (SELECT t.event_type, t.n, CAST(r.range AS BIGINT) AS digit
                  FROM tot t CROSS JOIN range(0, 10) r),
         sq AS (
           SELECT g.event_type, g.n,
             CAST(coalesce(c.o, 0) * 10 - g.n AS HUGEINT)
               * (coalesce(c.o, 0) * 10 - g.n) AS sq
           FROM grid g LEFT JOIN cnt c
             ON c.event_type = g.event_type AND c.digit = g.digit),
         agg AS (SELECT event_type, max(n) AS n, sum(sq) AS ssq
                 FROM sq GROUP BY 1)
         SELECT event_type, n,
           CAST(ssq AS DOUBLE) / CAST(n * 10 AS DOUBLE) AS chi2,
           CAST(ssq AS DOUBLE) / CAST(n * 10 AS DOUBLE) <= 16.919
             AS uniform
         FROM agg""",

    // q247: identical contingency and margins; each cell term the
    // same exact-integer division; the decimal-routed sum mirrors
    // dsum; the same clamp + sqrt chain.
    "q247_cramers_v" ->
      """WITH e AS (
           SELECT event_type,
             (epoch_us(ts) // 86400000000 + 4) % 7 AS dow
           FROM events),
         cells AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS o
                   FROM e GROUP BY 1, 2),
         rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
                FROM cells GROUP BY 1),
         cd AS (SELECT dow, CAST(sum(o) AS BIGINT) AS cd
                FROM cells GROUP BY 1),
         nall AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                    CAST(count(DISTINCT event_type) AS BIGINT) AS r,
                    CAST(count(DISTINCT dow) AS BIGINT) AS c
                  FROM cells),
         terms AS (
           SELECT nall.n, nall.r, nall.c,
             CAST(CAST(ce.o AS HUGEINT) * ce.o * nall.n AS DOUBLE)
               / CAST(CAST(rt.rt AS HUGEINT) * cd.cd AS DOUBLE) AS term
           FROM cells ce
           JOIN rt ON rt.event_type = ce.event_type
           JOIN cd ON cd.dow = ce.dow
           CROSS JOIN nall),
         agg AS (
           SELECT n, r, c,
             CAST(sum(CAST(term AS DECIMAL(38,12))) AS DOUBLE) AS tsum
           FROM terms GROUP BY 1, 2, 3),
         ch AS (
           SELECT n, r AS r_types, c AS c_dows,
             greatest(tsum - CAST(n AS DOUBLE), 0.0) AS chi2
           FROM agg),
         vv AS (
           SELECT n, r_types, c_dows, chi2,
             CASE WHEN r_types < 2 OR c_dows < 2 THEN 0.0
                  ELSE sqrt(chi2 / CAST(n * least(r_types - 1, c_dows - 1)
                    AS DOUBLE)) END AS v
           FROM ch)
         SELECT n, r_types, c_dows, chi2, v,
           CASE WHEN v < 0.1 THEN 'negligible' WHEN v < 0.3 THEN 'weak'
                WHEN v < 0.5 THEN 'moderate' ELSE 'strong' END AS band
         FROM vv"""
  )
}
