package graft

import org.apache.spark.sql.functions._
import graft.operators.BinSelect

/** The r15 fused exact-quantile boundary: BinSelect's driver-side walk
  * must reproduce the relational derivation it replaced (cumulative
  * window over the histogram + min_by at the first crossing), and the
  * fused q223/q254 chains must still pick the brute-rank answers. */
class BinSelectSpec extends SparkTestBase {

  /** The OLD relational boundary form, verbatim (broadcast targets +
    * cumulative bin window + min_by) — kept here as the executable
    * definition the driver walk is pinned against. */
  private def relationalBoundary(hist: Seq[(String, Int, Long)],
      targets: Seq[BinSelect.Target]): Set[(String, String, Int, Long)] = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val h = hist.toDF("g", "bin", "bn")
    val t = targets.map(x => (x.group, x.tgt, x.k)).toDF("g", "tgt", "k")
    val wb = Window.partitionBy(col("g"), col("tgt")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.join(broadcast(t), "g")
      .withColumn("cum", sum(col("bn")).over(wb))
      .filter(col("cum") >= col("k"))
      .groupBy(col("g"), col("tgt"))
      .agg(min_by(struct(col("bin").as("bbin"),
        (col("k") - col("cum") + col("bn")).as("kk")), col("bin")).as("b"))
      .select(col("g"), col("tgt"), col("b.bbin"), col("b.kk"))
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
  }

  test("driver walk == relational window+min_by boundary on random histograms") {
    val rnd = new scala.util.Random(20260818L)
    (1 to 20).foreach { trial =>
      val groups = (0 until 1 + rnd.nextInt(4)).map(i => s"g$i")
      val hist = groups.flatMap { g =>
        // sparse, shuffled bins with skewed masses (incl. mass-1 bins)
        val bins = rnd.shuffle((0 until 256).toList).take(1 + rnd.nextInt(40))
        bins.map(b => (g, b, 1L + rnd.nextInt(1000).toLong))
      }
      val totals = hist.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val targets = groups.flatMap { g =>
        val n = totals(g)
        Seq(BinSelect.Target(g, "p50", (n + 1) / 2),
          BinSelect.Target(g, "p90", (9 * n + 9) / 10),
          BinSelect.Target(g, "first", 1L),  // k=1: first bin
          BinSelect.Target(g, "last", n))    // k=n: last bin, kk=mass
      }
      val walk = BinSelect.boundary(rnd.shuffle(hist.toList), targets)
        .map(b => (b.group, b.tgt, b.bbin, b.kk)).toSet
      assert(walk === relationalBoundary(hist, targets), s"trial $trial")
    }
  }

  test("degenerate histograms: single bin, all mass in one bin, k at edges") {
    // one group, one bin holding everything (the hi==lo degenerate case
    // of the 256-bin grid maps every row to bin 0)
    val one = BinSelect.boundary(Seq(("g", 0, 10L)),
      Seq(BinSelect.Target("g", "p50", 5L), BinSelect.Target("g", "p90", 10L)))
    assert(one.map(b => (b.tgt, b.bbin, b.kk)).toSet ===
      Set(("p50", 0, 5L), ("p90", 0, 10L)))
    // boundary exactly at a bin edge: bins 3 (mass 4) and 7 (mass 6);
    // k=4 must stay in bin 3 with kk=4, k=5 crosses into bin 7 with kk=1
    val edge = BinSelect.boundary(Seq(("g", 7, 6L), ("g", 3, 4L)),
      Seq(BinSelect.Target("g", "a", 4L), BinSelect.Target("g", "b", 5L)))
    assert(edge.map(b => (b.tgt, b.bbin, b.kk)).toSet ===
      Set(("a", 3, 4L), ("b", 7, 1L)))
    // over-mass rank fails loudly instead of dropping the quantile
    intercept[RuntimeException] {
      BinSelect.boundary(Seq(("g", 0, 3L)), Seq(BinSelect.Target("g", "x", 4L)))
    }
  }

  test("fused q223/q254 still pick the brute-rank quantiles at sf0.001") {
    // independent brute derivation, Spark-side (the DuckDB oracle does
    // the same with row_number over a full sort)
    import org.apache.spark.sql.expressions.Window
    val got223 = SparkEntry.queries("q223_exact_quantiles")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet
    val ev = Tables.events(spark, sf).select(col("event_type"), col("value"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
    val ranked = ev.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
    val want223 = ranked
      .filter(col("rn") === expr("(n + 1) DIV 2") ||
        col("rn") === expr("(9 * n + 9) DIV 10"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 1) DIV 2"), col("value"))).as("p50"),
        max(when(col("rn") === expr("(9 * n + 9) DIV 10"), col("value"))).as("p90"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet
    assert(got223 === want223, "q223 fused vs brute rank")

    val got254 = SparkEntry.queries("q254_weighted_quantiles")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val docs = Tables.documents(spark, sf).select(col("source"), col("n_chars"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("w"))
    // ROWS frame: ties must accumulate row-by-row (any tie order picks
    // the same n_chars value), not share a RANGE-group cum — a boundary
    // inside a tie group would otherwise select no row at all
    val ws = Window.partitionBy(col("source")).orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = docs.withColumn("cw", sum(col("w")).over(ws))
      .withColumn("tw", sum(col("w")).over(Window.partitionBy(col("source"))))
      .withColumn("nd", count(lit(1)).over(Window.partitionBy(col("source"))))
    def pick(kExpr: String) = cum
      .filter(col("cw") >= expr(kExpr) && col("cw") - col("w") < expr(kExpr))
    val want254 = pick("(tw + 1) DIV 2").select(col("source"),
        col("nd"), col("tw"), col("n_chars").as("wp50"))
      .join(pick("(9 * tw + 9) DIV 10").select(col("source"),
        col("n_chars").as("wp90")), "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got254 === want254, "q254 fused vs brute weighted rank")
  }
}
