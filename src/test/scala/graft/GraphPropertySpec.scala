package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorQueries

/** Property coverage for the extracted graph engines
  * ([[VectorQueries.pageRankMass]] / [[VectorQueries.propagateLabels]])
  * on RANDOM graphs — shapes the corpus-derived k-NN graph never
  * produces: dangling-heavy graphs, disconnected islands, hubs,
  * label-free components. Each trial compares the distributed result
  * against an exact driver replay of the same integer recurrence. */
class GraphPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def randomGraph(rnd: scala.util.Random, n: Int, nEdges: Int) =
    Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct

  test("pageRankMass == driver replay on random graphs (dangling, islands, hubs)") {
    val rnd = new scala.util.Random(977)
    for (trial <- 1 to 6) {
      val n = 20 + rnd.nextInt(60)
      // sparse → many dangling nodes; dense → hubs
      val edges = randomGraph(rnd, n, if (trial % 2 == 0) n / 2 else n * 3)
      val nodesDf = (0L until n).toDF("vec_id")
      val edgesDf = edges.toDF("src", "dst")
      val got = VectorQueries.pageRankMass(nodesDf, edgesDf, n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      val M = VectorQueries.PrMass
      val base = (3L * M) / (VectorQueries.PrDampDen * n)
      val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val inE = edges.groupBy(_._2)
      var pr = Array.fill(n)(M / n)
      for (_ <- 1 to VectorQueries.PrIters) {
        val dang = (0 until n).filter(v => !outdeg.contains(v.toLong))
          .map(v => pr(v)).sum
        pr = Array.tabulate(n) { v =>
          val m = inE.getOrElse(v.toLong, Seq.empty)
            .map { case (s, _) => pr(s.toInt) / outdeg(s) }.sum
          base + (VectorQueries.PrDampNum * (m + dang / n)) /
            VectorQueries.PrDampDen
        }
      }
      (0 until n).foreach { v =>
        assert(got(v.toLong) == pr(v),
          s"trial $trial node $v: ${got(v.toLong)} != ${pr(v)} " +
            s"(n=$n, edges=${edges.size})")
      }
      val total = got.values.sum
      assert(total <= M && total >= M - 10L * (n + edges.size),
        s"trial $trial: mass $total outside floor-loss bounds of $M")
    }
  }

  test("propagateLabels == driver replay; seeds clamped; labels only from seeds") {
    val rnd = new scala.util.Random(1213)
    for (trial <- 1 to 6) {
      val n = 20 + rnd.nextInt(60)
      val edges = randomGraph(rnd, n, n * 2)
      val seedLbl = (0 until n)
        .filter(_ => rnd.nextInt(4) == 0)
        .map(v => v.toLong -> rnd.nextInt(3)).toMap
      val seedsDf = (0L until n).map(v => (v, seedLbl.get(v).map(Integer.valueOf).orNull))
        .toDF("vec_id", "lbl")
      val got = VectorQueries.propagateLabels(
          seedsDf, edges.toDF("src", "dst"), VectorQueries.LpIters)
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap

      val und = (edges ++ edges.map(_.swap)).distinct
      val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var cur: Map[Long, Option[Int]] =
        (0L until n).map(v => v -> seedLbl.get(v)).toMap
      for (_ <- 1 to VectorQueries.LpIters) {
        cur = (0L until n).map { v =>
          val votes = adj.getOrElse(v, Seq.empty[Long]).flatMap(cur(_))
            .groupBy(x => x).view.mapValues(_.size).toSeq
          val winner = if (votes.isEmpty) None
            else Some(votes.minBy { case (l, c) => (-c, l) }._1)
          v -> seedLbl.get(v).orElse(winner)
        }.toMap
      }
      (0L until n).foreach { v =>
        assert(got(v) == cur(v), s"trial $trial node $v: ${got(v)} != ${cur(v)}")
        if (seedLbl.contains(v))
          assert(got(v).contains(seedLbl(v)), s"seed $v must stay clamped")
        got(v).foreach(l => assert(seedLbl.values.toSet.contains(l),
          s"node $v labeled $l — labels can only originate from seeds"))
      }
    }
  }
}
