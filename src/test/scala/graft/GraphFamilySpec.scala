package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextQueries, VectorQueries}

/** q103/q104/q105/q108/q109 — the chunking/graph/diversity additions.
  * The DuckDB oracles prove cross-engine equality; these specs pin the
  * semantics the hash compare can't express: exact reconstruction,
  * independent driver-side recomputation of the iterative operators,
  * and the diversity property MMR exists to deliver.
  */
class GraphFamilySpec extends SparkTestBase {

  test("q103: chunks tile every document exactly (stride prefixes rebuild the token stream)") {
    val out = SparkEntry.queries("q103_chunking")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet, "every document must be chunked")
    byDoc.foreach { case (docId, chunks) =>
      val ts = docs(docId)
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong),
        s"doc $docId chunk_ids not consecutive from 0")
      sorted.foreach { case (_, cid, nTok, text) =>
        val start = (cid * TextQueries.ChunkStride).toInt
        val want = ts.slice(start, start + TextQueries.ChunkW)
        assert(text == want.mkString(" "),
          s"doc $docId chunk $cid is not the token slice at $start")
        assert(nTok == want.length,
          s"doc $docId chunk $cid n_chunk_tokens $nTok != ${want.length}")
      }
      // stride-sized prefixes of each chunk, in order, plus the last
      // chunk's tail, concatenate back to the full token stream — the
      // no-token-lost/no-token-duplicated contract of an overlapped
      // chunker
      val rebuilt = sorted.init.flatMap(c =>
        c._4.split(" ").take(TextQueries.ChunkStride)) ++
        sorted.last._4.split(" ")
      assert(rebuilt.toSeq == ts, s"doc $docId chunks do not tile the doc")
    }
  }

  test("q104: within-cell edges, bounded out-degree, exact per-node rank") {
    val e = VectorQueries.emb(spark, sf)
    val n = e.count()
    val cells = operators.IvfIndex.cellAssignments(
        e, VectorQueries.ivfNList(n), Some(n))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = SparkEntry.queries("q104_knn_graph")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val bySrc = out.groupBy(_._1)
    val cellSizes = cells.values.groupBy(identity).view.mapValues(_.size).toMap
    bySrc.foreach { case (src, edges) =>
      assert(edges.length <= VectorQueries.KnnGraphK, s"node $src over-degree")
      assert(edges.length ==
        math.min(VectorQueries.KnnGraphK, cellSizes(cells(src)) - 1),
        s"node $src should exhaust its cellmates up to K")
      assert(edges.map(_._4).sorted.toSeq == (1L to edges.length),
        s"node $src ranks not 1..k")
      edges.foreach { case (_, dst, _, _) =>
        assert(cells(dst) == cells(src),
          s"edge $src->$dst crosses cells — candidates must be cell-local")
        assert(dst != src, "self-edge")
      }
      // cosines non-increasing in rank
      val byRn = edges.sortBy(_._4).map(_._3)
      assert(byRn.zip(byRn.tail).forall { case (a, b) => a >= b },
        s"node $src cosines not ranked descending: ${byRn.toSeq}")
    }
    // full-coverage: every vector is a src (every cell has >= 2 members
    // at this sf; if a singleton cell ever appears, the node is
    // legitimately absent — recompute membership rather than fail)
    val expectedSrcs = cells.keySet.filter(v => cellSizes(cells(v)) >= 2)
    assert(bySrc.keySet == expectedSrcs, "node coverage mismatch")
  }

  test("q105: driver replay of the integer-mass recurrence matches exactly") {
    val edges = SparkEntry.queries("q104_knn_graph")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = VectorQueries.emb(spark, sf).count()
    val nodes = (0L until n).toArray
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inEdges = edges.groupBy(_._2)
    val M = VectorQueries.PrMass
    val base = (3L * M) / (VectorQueries.PrDampDen * n)
    var pr = nodes.map(_ => M / n)
    for (_ <- 1 to VectorQueries.PrIters) {
      val dang = nodes.filter(v => !outdeg.contains(v)).map(v => pr(v.toInt)).sum
      pr = nodes.map { v =>
        val m = inEdges.getOrElse(v, Array.empty[(Long, Long)])
          .map { case (src, _) => pr(src.toInt) / outdeg(src) }.sum
        base + (VectorQueries.PrDampNum * (m + dang / n)) /
          VectorQueries.PrDampDen
      }
    }
    val got = SparkEntry.queries("q105_pagerank")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == nodes.toSet, "rank vector must cover every node")
    nodes.foreach { v =>
      assert(got(v) == pr(v.toInt),
        s"node $v: spark ${got(v)} != replay ${pr(v.toInt)} — " +
          "integer recurrence must be exact")
    }
    // total mass is conserved up to the documented floor losses
    val total = got.values.sum
    assert(total <= M && total >= M - 10L * (n + edges.length),
      s"mass $total drifted from $M beyond floor-loss bounds")
  }

  test("q156: driver replay of integer-mass HITS matches; asymmetry is real") {
    val edges = SparkEntry.queries("q104_knn_graph")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = VectorQueries.emb(spark, sf).count()
    val nodes = (0L until n).toArray
    val inE = edges.groupBy(_._2)
    val outE = edges.groupBy(_._1)
    val M = VectorQueries.HitsMass
    var hub = nodes.map(_ => M / n)
    var auth = nodes.map(_ => 0L)
    for (_ <- 1 to VectorQueries.HitsIters) {
      val aRaw = nodes.map(v => inE.getOrElse(v, Array.empty[(Long, Long)])
        .map { case (src, _) => hub(src.toInt) }.sum)
      val aS = math.max(1L, aRaw.sum)
      auth = aRaw.map(x => x * M / aS)
      val hRaw = nodes.map(v => outE.getOrElse(v, Array.empty[(Long, Long)])
        .map { case (_, dst) => auth(dst.toInt) }.sum)
      val hS = math.max(1L, hRaw.sum)
      hub = hRaw.map(x => x * M / hS)
    }
    val got = SparkEntry.queries("q156_hits")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == nodes.toSet, "one row per node")
    nodes.foreach { v =>
      assert(got(v) == ((auth(v.toInt), hub(v.toInt))),
        s"node $v: spark ${got(v)} != replay " +
          s"(${auth(v.toInt)}, ${hub(v.toInt)}) — integer HITS must be exact")
    }
    // the two scores measure different things on a kNN graph: the
    // authority and hub argmax nodes differ somewhere, and in-degree-0
    // nodes carry zero authority while still holding hub mass
    val topAuth = got.maxBy { case (v, (a, _)) => (a, -v) }._1
    val topHub = got.maxBy { case (v, (_, h)) => (h, -v) }._1
    assert(got.values.map(_._1).sum > 0 && got.values.map(_._2).sum > 0)
    val noIn = nodes.filter(v => !inE.contains(v))
    noIn.foreach(v => assert(got(v)._1 == 0L, s"in-degree-0 node $v authority"))
    assert(topAuth != topHub || noIn.nonEmpty,
      "authority and hub collapsed to the same ordering — asymmetry untested")
  }

  test("q157: driver vote replay matches; gate is a real supermajority") {
    val edges = SparkEntry.queries("q104_knn_graph")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lbl = VectorQueries.emb(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = SparkEntry.queries("q157_label_noise")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(got.keySet == lbl.keySet, "one audited row per labeled vector")
    val bySrc = edges.groupBy(_._1)
    lbl.foreach { case (v, own) =>
      val votes = bySrc.getOrElse(v, Array.empty[(Long, Long)])
        .groupBy { case (_, dst) => lbl(dst) }.view.mapValues(_.length.toLong)
        .toMap
      val (vlbl, vcnt) =
        if (votes.isEmpty) (-1L, 0L)
        else votes.toSeq.minBy { case (l, c) => (-c, l) }
      val ocnt = votes.getOrElse(own, 0L)
      val noisy = votes.nonEmpty && vlbl != own &&
        vcnt >= VectorQueries.NoiseMinVotes
      assert(got(v) == ((own, vlbl, vcnt, ocnt, noisy)),
        s"node $v: spark ${got(v)} != replay ($own, $vlbl, $vcnt, $ocnt, $noisy)")
    }
    // the audit must be non-vacuous in BOTH directions, and the gate
    // must actually bind: a sub-supermajority disagreement (plain
    // plurality would flag it) must exist and stay unflagged
    val rows = got.values
    assert(rows.exists(_._5), "no noisy rows — the gate can't be exercised")
    assert(rows.exists(r => r._2 == r._1 && !r._5), "no clean rows")
    assert(rows.exists(r => r._2 != r._1 && r._2 >= 0 &&
        r._3 < VectorQueries.NoiseMinVotes && !r._5),
      "gate vacuous: every disagreeing plurality already reaches the gate")
  }

  test("q158: driver walk replay matches; the per-walk draw actually diversifies") {
    val edges = SparkEntry.queries("q104_knn_graph")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val outE = edges.groupBy(_._1)
    val nodes = VectorQueries.emb(spark, sf).collect().map(_.getLong(0))
    def h(walk: Long, step: Int, dst: Long): BigInt = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$walk:$step:$dst".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      BigInt(hex, 16)
    }
    val want = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    nodes.foreach { start =>
      var cur = start
      want += ((start, 0L, start))
      var k = 1
      var alive = true
      while (alive && k <= VectorQueries.WalkSteps) {
        val nbrs = outE.getOrElse(cur, Array.empty[(Long, Long)])
        if (nbrs.isEmpty) alive = false
        else {
          cur = nbrs.map { case (_, dst) => (h(start, k, dst), dst) }
            .minBy(identity)._2
          want += ((start, k.toLong, cur))
          k += 1
        }
      }
    }
    val got = SparkEntry.queries("q158_random_walks")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sorted.toSeq == want.sorted.toSeq,
      "walk corpus != driver replay")
    // the draw must be per-walk: two different walks standing on the
    // SAME node at the same step somewhere pick DIFFERENT next hops —
    // otherwise this is just "everyone follows the rank-1 edge"
    val byStep = got.groupBy(_._2)
    val diverged = (1 until VectorQueries.WalkSteps).exists { k =>
      val at = byStep.getOrElse(k.toLong, Array.empty).map(r => r._1 -> r._3)
      val next = byStep.getOrElse(k + 1L, Array.empty)
        .map(r => r._1 -> r._3).toMap
      at.groupBy(_._2).values.exists { walksHere =>
        walksHere.flatMap { case (w, _) => next.get(w) }.distinct.length > 1
      }
    }
    assert(diverged,
      "no two co-located walks ever diverged — the md5 draw is vacuous")
  }

  test("q160: driver Gonzalez replay matches; radius non-increasing and beats the naive coreset") {
    val e = VectorQueries.emb(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val K = VectorQueries.KCenterK
    var centers = List((1L, e.keys.min, 0.0))
    val dmin = scala.collection.mutable.Map.empty[Long, Double]
    for (k <- 2 to K) {
      val ce = e(centers.head._2)
      e.keys.foreach { v =>
        val nd = 1.0 - cos(e(v), ce)
        dmin(v) = dmin.get(v).fold(nd)(math.min(_, nd))
      }
      val (cid, r) = e.keys.toSeq
        .map(v => (v, dmin(v))).minBy { case (v, d0) => (-d0, v) }
      centers ::= ((k.toLong, cid, r))
    }
    val want = centers.reverse
    val got = SparkEntry.queries("q160_kcenter")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toList == want, s"greedy picks differ:\n$got\nvs\n$want")
    // the Gonzalez guarantees this operator exists for: the radius
    // sequence never increases, and the selected coreset covers the
    // corpus strictly better than the naive first-K-ids subset
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"covering radius increased: $radii")
    def covRadius(cs: Seq[Long]): Double = e.keys.map(v =>
      cs.map(c => 1.0 - cos(e(v), e(c))).min).max
    val naive = e.keys.toSeq.sorted.take(K)
    assert(covRadius(got.map(_._2).toSeq) < covRadius(naive),
      "greedy coreset does not beat the first-K-ids baseline")
  }

  test("q179: driver wedge replay matches; predictions are non-adjacent and ranked") {
    val edges = SparkEntry.queries("q104_knn_graph")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = (edges ++ edges.map(_.swap)).toSet
    val byNode = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val scores = scala.collection.mutable.Map.empty[(Long, Long), Long]
    und.foreach { case (u, v) =>
      byNode(v).foreach { w =>
        if (u < w) scores((u, w)) = scores.getOrElse((u, w), 0L) + 1
      }
    }
    val want = scores.toSeq.filter { case ((u, w), _) => !und((u, w)) }
      .map { case ((u, w), c) => (u, w, c) }
      .sortBy { case (u, w, c) => (-c, u, w) }
      .take(VectorQueries.LinkPredK)
    val got = SparkEntry.queries("q179_link_prediction")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"predictions differ:\n$got\nvs\n$want")
    got.foreach { case (u, w, c) =>
      assert(!und((u, w)) && !und((w, u)), s"($u,$w) already an edge")
      assert(c >= 1)
    }
    // non-vacuous: the top prediction shares MULTIPLE neighbors (a
    // count-1 wedge list would make the ranking meaningless)
    assert(got.head._3 >= 2, "no pair shares more than one neighbor")
  }

  test("q108: driver replay of the greedy matches; MMR picks are more diverse than top-k") {
    val e = VectorQueries.emb(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2).toArray).toMap
    // op-for-op mirror of CosineSim (incl. sqrt(na)*sqrt(nb)) so the
    // replayed argmaxes see bit-identical scores
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val lam = VectorQueries.MmrLambda
    val out = SparkEntry.queries("q108_mmr_diverse")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byProbe = out.groupBy(_._1)
    assert(byProbe.keySet == (0L until 10L).toSet)
    var mmrPairSum = 0.0; var topPairSum = 0.0; var pairs = 0
    byProbe.foreach { case (pid, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to VectorQueries.AnnK))
      assert(rows.map(_._2).distinct.length == rows.length, "duplicate pick")
      // independent greedy replay over an independently recomputed pool
      val pv = e(pid)
      val pool = e.keys.filter(_ != pid).toSeq
        .map(v => v -> cos(pv, e(v)))
        .sortBy { case (v, c) => (-c, v) }.take(VectorQueries.MmrPool)
      var selected = Vector(pool.head._1)
      for (_ <- 2 to VectorQueries.AnnK) {
        val next = pool.filterNot(p => selected.contains(p._1))
          .map { case (v, rel) =>
            val mx = selected.map(s => cos(e(v), e(s))).max
            (v, lam * rel - (1 - lam) * mx)
          }.minBy { case (v, sc) => (-sc, v) }
        selected :+= next._1
      }
      val got = rows.sortBy(_._3).map(_._2).toVector
      assert(got == selected,
        s"probe $pid: spark picks $got != greedy replay $selected")
      // diversity: mean pairwise cosine among MMR picks vs plain top-5
      val topK = pool.take(VectorQueries.AnnK).map(_._1)
      def pairMean(vs: Seq[Long]): Double = {
        val ps = for (i <- vs.indices; j <- vs.indices if i < j)
          yield cos(e(vs(i)), e(vs(j)))
        ps.sum / ps.length
      }
      mmrPairSum += pairMean(selected); topPairSum += pairMean(topK); pairs += 1
    }
    assert(mmrPairSum / pairs < topPairSum / pairs,
      "MMR selections must be more diverse (lower mean pairwise cosine) " +
        "than relevance-only top-k on average")
  }

  test("q110: driver replay of the voting rounds matches; seeds clamped; coverage grows") {
    val e = VectorQueries.emb(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = SparkEntry.queries("q104_knn_graph")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = (edges ++ edges.map(_.swap)).distinct
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seedOf = e.keys.filter(_ % VectorQueries.LpSeedMod == 0)
      .map(v => v -> e(v)).toMap
    var cur: Map[Long, Option[Int]] =
      e.keys.map(v => v -> seedOf.get(v)).toMap
    for (_ <- 1 to VectorQueries.LpIters) {
      val next = e.keys.map { v =>
        val votes = adj.getOrElse(v, Array.empty[Long]).flatMap(cur(_))
          .groupBy(x => x).view.mapValues(_.size).toSeq
        val winner = if (votes.isEmpty) None
          else Some(votes.minBy { case (l, c) => (-c, l) }._1)
        v -> seedOf.get(v).orElse(winner)
      }.toMap
      cur = next
    }
    val got = SparkEntry.queries("q110_label_prop")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == e.size, "every node must be emitted")
    got.foreach { case (v, lbl, isSeed) =>
      assert(isSeed == (v % VectorQueries.LpSeedMod == 0))
      val want = cur(v).map(_.toLong).getOrElse(-1L)
      assert(lbl == want, s"node $v: spark $lbl != replay $want")
      if (isSeed) assert(lbl == e(v).toLong, s"seed $v must keep its corpus label")
    }
    val labeled = got.count(_._2 != -1L)
    assert(labeled > seedOf.size,
      "propagation must label beyond the seed set at this density")
  }

  test("q111: per-doc redundancy matches a driver replay; totals tie out") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val chunks = docs.flatMap { case (doc, ts) =>
      (0 until ts.length by TextQueries.ChunkStride).zipWithIndex.map {
        case (st, cid) =>
          (doc, cid.toLong, ts.slice(st, st + TextQueries.ChunkW).mkString(" "))
      }
    }
    val firstOf = chunks.groupBy(_._3).view
      .mapValues(_.map(c => (c._1, c._2)).min).toMap
    val expected = chunks.groupBy(_._1).map { case (doc, cs) =>
      doc -> (cs.length.toLong,
        cs.count(c => firstOf(c._3) != ((c._1, c._2))).toLong)
    }
    val got = SparkEntry.queries("q111_chunk_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet == expected.keySet)
    got.foreach { case (doc, nCh, nRed, frac) =>
      val (wantCh, wantRed) = expected(doc)
      assert(nCh == wantCh && nRed == wantRed,
        s"doc $doc: ($nCh, $nRed) != ($wantCh, $wantRed)")
      assert(math.abs(frac - nRed.toDouble / nCh) < 1e-12)
    }
    // global identity: redundant chunks = total chunks − distinct texts
    assert(got.map(_._3).sum ==
      chunks.length - chunks.map(_._3).distinct.length)
  }

  test("q116: NN-Descent strictly improves recall vs the cell-local graph") {
    val e = VectorQueries.emb(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // the brute-force truth: every node's true top-K
    val truth = e.keys.map { v =>
      v -> e.keys.filter(_ != v).toSeq
        .map(u => (u, cos(e(v), e(u))))
        .sortBy { case (u, c) => (-c, u) }
        .take(VectorQueries.KnnGraphK).map(_._1).toSet
    }.toMap
    def recall(edges: Array[(Long, Long)]): Double = {
      val bySrc = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val hits = truth.toSeq.map { case (v, t) =>
        bySrc.getOrElse(v, Set.empty).count(t.contains).toDouble / t.size
      }
      hits.sum / hits.size
    }
    val base = recall(SparkEntry.queries("q104_knn_graph")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))))
    val refined = recall(SparkEntry.queries("q116_nn_descent")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))))
    assert(refined > base,
      s"NN-Descent recall $refined must beat the cell-local graph's $base")
    // neighbor quality is monotone per node: each kept edge is at
    // least as good as the cell-local rank-equal edge (the refinement
    // only ever replaces a neighbor with a strictly better one)
    assert(refined >= base + 0.02,
      s"expected a material recall gain, got $base -> $refined")
  }

  test("q120: driver replay of the greedy beam search matches; answers reachable; beats entry") {
    val e = VectorQueries.emb(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // undirected adjacency of the q116 graph, exactly as q120 builds it
    val g = SparkEntry.queries("q116_nn_descent")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = (g ++ g.map(_.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val out = SparkEntry.queries("q120_graph_greedy")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val probes = e.keys.filter(_ < VectorQueries.GreedyProbes).toSeq.sorted
    probes.foreach { p =>
      // exact replay: entry 0, GreedyHops rounds of expand/score/cut
      var beam = Seq(0L)
      var ranked: Seq[(Long, Double)] = Nil
      for (_ <- 1 to VectorQueries.GreedyHops) {
        val cand = (beam ++ beam.flatMap(v => und.getOrElse(v, Set.empty)))
          .distinct.filter(_ != p)
        ranked = cand.map(v => (v, cos(e(p), e(v))))
          .sortBy { case (v, c) => (-c, v) }
          .take(VectorQueries.GreedyBeam)
        beam = ranked.map(_._1)
      }
      val want = ranked.take(VectorQueries.AnnK).zipWithIndex
        .map { case ((v, c), i) => (v, c, (i + 1).toLong) }
      val got = out.filter(_._1 == p).sortBy(_._4).map(t => (t._2, t._3, t._4))
      assert(got.map(t => (t._1, t._3)).toSeq == want.map(t => (t._1, t._3)),
        s"probe $p: greedy replay mismatch\n got: $got\nwant: $want")
      got.zip(want).foreach { case ((_, gc, _), (_, wc, _)) =>
        assert(math.abs(gc - wc) < 1e-4 + 1e-9,
          s"probe $p: cosine drifted: $gc vs $wc")
      }
      // the beam must end at least as well as where it started: best
      // found neighbor is no worse than the entry node's own similarity
      if (p != 0L) {
        val entrySim = cos(e(p), e(0L))
        assert(got.head._2 >= entrySim - 1e-4,
          s"probe $p: search did not improve on the entry node")
      }
    }
    assert(out.length == probes.length * VectorQueries.AnnK,
      "every probe answers with a full top-k")
  }

  test("q121: triplets match a driver replay of the cell mining; positives clear the band") {
    val e = VectorQueries.emb(spark, sf)
    val n = e.count()
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2).toArray).toMap
    val cells = operators.IvfIndex.cellAssignments(
        e, VectorQueries.ivfNList(n), Some(n))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val out = SparkEntry.queries("q121_contrastive_mine")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getLong(5)))
    assert(out.nonEmpty, "mining must produce triplets at this sf")
    val byAnchor = out.groupBy(_._1)
    byAnchor.foreach { case (a, rows) =>
      val mates = cells.keys.filter(v => v != a && cells(v) == cells(a)).toSeq
        .map(v => (v, cos(vecs(a), vecs(v))))
      // positive: rank-1 cellmate, and it clears the negative band
      val (wantPos, wantPosSim) = mates.minBy { case (v, c) => (-c, v) }
      assert(rows.forall(_._2 == wantPos), s"anchor $a: wrong positive")
      assert(wantPosSim >= VectorQueries.ContrastNegHi,
        s"anchor $a: positive below the band ceiling should emit nothing")
      assert(math.abs(rows.head._3 - wantPosSim) < 1e-4 + 1e-9)
      // negatives: top-K of the banded cellmates, ranked
      val wantNegs = mates.filter { case (_, c) =>
          c >= VectorQueries.ContrastNegLo && c < VectorQueries.ContrastNegHi }
        .sortBy { case (v, c) => (-c, v) }
        .take(VectorQueries.ContrastHardK).map(_._1)
      val gotNegs = rows.sortBy(_._6).map(_._4).toSeq
      assert(gotNegs == wantNegs, s"anchor $a: negs $gotNegs != $wantNegs")
      assert(!gotNegs.contains(rows.head._2),
        s"anchor $a: the positive leaked into the negatives")
      rows.foreach { t =>
        // t._5 is rounded to 4 decimals, so allow a half-ulp at the edges
        assert(t._5 < VectorQueries.ContrastNegHi + 1e-4 &&
          t._5 >= VectorQueries.ContrastNegLo - 1e-4,
          s"anchor $a: negative similarity outside the band: $t")
        assert(t._3 >= t._5, s"anchor $a: positive must outscore negatives")
      }
    }
    // every anchor whose cell gives it both sides of a triplet is mined
    val expected = cells.keys.filter { a =>
      val mates = cells.keys.filter(v => v != a && cells(v) == cells(a)).toSeq
        .map(v => cos(vecs(a), vecs(v)))
      mates.nonEmpty && mates.max >= VectorQueries.ContrastNegHi &&
        mates.exists(c => c >= VectorQueries.ContrastNegLo &&
          c < VectorQueries.ContrastNegHi)
    }
    assert(byAnchor.keySet == expected.toSet, "anchor coverage mismatch")
  }

  test("q114: clusters match a driver union-find over the thresholded edges; non-vacuous") {
    val edges = SparkEntry.queries("q104_knn_graph")(spark, sf).collect()
      .filter(_.getDouble(2) >= VectorQueries.SemClusterEps)
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
                 math.max(r.getLong(0), r.getLong(1)))).distinct
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElseUpdate(x, x) != x) x = parent(x)
      x
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => find(k) -> k).toSeq
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q114_semantic_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"cluster summary mismatch: $got vs $want")
    assert(got.nonEmpty && got.values.max >= 2, "need a real multi-member cluster")
    assert(got.values.sum < VectorQueries.emb(spark, sf).count(),
      "threshold must not glue the whole corpus into clusters")
  }

  test("q109: novelty counts sum to the corpus's distinct-trigram count; first doc fully novel") {
    val out = SparkEntry.queries("q109_novelty")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.foreach { case (doc, nTri, nNov, frac) =>
      assert(nNov >= 0 && nNov <= nTri, s"doc $doc: $nNov of $nTri novel")
      assert(math.abs(frac - nNov.toDouble / nTri) < 1e-12)
    }
    // Σ n_novel = number of distinct trigrams corpus-wide (each trigram
    // is novel exactly once, in its first container)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val allTris = docs.flatMap { case (_, ts) =>
      ts.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq.distinct
    }
    assert(out.map(_._3).sum == allTris.distinct.length,
      "sum of per-doc novel counts must equal the corpus distinct-trigram count")
    val firstDoc = out.minBy(_._1)
    assert(firstDoc._4 == 1.0, "the first document's trigrams are all novel")
  }
}
