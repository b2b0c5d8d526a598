package graft

import org.apache.spark.sql.functions._

/** q122–q130 — the round-8 analytics additions (triangles, containment
  * dedup, rolling anomaly, temperature mixture, phrase search, source
  * fingerprints, winnowing, k-core, Matryoshka retrieval). The DuckDB
  * oracles prove cross-engine equality; these
  * specs pin semantics the hash compare can't express, via independent
  * driver-side recomputation from the raw tables (never via the
  * operator's own building blocks).
  */
class AnalyticsFamilySpec extends SparkTestBase {

  private def md5Bucket(id: Long): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Integer.parseInt(h.substring(0, 2), 16)
  }

  private def docTokens: Map[Long, Array[String]] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+"))
      .toMap

  test("q122: per-vertex triangle counts equal a driver recount over the q104 graph") {
    val edges = SparkEntry.queries("q104_knn_graph")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    und.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    val triPerVertex = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    var total = 0L
    und.foreach { case (u, v) =>
      (adj(u) intersect adj(v)).filter(_ > v).foreach { w =>
        total += 1
        Seq(u, v, w).foreach(x => triPerVertex(x) += 1)
      }
    }
    val out = SparkEntry.queries("q122_triangles")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == adj.keySet, "one row per graph vertex")
    out.foreach { case (v, (deg, nTri)) =>
      assert(deg == adj(v).size, s"vertex $v degree $deg != ${adj(v).size}")
      assert(nTri == triPerVertex(v),
        s"vertex $v n_tri $nTri != ${triPerVertex(v)}")
    }
    assert(out.values.map(_._2).sum == 3 * total,
      "per-vertex counts triple-count each triangle")
    assert(total > 0, "a k-NN graph over clustered vectors must close triangles")
  }

  test("q123: containment pairs equal a driver brute force; catches what Jaccard misses") {
    val toks = docTokens
    val sets = toks.collect { case (id, ts) if ts.length >= 3 =>
      id -> ts.sliding(3).map(_.mkString(" ")).toSet
    }
    // inverted index so the driver replay is shared-shingle pairs, not
    // blind n² (the same candidate-completeness argument the op makes)
    val inv = scala.collection.mutable.Map.empty[String, List[Long]]
      .withDefaultValue(Nil)
    sets.foreach { case (id, ss) => ss.foreach(g => inv(g) = id :: inv(g)) }
    val cand = inv.values.flatMap(ds =>
      for (a <- ds; b <- ds if a != b) yield (a, b)).toSet
    val want = cand.flatMap { case (a, b) =>
      val (sa, sb) = (sets(a), sets(b))
      val c = (sa intersect sb).size.toDouble / sa.size
      if (c >= 0.8) Some(((a, b),
        BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      else None
    }.toMap
    val out = SparkEntry.queries("q123_containment")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.keySet == want.keySet,
      s"pair sets differ: extra=${out.keySet -- want.keySet} missing=${want.keySet -- out.keySet}")
    out.foreach { case (k, c) =>
      assert(math.abs(c - want(k)) < 5e-5, s"pair $k containment $c != ${want(k)}")
    }
  }

  test("q123: a doc quoted inside a longer one passes containment but not Jaccard") {
    // the asymmetric point, on a planted fixture (the harness corpus's
    // near-dups are all full-doc copies, where the two coincide): a
    // short doc embedded verbatim in a 4x-longer host
    import spark.implicits._
    val short = (1 to 20).map(i => s"w$i").mkString(" ")
    val host = ((1 to 20).map(i => s"w$i") ++
      (1 to 60).map(i => s"x$i")).mkString(" ")
    val docs = Seq((1L, short), (2L, host)).toDF("doc_id", "text")
    val out = operators.NgramJoin.containedPairs(docs, 3, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.keySet == Set((1L, 2L)),
      s"expected exactly short-in-host, got ${out.keySet}")
    assert(out((1L, 2L)) == 1.0, "verbatim quote: containment must be 1.0")
    val jac = operators.NgramJoin.similarPairs(docs, 3, 0.8).collect()
    assert(jac.isEmpty, "Jaccard at the same bar must MISS the quoted doc")
  }

  test("q124: flagged anomalies equal a driver trailing-window replay") {
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 10000.0).toLong))
    val want = evs.groupBy(_._2).flatMap { case (_, rows) =>
      val ord = rows.sortBy(r => (r._3, r._1))
      ord.indices.flatMap { i =>
        val win = ord.slice(math.max(0, i - 10), i).map(_._4)
        val (n, v) = (win.length.toLong, ord(i)._4)
        if (n < 5) None
        else {
          val sm = win.sum
          val s2 = win.map(x => x * x).sum
          val num = (n * v - sm) * (n * v - sm)
          val den = 9L * (n * s2 - sm * sm)
          if (num > den) Some(ord(i)._1 -> ((n, num, den))) else None
        }
      }
    }
    val out = SparkEntry.queries("q124_anomaly")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(out.keySet == want.keySet,
      s"flag sets differ: extra=${out.keySet -- want.keySet} missing=${want.keySet -- out.keySet}")
    out.foreach { case (id, t) => assert(t == want(id), s"event $id: $t != ${want(id)}") }
    assert(out.nonEmpty, "a 3-sigma rule over telemetry must flag something")
  }

  test("q125: thresholds follow the ⌊√n⌋ temperature law and flatten the mix") {
    val langN = Tables.documents(spark, sf).groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = langN.values.sum
    val w = langN.map { case (l, n) => l -> math.floor(math.sqrt(n.toDouble)).toLong }
    val sw = w.values.sum
    val out = SparkEntry.queries("q125_temperature_mix")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out.keySet == langN.keySet)
    out.foreach { case (l, (nDocs, wl, thr, nKept)) =>
      assert(nDocs == langN(l) && wl == w(l))
      assert(thr == math.min(256L, 256L * (total / 2) * w(l) / (sw * langN(l))),
        s"lang $l threshold $thr off the integer law")
      // independent recount of the md5-bucket decision
      val kept = Tables.documents(spark, sf).filter(col("lang") === l)
        .select(col("doc_id")).collect()
        .count(r => md5Bucket(r.getLong(0)) < thr)
      assert(nKept == kept, s"lang $l n_kept $nKept != driver $kept")
    }
    // the point of temperature sampling: the rarest language keeps a
    // LARGER share of itself than the most common one
    val minL = langN.minBy(_._2)._1
    val maxL = langN.maxBy(_._2)._1
    val rate = (l: String) => out(l)._4.toDouble / out(l)._1
    assert(rate(minL) > rate(maxL),
      s"keep rates not flattened: $minL ${rate(minL)} vs $maxL ${rate(maxL)}")
  }

  test("q126: phrase hits equal a driver scan; queried phrases are the true top-3") {
    val toks = docTokens
    val occ = toks.toSeq.flatMap { case (id, ts) =>
      ts.sliding(3).filter(_.length == 3).map(w => (id, w.mkString(" ")))
    }
    val cnt = occ.groupBy(_._2).view.mapValues(_.size).toMap
    val top = cnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(3).map(_._1).toSet
    val want = occ.filter(o => top(o._2)).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val out = SparkEntry.queries("q126_phrase_search")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getString(0)) -> r.getLong(2)).toMap
    assert(out.keySet.map(_._2) == top, "searched phrases must be the top-3")
    assert(out == want.map { case ((d, p), c) => (d, p) -> c },
      "per-(phrase, doc) occurrence counts differ from the driver scan")
  }

  private def winnowFingerprints(text: String): Set[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long =
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12), 16)
    val k = operators.TextQueries.WinnowK
    val w = operators.TextQueries.WinnowW
    if (text.length < k + w - 1) Set.empty
    else {
      val hs = (0 to text.length - k).map(i => (i, h(text.substring(i, i + k))))
      (0 to hs.length - w).map { j =>
        // rightmost minimal hash in the window — robust winnowing
        hs.slice(j, j + w).reduceLeft((a, b) => if (b._2 <= a._2) b else a)._2
      }.toSet
    }
  }

  test("q128: pairs equal a driver winnowing replay (selection, df gate, and counts)") {
    val fps = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> winnowFingerprints(r.getString(1))).toMap
    val df = fps.toSeq.flatMap { case (id, hs) => hs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val rare = fps.view.mapValues(_.filter(h =>
      df(h) <= operators.TextQueries.WinnowMaxDf)).toMap
    val ids = fps.keys.toSeq.sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      shared = (rare(a) intersect rare(b)).size
      if shared >= operators.TextQueries.WinnowMinShared
    } yield (a, b) -> shared.toLong).toMap
    val out = SparkEntry.queries("q128_winnowing")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == want,
      s"extra=${out.keySet -- want.keySet} missing=${want.keySet -- out.keySet}")
    assert(out.nonEmpty, "the harness corpus has rare shared 8+-char runs")
  }

  test("q128: the native kernel equals the declarative selection, doc for doc") {
    import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}
    val docs = Tables.documents(spark, sf)
    val native = docs
      .filter(length(col("text")) >= operators.TextQueries.WinnowK +
        operators.TextQueries.WinnowW - 1)
      .select(col("doc_id"),
        explode(toCol(graft.functions.WinnowFingerprints(toExpr(col("text")),
          operators.TextQueries.WinnowK, operators.TextQueries.WinnowW))).as("h"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val sql = operators.TextQueries.winnowedFpSql(docs)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(native == sql,
      s"kernel drifted from the declarative twin on docs " +
        s"${(native.keySet ++ sql.keySet).filter(k => native.get(k) != sql.get(k)).take(5)}")
  }

  test("q128: the winnowing guarantee — a planted 40-char shared run is detected") {
    import spark.implicits._
    // two otherwise-alien docs sharing one 40-char substring; winnowing
    // guarantees ≥1 shared fingerprint per shared (k+w-1)-char window,
    // and a 40-char run yields enough windows to clear MinShared
    val run = "zqxjkvbwpfmg hyndltrc zuvqxw kjbpfmtz yd"
    val a = "aaaa bbbb cccc dddd " + run + " eeee ffff"
    val b = "1111 2222 3333 4444 5555 " + run + " 6666"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val out = operators.TextQueries.winnowedPairs(docs).collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L &&
      out.head.getLong(1) == 2L,
      s"planted pair not detected: ${out.mkString(",")}")
    assert(out.head.getLong(2) >= operators.TextQueries.WinnowMinShared)
  }

  test("q129: survivors and degrees equal a driver peel; the peel is non-trivial") {
    val e = operators.VectorQueries.emb(spark, sf)
    val n = e.count()
    var edges = operators.VectorQueries.cellPairsScored(e, n)
      .filter(col("sim") >= operators.VectorQueries.KCoreEps)
      .select(least(col("src"), col("dst")), greatest(col("src"), col("dst")))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val before = edges.flatMap(ed => Seq(ed._1, ed._2)).distinct.length
    for (_ <- 1 to operators.VectorQueries.KCoreRounds) {
      val deg = edges.flatMap(ed => Seq(ed._1, ed._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= operators.VectorQueries.KCoreK).keySet
      edges = edges.filter(ed => keep(ed._1) && keep(ed._2))
    }
    val want = edges.flatMap(ed => Seq(ed._1, ed._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = SparkEntry.queries("q129_kcore")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == want, s"survivor degree maps differ (${out.size} vs ${want.size})")
    assert(out.nonEmpty && out.size < before,
      s"peel must drop some vertices and keep some: $before -> ${out.size}")
  }

  test("q130: two-stage result equals the driver replay AND the brute top-k here") {
    val vecs = operators.VectorQueries.emb(spark, sf)
      .select(col("vec_id"), col("emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double], d: Int) = {
      var (dp, na, nb) = (0.0, 0.0, 0.0)
      for (i <- 0 until d) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dp / math.sqrt(na * nb)
    }
    val out = SparkEntry.queries("q130_matryoshka")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(4)) -> r.getLong(1)).toMap
    (0L until 10L).foreach { pid =>
      val p = vecs(pid)
      val others = vecs.toSeq.filter(_._1 != pid)
      val pool = others
        .map { case (id, v) =>
          (id, cos(p, v, operators.VectorQueries.MrlDim)) }
        .sortBy { case (id, t) => (-t, id) }
        .take(operators.VectorQueries.MrlPool)
      val top = pool
        .map { case (id, _) => (id, cos(p, vecs(id), p.length)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(operators.VectorQueries.AnnK)
      top.zipWithIndex.foreach { case ((id, _), i) =>
        assert(out((pid, i + 1L)) == id,
          s"probe $pid rank ${i + 1}: got ${out((pid, i + 1L))}, want $id")
      }
      // informativeness (the PqCodesSpec winMean pattern — these
      // embeddings are NOT MRL-trained, so exact brute recall is not
      // the contract): the prefix-pooled picks must still score far
      // above the corpus mean on the FULL vectors, i.e. the cheap
      // stage carries real signal
      val fullSims = others.map { case (id, v) => id -> cos(p, v, p.length) }
      val corpusMean = fullSims.map(_._2).sum / fullSims.length
      val pickMean = top.map(_._2).sum / top.length
      assert(pickMean > corpusMean + 0.05,
        s"probe $pid: staged picks mean $pickMean ~ corpus mean $corpusMean")
    }
  }

  test("q132: cross-source shared-chunk counts equal a driver recount") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val stride = operators.TextQueries.ChunkStride
    val w = operators.TextQueries.ChunkW
    val bySrc = docs.groupBy(_._2).view.mapValues(_.flatMap { case (_, _, t) =>
      val ts = t.trim.split("\\s+")
      (0 until ts.length by stride).map(st =>
        ts.slice(st, st + w).mkString(" "))
    }.toSet).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val want = (for {
      a <- srcs; b <- srcs if a < b
      sh = (bySrc(a) intersect bySrc(b)).size if sh > 0
    } yield (a, b) -> ((sh.toLong, bySrc(a).size.toLong, bySrc(b).size.toLong)))
      .toMap
    val out = SparkEntry.queries("q132_source_overlap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == want,
      s"extra=${out.keySet -- want.keySet} missing=${want.keySet -- out.keySet}")
    assert(out.nonEmpty, "the harness corpus has cross-source duplicate chunks")
  }

  test("q133: every multi-member cluster gets its true argmax tf-idf terms") {
    val members = SparkEntry.queries("q114_semantic_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = SparkEntry.queries("q133_cluster_labels")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(5)) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
    val byCluster = out.groupBy(_._1._1)
    assert(byCluster.keySet == members.keySet,
      "labels must cover exactly the q114 clusters")
    // driver replay: labels via union-find over the same thresholded
    // edges, then tf·N/df per (cluster, term), argmax-K by the total
    // order — independent of the operator's join/window machinery
    val edges = SparkEntry.queries("q104_knn_graph")(spark, sf).collect()
      .filter(_.getDouble(2) >= operators.VectorQueries.SemClusterEps)
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val comp = nodes.map(v => v -> find(v)).toMap
    val docToks = docTokens
    val n = docToks.size
    val tf = docToks.toSeq.flatMap { case (id, ts) => ts.map(t => (id, t)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dfm = tf.keys.toSeq.map(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    comp.values.toSet[Long].foreach { cid =>
      val docIds = comp.filter(_._2 == cid).keys.toSet
      val ctf = tf.toSeq.collect { case ((d, t), c) if docIds(d) => (t, c) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val top = ctf.toSeq.map { case (t, c) =>
        (t, c, dfm(t), c.toDouble * n / dfm(t)) }
        .sortBy { case (t, _, _, s) => (-s, t) }
        .take(operators.VectorQueries.ClusterLabelK)
      top.zipWithIndex.foreach { case ((t, c, df, s), i) =>
        val got = byCluster(cid).find(_._1._2 == i + 1L).get._2
        assert(got._1 == t && got._2 == c && got._3 == df,
          s"cluster $cid rank ${i + 1}: got $got want ($t,$c,$df)")
        assert(math.abs(got._4 - s) < 1e-9 * math.max(1.0, s),
          s"cluster $cid rank ${i + 1} score")
      }
    }
  }

  test("q127: pair cosines equal a driver recompute; self-norms consistent") {
    val srcCnt = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).trim.split("\\s+").map(t => (r.getString(0), t)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bySrc = srcCnt.groupBy(_._1._1).view
      .mapValues(_.map { case ((_, t), c) => t -> c }).toMap
    val out = SparkEntry.queries("q127_source_similarity")(spark, sf).collect()
    val srcs = bySrc.keySet.toSeq.sorted
    assert(out.length == srcs.size * (srcs.size - 1) / 2,
      "one row per unordered source pair")
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, "pairs must be canonicalized src_a < src_b")
      val (ca, cb) = (bySrc(a), bySrc(b))
      val dot = ca.collect { case (t, x) if cb.contains(t) => x * cb(t) }.sum
      val na2 = ca.values.map(x => x * x).sum
      val nb2 = cb.values.map(x => x * x).sum
      assert(r.getLong(2) == dot && r.getLong(3) == na2 && r.getLong(4) == nb2,
        s"pair ($a,$b) integer algebra differs")
      val cos = dot.toDouble / math.sqrt(na2.toDouble * nb2.toDouble)
      assert(math.abs(r.getDouble(5) - cos) < 5e-5, s"pair ($a,$b) cosine")
    }
  }

  test("q144: SCD2 history equals a driver lag-compress replay; version/validity invariants hold") {
    // independent replay from the raw events table: per-user (ts,
    // event_id)-ordered band sequence, run-compressed to changes
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        math.floor(r.getDouble(3) / 100.0).toLong))
    val byUser = raw.groupBy(_._1).view.mapValues(
      _.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).toSeq).toMap
    val want = byUser.flatMap { case (u, evs) =>
      val changes = evs.foldLeft(Vector.empty[(java.sql.Timestamp, Long)]) {
        case (acc, (_, ts, _, band)) =>
          if (acc.isEmpty || acc.last._2 != band) acc :+ ((ts, band)) else acc
      }
      changes.zipWithIndex.map { case ((ts, band), i) =>
        val validTo = if (i + 1 < changes.size) Some(changes(i + 1)._1) else None
        (u, ts, validTo, band, (i + 1).toLong, if (validTo.isEmpty) 1L else 0L)
      }
    }.toSet

    val rows = SparkEntry.queries("q144_scd2")(spark, sf).collect()
    val got = rows.map(r => (r.getLong(0), r.getTimestamp(1),
      Option(r.getTimestamp(2)), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == want,
      s"SCD2 history differs from the driver replay: " +
        s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")

    // structural invariants, asserted directly (not via the replay):
    val perUser = rows.groupBy(_.getLong(0))
    perUser.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_.getLong(4))
      // versions dense 1..k
      assert(sorted.map(_.getLong(4)).toSeq == (1L to vs.length.toLong),
        s"user $u versions not dense")
      // valid_to stitches to the successor's valid_from; bands change
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(2) == b.getTimestamp(1),
            s"user $u v${a.getLong(4)} valid_to must stitch to successor")
          assert(a.getLong(3) != b.getLong(3),
            s"user $u adjacent versions share a band — not run-compressed")
        case _ => ()
      }
      // exactly one open (is_current) version, and it is the last
      assert(vs.count(_.getLong(5) == 1L) == 1, s"user $u is_current count")
      assert(sorted.last.getLong(5) == 1L && sorted.last.getTimestamp(2) == null,
        s"user $u open version must be the last, with null valid_to")
    }
    // the history is non-trivial at this sf: some user must change bands
    assert(rows.length > perUser.size, "no user ever changed band — trivial input")
  }

  test("q151: rules equal a driver a-priori replay; support gate and symmetry hold") {
    // independent replay from the raw events table: baskets are
    // (user, day) distinct event-type sets, day = micros/86400000000
    val dayUs = 86400000000L
    val items = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1) / dayUs, r.getString(2)))
      .distinct
    val nBaskets = items.map(e => (e._1, e._2)).distinct.length.toLong
    val cx = items.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val cxy = items.groupBy(e => (e._1, e._2)).values
      .flatMap { basket =>
        val ts = basket.map(_._3).sorted
        for (i <- ts.indices; j <- (i + 1) until ts.length)
          yield (ts(i), ts(j))
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = cxy.filter { case (_, c) =>
      c * operators.RelationalQueries.AsrMinSupDen >= nBaskets
    }.flatMap { case ((x, y), c) =>
      Seq((x, y, c), (y, x, c))
    }.map { case (x, y, c) =>
      (x, y, c, cx(x), cx(y), nBaskets,
        c.toDouble / cx(x), c.toDouble * nBaskets / cx(x) / cx(y))
    }.toSet

    val rows = SparkEntry.queries("q151_assoc_rules")(spark, sf).collect()
    val got = rows.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5),
      r.getDouble(6), r.getDouble(7))).toSet
    assert(got == want,
      s"rules differ from the driver replay: extra=${(got -- want).take(3)} " +
        s"missing=${(want -- got).take(3)}")

    // structural invariants: both directions of every surviving pair,
    // never a self-rule, and the gate actually prunes something
    val dirs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(dirs.forall { case (x, y) => x != y && dirs((y, x)) },
      "every rule must appear in both directions, never x→x")
    assert(want.nonEmpty, "no rule survived — trivial input")
    assert(cxy.size * 2 > want.size,
      "the support gate pruned nothing — gate untested at this sf")
  }

  test("q164: skew profile equals a driver replay; bins partition the key set") {
    val counts = Tables.events(spark, sf).select(col("user_id")).collect()
      .map(_.getLong(0)).groupBy(identity).view.mapValues(_.length.toLong)
      .values.toSeq
    def b(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val wantBins = counts.groupBy(b).view
      .mapValues(cs => (cs.length.toLong, cs.sum)).toMap
    val (nk, tot, mx) = (counts.length.toLong, counts.sum, counts.max)
    val got = SparkEntry.queries("q164_key_skew")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getDouble(8)))
    assert(got.map(_._1).toSet == wantBins.keySet)
    got.foreach { case (bin, lo, hi, nb, rb, gnk, gtot, gmx, share) =>
      assert(lo == (1L << (bin - 1)) && hi == (1L << bin) - 1)
      assert((nb, rb) == wantBins(bin), s"bin $bin")
      assert(gnk == nk && gtot == tot && gmx == mx && share == mx.toDouble / tot)
    }
    // the bins tile the key set exactly — nothing dropped or counted
    // twice — and the profile is non-degenerate (≥ 2 occupied bins)
    assert(got.map(_._4).sum == nk && got.map(_._5).sum == tot)
    assert(got.length >= 2, "degenerate single-bin profile tests nothing")
  }

  test("q165: zone maps equal a driver replay; z-layout skips strictly more than the linear layout") {
    import operators.RelationalQueries.{ZBlockCells, ZBoxLo, ZBoxHi}
    val dayUs = 86400000000L
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime * 1000) / dayUs))
    val d0 = raw.map(_._2).min
    val dims = raw.map { case (u, day) =>
      (u % 32, math.min(day - d0, 31L)) }
    def z(ub: Long, db: Long): Long = (0 until 5).map(i =>
      (((ub >> i) & 1) << (2 * i)) + (((db >> i) & 1) << (2 * i + 1))).sum
    def zone(rows: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) =
      (rows.length.toLong, rows.map(_._1).min, rows.map(_._1).max,
        rows.map(_._2).min, rows.map(_._2).max)
    val want =
      dims.groupBy { case (ub, db) => ("zorder", z(ub, db) / ZBlockCells) }
        .view.mapValues(r => zone(r.toSeq)).toMap ++
      dims.groupBy { case (ub, _) => ("linear", ub) }
        .view.mapValues(r => zone(r.toSeq)).toMap
    val got = SparkEntry.queries("q165_zorder")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getBoolean(7)))).toMap
    assert(got.keySet == want.keySet, "block sets differ")
    got.foreach { case (k, (n, ul, uh, dl, dh, touched)) =>
      assert((n, ul, uh, dl, dh) == want(k), s"block $k zone map")
      assert(touched ==
        (ul <= ZBoxHi && uh >= ZBoxLo && dl <= ZBoxHi && dh >= ZBoxLo))
    }
    // each layout tiles every row exactly once, and the operator's
    // reason to exist holds: the box query reads strictly fewer rows
    // under z-blocks than under single-key blocks (and some, not zero)
    Seq("zorder", "linear").foreach { l =>
      assert(got.collect { case ((`l`, _), v) => v._1 }.sum == dims.length)
    }
    def touchedRows(l: String): Long =
      got.collect { case ((`l`, _), v) if v._6 => v._1 }.sum
    assert(touchedRows("zorder") > 0, "the box selects nothing")
    assert(touchedRows("zorder") < touchedRows("linear"),
      s"z-order (${touchedRows("zorder")}) must beat linear " +
        s"(${touchedRows("linear")})")
  }

  test("q182: burst scores equal a driver trailing-window replay; the bar binds both ways") {
    import operators.RelationalQueries.{BurstWindowUs, BurstK}
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000))
    val want = evs.groupBy(_._1).view.mapValues { rows =>
      val ts = rows.map(_._2).sorted
      val maxBurst = ts.map(t =>
        ts.count(u => u >= t - BurstWindowUs && u <= t).toLong).max
      (rows.length.toLong, maxBurst)
    }.toMap
    val got = SparkEntry.queries("q182_burst_detect")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (u, (n, mb, fl)) =>
      assert((n, mb) == want(u), s"user $u")
      assert(fl == (mb >= BurstK))
    }
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "the burst bar must flag some users and clear others")
  }

  test("q181: segments equal a full driver replay; F and M quartiles genuinely spread") {
    import operators.RelationalQueries.RfmBins
    val dayUs = 86400000000L
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value")).collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime * 1000) / dayUs,
        r.getDouble(2)))
    val dmax = evs.map(_._2).max
    val users = evs.groupBy(_._1).view.mapValues { rows =>
      ((dmax - rows.map(_._2).max).toDouble, rows.length.toDouble,
        rows.map(r => BigDecimal(r._3).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble)
    }.toMap
    def quartiles(ms: Map[Long, Double]): Map[Long, Long] = {
      val (lo, hi, n) = (ms.values.min, ms.values.max, ms.size.toLong)
      def binOf(v: Double): Long = math.min(RfmBins - 1,
        math.max(0L, math.floor((v - lo) / (hi - lo) * RfmBins).toLong))
      val bins = ms.view.mapValues(binOf).toMap
      val cnt = bins.values.groupBy(identity).view.mapValues(_.size.toLong)
      val sortedBins = cnt.keys.toSeq.sorted
      var cum = 0L
      val cums = sortedBins.map { b => cum += cnt(b); b -> cum }.toMap
      def pick(p: Long): Long =
        sortedBins.find(b => cums(b) * 100 >= p * n).get
      val (q25, q50, q75) = (pick(25), pick(50), pick(75))
      bins.view.mapValues(b => 1L + (if (b > q25) 1 else 0) +
        (if (b > q50) 1 else 0) + (if (b > q75) 1 else 0)).toMap
    }
    val rq = quartiles(users.view.mapValues(_._1).toMap)
    val fq = quartiles(users.view.mapValues(_._2).toMap)
    val mq = quartiles(users.view.mapValues(_._3).toMap)
    val want = users.keys.groupBy(u => (rq(u), fq(u), mq(u)))
      .view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q181_rfm")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got == want,
      s"extra=${(got.toSet -- want.toSet).take(3)} missing=${(want.toSet -- got.toSet).take(3)}")
    assert(got.values.sum == users.size.toLong, "users lost")
    // F and M must genuinely spread across all four buckets (R may
    // collapse under heavy ties — the documented bin-bracket rule)
    assert(got.keys.map(_._2).toSet == Set(1L, 2L, 3L, 4L), "F collapsed")
    assert(got.keys.map(_._3).toSet == Set(1L, 2L, 3L, 4L), "M collapsed")
  }

  test("q174: ladder profiles equal a driver replay; generalization actually helps") {
    import operators.RelationalQueries.KAnonK
    val nations = Tables.nation(spark, sf).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](2).longValue)
      .toMap
    val rows = Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect()
      .map(r => (nations(r.getAs[Number](0).longValue), r.getString(1),
        math.floor(r.getDouble(2) / 2000).toLong))
    def profile(key: ((Long, String, Long)) => Any): (Long, Long, Long, Long, Long) = {
      val ks = rows.groupBy(key).values.map(_.length.toLong).toSeq
      (ks.length.toLong, ks.min, ks.count(_ < KAnonK).toLong,
        ks.filter(_ < KAnonK).sum, ks.sum)
    }
    val want = Map(
      0L -> profile(identity),
      1L -> profile(t => (t._1, t._2)),
      2L -> profile(_._1))
    val got = SparkEntry.queries("q174_k_anonymity")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6), r.getBoolean(7)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    got.foreach { case (lvl, (ng, mk, rg, rr, frac, anon)) =>
      val (wng, wmk, wrg, wrr, wn) = want(lvl)
      assert((ng, mk, rg, rr) == ((wng, wmk, wrg, wrr)), s"level $lvl")
      assert(frac == wrr.toDouble / wn && anon == (mk >= KAnonK))
    }
    // the ladder's reason to exist: generalizing must monotonically
    // shrink risk, and the ladder must cross the bar somewhere
    assert(got(0L)._4 >= got(1L)._4 && got(1L)._4 >= got(2L)._4)
    assert(got.values.exists(!_._6) && got.values.exists(_._6),
      "ladder never crosses the k-anonymity bar — nothing audited")
  }

  test("q175: attribution equals a driver replay; the two models genuinely differ") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value")).collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime * 1000,
        r.getLong(2)), r.getString(3), r.getDouble(4)))
    val attributed = evs.groupBy(_._1).values.flatMap { rows =>
      var lt: Option[String] = None
      var ft: Option[String] = None
      rows.sortBy(_._2).flatMap { case (_, _, tpe, v) =>
        val out = if (tpe == "purchase")
          Some((lt.getOrElse("direct"), ft.getOrElse("direct"), v))
        else None
        if (tpe == "view" || tpe == "click") {
          lt = Some(tpe); if (ft.isEmpty) ft = Some(tpe)
        }
        out
      }
    }.toSeq
    def agg(sel: ((String, String, Double)) => String) =
      attributed.groupBy(sel).view.mapValues { vs =>
        (vs.length.toLong,
          vs.map(v => BigDecimal(v._3).setScale(6, BigDecimal.RoundingMode.HALF_UP))
            .sum.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toMap
    val want = Map("last" -> agg(_._1), "first" -> agg(_._2))
    val got = SparkEntry.queries("q175_attribution")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet ==
      want.toSeq.flatMap { case (m, cs) => cs.keys.map(m -> _) }.toSet)
    got.foreach { case ((m, ch), v) =>
      assert(v == want(m)(ch), s"$m/$ch: got $v want ${want(m)(ch)}")
    }
    // ordering matters: the two models must disagree on some channel
    val lastM = got.collect { case (("last", c), v) => c -> v }.toMap
    val firstM = got.collect { case (("first", c), v) => c -> v }.toMap
    assert(lastM != firstM, "first- and last-touch agree everywhere — order vacuous")
  }

  test("q176: percentile masses equal a driver replay and are monotone in value") {
    import operators.RelationalQueries.{DiscBins, DiscMass}
    val vals = Tables.events(spark, sf)
      .select(col("event_id"), col("value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (lo, hi, n) = (vals.values.min, vals.values.max, vals.size.toLong)
    def binOf(v: Double): Long = math.min(DiscBins - 1,
      math.max(0L, math.floor((v - lo) / (hi - lo) * DiscBins).toLong))
    val cnt = vals.values.groupBy(binOf).view.mapValues(_.size.toLong).toMap
    def cumBelow(b: Long): Long = cnt.filter(_._1 < b).values.sum
    val got = SparkEntry.queries("q176_discretize")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == vals.keySet)
    got.foreach { case (id, (bin, pm)) =>
      assert(bin == binOf(vals(id)) && pm == cumBelow(bin) * DiscMass / n,
        s"event $id")
    }
    // the transform's contract: monotone in the raw value, and spread
    // (not everything in one bin)
    val sorted = vals.toSeq.sortBy(_._2).map(t => got(t._1)._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    assert(got.values.map(_._1).toSet.size > 10, "degenerate binning")
  }

  test("q177: decayed masses equal a driver replay; decay is non-vacuous") {
    import operators.RelationalQueries.{PopMass, PopHalfLifeDays}
    val dayUs = 86400000000L
    val days = Tables.events(spark, sf)
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0), (r.getTimestamp(1).getTime * 1000) / dayUs))
    val dmax = days.map(_._2).max
    val want = days.groupBy(_._1).view.mapValues { rows =>
      (rows.length.toLong, rows.map { case (_, d) =>
        PopMass >> ((dmax - d) / PopHalfLifeDays).toInt }.sum)
    }.toMap
    val t = want.values.map(_._2).sum
    val got = SparkEntry.queries("q177_decayed_popularity")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (tpe, (n, m, share)) =>
      assert((n, m) == want(tpe) && share == m.toDouble / t, tpe)
    }
    // decay must bite: old events weigh strictly less than PopMass,
    // and the freshest events still weigh exactly PopMass
    assert(days.exists { case (_, d) => dmax - d >= PopHalfLifeDays })
    got.foreach { case (tpe, (n, m, _)) =>
      assert(m < n * PopMass, s"$tpe: no event decayed") }
    assert(days.exists { case (_, d) => d == dmax }, "no full-weight events")
  }

  test("q169: ordered supports equal a driver replay; direction is non-vacuous; gate prunes") {
    import operators.RelationalQueries.SeqSupDen
    val dayUs = 86400000000L
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type")).collect()
      .map { r =>
        val us = r.getTimestamp(1).getTime * 1000
        ((r.getLong(0), us / dayUs), r.getString(2), us)
      }
    val baskets = evs.groupBy(_._1)
    val nBaskets = baskets.size.toLong
    val sup = scala.collection.mutable.Map.empty[(String, String), Long]
    val nBoth = scala.collection.mutable.Map.empty[(String, String), Long]
    baskets.values.foreach { rows =>
      val byType = rows.groupBy(_._2).view
        .mapValues(rs => (rs.map(_._3).min, rs.map(_._3).max)).toMap
      for (x <- byType.keys; y <- byType.keys if x != y) {
        nBoth((x, y)) = nBoth.getOrElse((x, y), 0L) + 1
        if (byType(x)._1 < byType(y)._2)
          sup((x, y)) = sup.getOrElse((x, y), 0L) + 1
      }
    }
    val want = sup.filter { case (k, s) => s * SeqSupDen >= nBaskets }
      .map { case ((x, y), s) =>
        (x, y, s, nBoth((x, y)), nBaskets, s.toDouble / nBoth((x, y))) }
      .toSet
    val got = SparkEntry.queries("q169_seq_patterns")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    assert(got == want,
      s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    // the operator's reasons to exist: the gate prunes something, and
    // ORDER matters — some surviving x→y has a different support than
    // its reverse
    assert(want.nonEmpty, "no pattern survived")
    assert(sup.size > want.size, "the support gate pruned nothing")
    assert(got.exists { case (x, y, s, _, _, _) =>
      sup.getOrElse((y, x), -1L) != s },
      "every pattern is direction-symmetric — sequence adds nothing")
  }

  test("q166: A/B counts and the z-squared gate equal a driver replay") {
    import operators.RelationalQueries.{AbConvK, AbZsqNum, AbZsqDen}
    val uc = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val allUsers = uc.keySet.map(_._1)
    val n = Array(0L, 1L).map(v => v -> allUsers.count(_ % 2 == v).toLong).toMap
    val types = uc.keySet.map(_._2)
    val got = SparkEntry.queries("q166_ab_test")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7))))
      .toMap
    assert(got.keySet == types)
    types.foreach { t =>
      val c = Array(0L, 1L).map(v => v -> allUsers.count(u =>
        u % 2 == v && uc.getOrElse((u, t), 0L) >= AbConvK).toLong).toMap
      val (n1, c1, n2, c2, r1, r2, sig) = got(t)
      assert(n1 == n(0L) && c1 == c(0L) && n2 == n(1L) && c2 == c(1L),
        s"$t counts: got ($n1,$c1,$n2,$c2) want (${n(0L)},${c(0L)},${n(1L)},${c(1L)})")
      assert(r1 == c1.toDouble / n1 && r2 == c2.toDouble / n2)
      val diff = BigInt(c1) * n2 - BigInt(c2) * n1
      val wantSig = diff * diff * (n1 + n2) * AbZsqDen >
        BigInt(AbZsqNum) * n1 * n2 * (c1 + c2) * (n1 + n2 - c1 - c2)
      assert(sig == wantSig, s"$t significance")
    }
    // conversion is non-trivial (neither empty nor saturated), and an
    // A/A split must not call everything significant
    assert(got.values.exists(v => v._2 > 0 || v._4 > 0), "no converters")
    assert(got.values.exists(v => v._2 < v._1 || v._4 < v._3), "saturated")
    assert(got.values.exists(!_._7),
      "every type significant under a null split — the bar is broken")
  }

  test("q162: the windowed closed form equals the textbook CUSUM recursion; alarm bar binds both ways") {
    import operators.RelationalQueries.CusumHsq
    val dayUs = 86400000000L
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0),
        (r.getTimestamp(1).getTime * 1000) / dayUs))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((tpe, day), x) => (tpe, day, x) }
    val got = SparkEntry.queries("q162_cusum")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6)))).toMap
    assert(got.keySet == daily.map(t => (t._1, t._2)).toSet)
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val series = rows.sortBy(_._2)
      val t = series.map(_._3).sum
      val n = series.length.toLong
      // the recursion the closed form must reproduce:
      // S_t = max(0, S_{t-1} + (x_t·n − T))
      var sRec = 0L
      series.foreach { case (_, day, x) =>
        sRec = math.max(0L, sRec + (x * n - t))
        val (gx, gt, gn, gs, galarm) = got((tpe, day))
        assert(gx == x && gt == t && gn == n,
          s"($tpe,$day) rollup mismatch")
        assert(gs == sRec,
          s"($tpe,$day): windowed S $gs != recursion $sRec")
        val wantAlarm =
          BigInt(sRec) * BigInt(sRec) >= BigInt(CusumHsq) * t * n
        assert(galarm == wantAlarm, s"($tpe,$day) alarm")
      }
    }
    // the bar binds both ways on this corpus: alarms exist, and at
    // least one whole series stays quiet (a bar below all noise or
    // above all signal tests nothing)
    val byType = got.toSeq.groupBy(_._1._1)
    assert(byType.values.exists(_.exists(_._2._5)), "no alarms anywhere")
    assert(byType.values.exists(rows => !rows.exists(_._2._5)),
      "every series alarms — the bar is below the noise floor")
  }

  test("q161: transitions equal a driver bigram replay; rows are mass-conserving; one modal next per state") {
    import operators.RelationalQueries.MarkovMass
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2),
        r.getString(3)))
    val bigrams = evs.groupBy(_._1).values.flatMap { rows =>
      val seq = rows.sortBy(r => (r._2, r._3)).map(_._4)
      seq.zip(seq.tail)
    }.toSeq
    val cnt = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = cnt.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val got = SparkEntry.queries("q161_markov")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.map(r => (r._1, r._2)).toSet == cnt.keySet,
      "transition support differs from the replay")
    got.foreach { case (a, b, c, rt, pm, _) =>
      assert(c == cnt((a, b)) && rt == tot(a) && pm == c * MarkovMass / rt,
        s"($a→$b): got ($c, $rt, $pm)")
    }
    // per-state invariants: masses conserve up to floor loss (< one
    // unit per successor), and exactly one modal next state — the
    // (cnt DESC, type ASC) argmax, re-derived independently
    got.groupBy(_._1).foreach { case (a, rows) =>
      val mass = rows.map(_._5).sum
      assert(mass <= MarkovMass && mass > MarkovMass - rows.length,
        s"state $a: mass $mass drifted beyond floor-loss bounds")
      val tops = rows.filter(_._6)
      val want = rows.minBy(r => (-r._3, r._2))
      assert(tops.length == 1 && tops.head == want,
        s"state $a: modal next ${tops.toSeq} != $want")
    }
  }

  test("q215: grouping sets equal the three driver rollups, level by level") {
    val os = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    def roll(key: ((String, String, Double)) => (String, String))
      : Map[(String, String), (Long, Double)] =
      os.groupBy(key).map { case (k, vs) =>
        k -> ((vs.length.toLong, vs.map(v => BigDecimal(v._3)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    val want = roll(v => (v._1, v._2)) ++ roll(v => (v._1, "ALL")) ++
      roll(_ => ("ALL", "ALL"))
    val got = SparkEntry.queries("q215_grouping_sets")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == want, s"lattice:\n$got\n$want")
    // exactly the three requested levels — no cube spillover
    assert(got.keySet.count(_._2 == "ALL") ==
      os.map(_._1).distinct.length + 1, "unexpected lattice levels")
  }

  test("q216: reconciliation equals a driver full-outer replay; orphans exist both ways or are counted") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val l = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val og = o.groupBy(_._1).view.mapValues(vs => (vs.length.toLong,
      vs.map(v => BigDecimal(v._2).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum)).toMap
    val lg = l.groupBy(_._1).view.mapValues(vs => (vs.length.toLong,
      vs.map(v => BigDecimal(v._2).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum)).toMap
    val want = (og.keySet ++ lg.keySet).groupBy { k =>
      (og.contains(k), lg.contains(k)) match {
        case (true, true) => "both"
        case (true, false) => "order_only"
        case _ => "lineitem_only"
      }
    }.map { case (side, ks) =>
      side -> ((ks.size.toLong,
        ks.toSeq.map(k => og.get(k).map(_._1).getOrElse(0L)).sum,
        ks.toSeq.map(k => lg.get(k).map(_._1).getOrElse(0L)).sum,
        ks.toSeq.map(k => og.get(k).map(_._2).getOrElse(BigDecimal(0))).sum
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        ks.toSeq.map(k => lg.get(k).map(_._2).getOrElse(BigDecimal(0))).sum
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = SparkEntry.queries("q216_reconcile")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got == want, s"ledger:\n$got\n$want")
    // conservation: the ledger accounts for every row and cent
    assert(got.values.map(_._2).sum == o.length.toLong &&
      got.values.map(_._3).sum == l.length.toLong, "rows lost")
  }

  test("q195: the melt equals a driver long-form replay, measure by measure") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_discount"), col("l_tax")).collect()
      .flatMap(r => Seq(
        (r.getString(0), "l_extendedprice", r.getDouble(1)),
        (r.getString(0), "l_discount", r.getDouble(2)),
        (r.getString(0), "l_tax", r.getDouble(3))))
    val want = rows.groupBy(r => (r._1, r._2)).map { case (k, vs) =>
      val tot = vs.map(v => BigDecimal(v._3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      k -> ((vs.length.toLong, tot, vs.map(_._3).min, vs.map(_._3).max))
    }
    val got = SparkEntry.queries("q195_unpivot")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got == want, s"melt rollup:\n$got\n$want")
    // the melt must conserve rows: 3 long rows per fact row
    assert(got.values.map(_._1).sum == rows.length.toLong)
  }

  test("q204: EWMA masses equal a driver dot-product replay; trend flips both ways") {
    import operators.RelationalQueries.{EwmaK, ewmaWeight}
    // the weight table must BE the cleared-denominator (3/4)^j ladder
    assert(ewmaWeight(0) == math.pow(4, EwmaK - 1).toLong)
    (0 until EwmaK - 1).foreach(j =>
      assert(4L * ewmaWeight(j + 1) == 3L * ewmaWeight(j), s"j=$j"))
    val dayUs = 86400000000L
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime * 1000 / dayUs))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (d0, d1) = (daily.keys.map(_._2).min, daily.keys.map(_._2).max)
    val types = daily.keys.map(_._1).toSeq.distinct
    val want = (for { t <- types; day <- d0 to d1 } yield {
      val mass = (0 until EwmaK).map(j =>
        BigInt(daily.getOrElse((t, day - j), 0L)) * ewmaWeight(j)).sum
      (t, day) -> ((daily.getOrElse((t, day), 0L), mass))
    }).toMap
    val got = SparkEntry.queries("q204_ewma_trend")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got.keySet == want.keySet, "grid differs")
    got.foreach { case (k, (n, m, rising)) =>
      assert(n == want(k)._1 && m == want(k)._2.toDouble, s"$k")
      val prev = want.get((k._1, k._2 - 1))
      assert(rising == prev.exists(p => want(k)._2 > p._2), s"$k rising")
    }
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "the trend flag must flip both ways on this corpus")
  }

  test("q208: winsorized stats equal a driver histogram replay; clipping is non-vacuous") {
    import operators.RelationalQueries.{DiscBins, WinsorLoPct, WinsorHiPct}
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val want = evs.groupBy(_._1).map { case (t, rows) =>
      val vs = rows.map(_._2)
      val (lo, hi, n) = (vs.min, vs.max, vs.length.toLong)
      def binOf(v: Double): Long = if (hi == lo) 0L else math.min(
        DiscBins - 1, math.max(0L,
          math.floor((v - lo) / (hi - lo) * DiscBins).toLong))
      val cnt = vs.map(binOf).groupBy(identity).view.mapValues(_.size.toLong)
      val sorted = cnt.keys.toSeq.sorted
      var c = 0L
      val cums = sorted.map { b => c += cnt(b); b -> c }.toMap
      def pick(p: Long): Long = sorted.find(b => cums(b) * 100 >= p * n).get
      val (bLo, bHi) = (pick(WinsorLoPct), pick(WinsorHiPct))
      val loE = lo + bLo.toDouble * (hi - lo) / DiscBins
      val hiE = lo + (bHi + 1).toDouble * (hi - lo) / DiscBins
      def dsum(xs: Seq[Double]): Double = xs.map(x => BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      t -> ((n, loE, hiE, vs.count(_ < loE).toLong, vs.count(_ > hiE).toLong,
        dsum(vs.toSeq) / n, dsum(vs.toSeq.map(v =>
          math.min(math.max(v, loE), hiE))) / n))
    }
    val got = SparkEntry.queries("q208_winsor_stats")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6),
        r.getDouble(7)))).toMap
    assert(got == want, s"winsor replay:\n$got\n$want")
    assert(got.values.exists(v => v._4 > 0 || v._5 > 0),
      "clipping must be non-vacuous on this corpus")
    assert(got.values.forall(v => v._4 * 100 <= v._1 * WinsorLoPct + 100 &&
      v._5 * 100 <= v._1 * (100 - WinsorHiPct) + 100),
      "clip fractions must respect the percentile bars (±1 bin bracket)")
  }

  test("q209: entry paths equal a driver replay; ranks are the (count desc, path) order") {
    val dayUs = 86400000000L
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000,
        r.getString(2), r.getLong(3)))
    val paths = evs.groupBy(e => (e._1, e._2 / dayUs)).values.map { rows =>
      rows.sortBy(e => (e._2, e._4)).take(3).map(_._3).mkString(">")
    }
    val cnt = paths.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // the rank() ordering (n DESC, path ASC) is a total order — no two
    // rows tie on BOTH keys — so rank == row position
    val order = cnt.toSeq.sortBy { case (p, n) => (-n, p) }
    val rnk = order.zipWithIndex.map { case ((p, _), i) =>
      p -> (i + 1).toLong }.toMap
    val got = SparkEntry.queries("q209_session_paths")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(got.keySet == cnt.keySet, "path set differs")
    got.foreach { case (p, (n, rk, top)) =>
      assert(n == cnt(p) && rk == rnk(p) && top == (rk <= 10), s"path $p")
    }
    // session conservation: one path per (user, day) session
    assert(got.values.map(_._1).sum ==
      evs.map(e => (e._1, e._2 / dayUs)).distinct.length.toLong)
  }

  test("q210: the first-seen identity equals brute cumulative distincts; curve is monotone") {
    val dayUs = 86400000000L
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("ts")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 / dayUs))
    val (d0, d1) = (evs.map(_._3).min, evs.map(_._3).max)
    val types = evs.map(_._1).distinct
    val want = (for { t <- types; day <- d0 to d1 } yield {
      // BRUTE definition: distinct users among ALL events up to `day`
      val cum = evs.filter(e => e._1 == t && e._3 <= day)
        .map(_._2).distinct.length.toLong
      val fresh = evs.filter(e => e._1 == t).groupBy(_._2)
        .count(_._2.map(_._3).min == day).toLong
      (t, day) -> ((fresh, cum))
    }).toMap
    val got = SparkEntry.queries("q210_cumulative_distinct")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == want, s"cumulative curve:\n${(got.toSet -- want.toSet).take(3)}")
    types.foreach { t =>
      val curve = (d0 to d1).map(day => got((t, day))._2)
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
        s"$t: curve not monotone")
      assert(curve.last ==
        evs.filter(_._1 == t).map(_._2).distinct.length.toLong,
        s"$t: final cum != distinct users")
    }
  }
}
