package graft.chess

import graft.SparkTestBase
import org.json4s._
import org.json4s.jackson.JsonMethods

class ChessServerSpec extends SparkTestBase {
  import spark.implicits._
  implicit private val fmts: Formats = DefaultFormats

  private lazy val agg = ChessIngest.positionsAgg(
    ChessIngest.positionStream(spark,
      ChessIngest.parseGames(spark, spark.createDataset(Seq(SampleGames.pgn)),
        Core.Level.Human))).cache()

  test("request parses with defaults") {
    val r = ChessServer.parseRequest(
      s"""{"token":"t1","query":{"positions":[{"fen":"${Position.StartFen}"}]}}""")
    assert(r.token == "t1" && r.positions.head.move.isEmpty)
    assert(r.levels.toSet == Set("human", "engine", "server"))
    assert(r.fetchChildren)
  }

  test("explorer request returns nested counts matching golden corpus") {
    val req = ChessServer.parseRequest(
      s"""{"token":"q","query":{"positions":[{"fen":"${Position.StartFen}"}]}}""")
    val resp = JsonMethods.parse(ChessServer.execute(spark, agg, req))
    assert((resp \ "token").extract[String] == "q")
    val res0 = (resp \ "results") (0)
    // root: all 9 games transposed into "transpositions" bucket (no
    // incoming move specified -> nothing counts as continuation)
    val rootCount = (res0 \ "stats" \ "transpositions" \ "human")
      .extract[Map[String, Map[String, Long]]].values.map(_("count")).sum
    assert(rootCount == 9)
    // children: e2e4 seen 5 times, 2 white wins
    val e4w = (res0 \ "children" \ "e2e4" \ "continuations" \ "human" \ "w" \ "count")
      .extract[Long]
    assert(e4w == 2)
  }

  test("move field applies before probing and yields continuations") {
    // Probe (fen after 1.d4 d5 2.c4) + move e7e6: the TranspA game
    // reached the resulting position via e6 -> continuation count 1.
    val fen = {
      var p = Position.initial
      Seq("d4", "d5", "c4").foreach(m => p = p.make(San.parse(p, m).get))
      p.toFen
    }
    val req = ChessServer.parseRequest(
      s"""{"token":"m","query":{"positions":[{"fen":"$fen","move":"e7e6"}],"fetchChildren":false}}""")
    val resp = JsonMethods.parse(ChessServer.execute(spark, agg, req))
    val res0 = (resp \ "results") (0)
    val cont = (res0 \ "stats" \ "continuations" \ "human" \ "d" \ "count").extract[Long]
    assert(cont == 1, "TranspA (draw) reached it via e6")
    val trans = (res0 \ "stats" \ "transpositions" \ "human" \ "l" \ "count").extract[Long]
    assert(trans == 1, "TranspB (0-1) transposed into it")
  }

  test("duplicate FEN with different moves resolves each entry independently") {
    // Same fen twice — bare, and with move d7d5 pre-applied. Probe
    // identity must be the batch index, not the fen: merging them would
    // report the post-d5 position's stats for the bare entry too.
    val fen = Position.initial.make(San.parse(Position.initial, "d4").get).toFen
    val req = ChessServer.parseRequest(
      s"""{"token":"dup","query":{"positions":[{"fen":"$fen"},{"fen":"$fen","move":"d7d5"}],"fetchChildren":false}}""")
    val resp = JsonMethods.parse(ChessServer.execute(spark, agg, req))
    val counts = (0 to 1).map { i =>
      ((resp \ "results") (i) \ "stats" \ "transpositions" \ "human")
        .extract[Map[String, Map[String, Long]]].values.map(_("count")).sum
    }
    // entry 0 must match a direct single-probe query of the bare fen —
    // and the two entries must NOT merge into one number
    import org.apache.spark.sql.functions.{col, sum => ssum}
    val expected0 = QueryEngine.explore(spark, agg, Seq(fen -> None))
      .filter(col("childUci") === "" && col("select") === "transpositions")
      .agg(ssum(col("games"))).collect()(0).getLong(0)
    assert(counts(0) == expected0, s"bare entry drifted: $counts vs $expected0")
    assert(counts(0) != counts(1), "entries with same fen must not merge")
  }

  test("level/result filters narrow the response") {
    val req = ChessServer.parseRequest(
      s"""{"token":"f","query":{"positions":[{"fen":"${Position.StartFen}"}],
          "results":["w"],"fetchChildren":false}}""")
    val resp = JsonMethods.parse(ChessServer.execute(spark, agg, req))
    val stats = ((resp \ "results") (0) \ "stats" \ "transpositions" \ "human")
      .extract[Map[String, Map[String, Long]]]
    assert(stats.keySet == Set("w"))
    assert(stats("w")("count") == 3)
  }

  test("fetchFirstGame resolves headers via the J2 join") {
    val games = ChessIngest.parseGames(spark,
      spark.createDataset(Seq(SampleGames.pgn)), Core.Level.Human)
    val req = ChessServer.parseRequest(
      s"""{"token":"h","query":{"positions":[{"fen":"${Position.StartFen}"}],
          "results":["w"],"fetchChildren":false,"fetchFirstGame":true,"fetchLastGame":true}}""")
    val resp = JsonMethods.parse(
      ChessServer.execute(spark, agg, req, Some(games)))
    val w = (resp \ "results") (0) \ "stats" \ "transpositions" \ "human" \ "w"
    // first white-win game in the corpus is Scholar's Mate (gameId 0)
    assert((w \ "firstGame" \ "white").extract[String] == "Alpha")
    assert((w \ "firstGame" \ "event").extract[String] == "Scholar's Mate")
    // last white-win is the Promotion Game
    assert((w \ "lastGame" \ "white").extract[String] == "Ivy")
    assert((w \ "lastGame" \ "result").extract[String] == "w")
  }

  test("nested fetchingOptions shape (reference GUI protocol) is accepted") {
    val r = ChessServer.parseRequest(
      s"""{"token":"n","query":{"positions":[{"fen":"${Position.StartFen}"}],
          "fetchingOptions":{
            "continuations":{"fetchChildren":true,"fetchFirstGame":true},
            "transpositions":{"fetchChildren":false}}}}""")
    assert(r.fetchChildren, "OR across selects")
    assert(r.fetchFirstGame)
    assert(!r.fetchLastGame, "unmentioned flag in a present options object stays off")
    val r2 = ChessServer.parseRequest(
      s"""{"token":"n2","query":{"positions":[{"fen":"${Position.StartFen}"}]}}""")
    assert(r2.fetchChildren && !r2.fetchFirstGame, "flat defaults unchanged")
  }

  test("per-select fetchingOptions: only named selects, per-child headers honored") {
    val games = ChessIngest.parseGames(spark,
      spark.createDataset(Seq(SampleGames.pgn)), Core.Level.Human)
    val req = ChessServer.parseRequest(
      s"""{"token":"ps","query":{"positions":[{"fen":"${Position.StartFen}"}],
          "fetchingOptions":{
            "continuations":{"fetchChildren":true,"fetchFirstGameForEachChild":true},
            "transpositions":{"fetchChildren":false}}}}""")
    val resp = JsonMethods.parse(
      ChessServer.execute(spark, agg, req, Some(games)))
    val res0 = (resp \ "results") (0)
    // children: transpositions opted out of fetchChildren -> only the
    // continuations class appears under each child move
    val e4 = res0 \ "children" \ "e2e4"
    assert((e4 \ "continuations") != JNothing, "continuations child stats present")
    assert((e4 \ "transpositions") == JNothing,
      "transpositions set fetchChildren=false and must be omitted from children")
    // per-child headers: firstGame resolves on child stats (Scholar's
    // Mate, gameId 0, is the first game through 1.e4)
    val firstWhite = (e4 \ "continuations" \ "human" \ "w" \ "firstGame" \ "white")
    assert(firstWhite.extract[String] == "Alpha")
    // root stats carry NO headers: fetchFirstGame was claimed by no
    // select, and ForEachChild flags apply to children only
    val rootStats = res0 \ "stats" \ "transpositions" \ "human" \ "w"
    assert((rootStats \ "count") != JNothing)
    assert((rootStats \ "firstGame") == JNothing,
      "ForEachChild must not leak headers into root stats")
  }

  test("fetchingOptions naming one select omits the other everywhere") {
    val req = ChessServer.parseRequest(
      s"""{"token":"one","query":{"positions":[{"fen":"${Position.StartFen}"}],
          "fetchingOptions":{"continuations":{"fetchChildren":true}}}}""")
    assert(req.perSelect.keySet == Set("continuations"))
    val resp = JsonMethods.parse(ChessServer.execute(spark, agg, req))
    val res0 = (resp \ "results") (0)
    // a bare probe's ROOT rows are all transpositions -> root stats empty
    assert((res0 \ "stats").extract[Map[String, JValue]].isEmpty)
    // children carry only continuation stats
    val e4 = res0 \ "children" \ "e2e4"
    assert((e4 \ "continuations") != JNothing)
    assert((e4 \ "transpositions") == JNothing)
  }

  test("'all' select class merges continuations and transpositions") {
    val req = ChessServer.parseRequest(
      s"""{"token":"a","query":{"positions":[{"fen":"${Position.StartFen}"}],
          "fetchingOptions":{"all":{"fetchChildren":true}}}}""")
    assert(req.perSelect.keySet == Set("all"))
    val resp = JsonMethods.parse(ChessServer.execute(spark, agg, req))
    val res0 = (resp \ "results") (0)
    // root: only the synthesized class, totalling all 9 games
    val rootStats = (res0 \ "stats").extract[Map[String, JValue]]
    assert(rootStats.keySet == Set("all"))
    val rootCount = (res0 \ "stats" \ "all" \ "human")
      .extract[Map[String, Map[String, Long]]].values.map(_("count")).sum
    assert(rootCount == 9)
    // child e2e4: all = continuations(5 traversals) merged with any
    // transpositions; must be >= the 2 continuation white-wins and the
    // real classes must be absent
    val e4 = (res0 \ "children" \ "e2e4").extract[Map[String, JValue]]
    assert(e4.keySet == Set("all"))
    val e4w = (res0 \ "children" \ "e2e4" \ "all" \ "human" \ "w" \ "count").extract[Long]
    assert(e4w == 2)
  }

  test("retractions query kind: stored tier and synthesis tier") {
    val fen = ChessOracle.retractFen // after 1.d4 d5 2.c4 e6
    val resp = JsonMethods.parse(ChessServer.handle(spark, agg,
      s"""{"token":"r1","retractions":{"fen":"$fen","synthesize":true}}"""))
    assert((resp \ "token").extract[String] == "r1")
    // stored tier: the corpus reaches this position via e7e6 (TranspA)
    // and d7d5 (TranspB), one game each
    val stored = (resp \ "retractions").extract[List[Map[String, JValue]]]
      .map(m => m("uci").extract[String] -> m("count").extract[Long]).toMap
    assert(stored == Map("e7e6" -> 1L, "d7d5" -> 1L))
    // synthesis tier: both transitions were actually played, and their
    // predecessors occurred at least as often as the transition
    val syn = (resp \ "synthesized").extract[List[Map[String, JValue]]]
      .map(m => m("uci").extract[String] ->
        (m("predGames").extract[Long], m("playedGames").extract[Long])).toMap
    assert(syn.contains("e7e6") && syn.contains("d7d5"))
    assert(syn("e7e6")._2 == 1L && syn("d7d5")._2 == 1L)
    assert(syn.values.forall { case (pred, played) => pred >= played })
    // without synthesize the key is absent
    val bare = JsonMethods.parse(ChessServer.handle(spark, agg,
      s"""{"retractions":{"fen":"$fen"}}"""))
    assert((bare \ "synthesized") == JNothing)
    // explorer requests still route through handle()
    val exp = JsonMethods.parse(ChessServer.handle(spark, agg,
      s"""{"token":"e","query":{"positions":[{"fen":"${Position.StartFen}"}]}}"""))
    assert((exp \ "token").extract[String] == "e")
  }

  test("malformed move reports an error, not a crash") {
    val req = ChessServer.parseRequest(
      s"""{"token":"x","query":{"positions":[{"fen":"${Position.StartFen}","move":"e2e5"}]}}""")
    val out = try { ChessServer.execute(spark, agg, req); "ok" }
      catch { case e: IllegalArgumentException => "caught" }
    assert(out == "caught")
  }
}
