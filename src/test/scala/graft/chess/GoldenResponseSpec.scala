package graft.chess

import graft.SparkTestBase
import org.json4s.jackson.JsonMethods

/** Protocol stability gate (SURVEY.md §5.2): the full nested JSON for a
  * canonical request is pinned in src/test/resources/golden/ — any
  * change to response shape, key naming, or the sample-corpus numbers
  * fails here before it breaks a client.
  */
class GoldenResponseSpec extends SparkTestBase {
  import spark.implicits._

  test("startpos white-wins response matches the checked-in golden JSON") {
    val agg = ChessIngest.positionsAgg(
      ChessIngest.positionStream(spark,
        ChessIngest.parseGames(spark, spark.createDataset(Seq(SampleGames.pgn)),
          Core.Level.Human)))
    val req = ChessServer.parseRequest(
      s"""{"token":"cli1","query":{"positions":[{"fen":"${Position.StartFen}"}],"results":["w"]}}""")
    val actual = JsonMethods.parse(ChessServer.execute(spark, agg, req))
    val golden = JsonMethods.parse(scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/startpos_white_wins.json"), "UTF-8").mkString)
    assert(actual == golden,
      s"response drifted from golden:\n${JsonMethods.pretty(JsonMethods.render(actual))}")
  }

  private def goldenOf(name: String) =
    JsonMethods.parse(scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/golden/$name"), "UTF-8").mkString)

  test("full per-select flag lattice matches the checked-in golden JSON") {
    // GoldenMatrix exercises every fetch flag in BOTH polarities across
    // continuations / transpositions / all, root AND child headers, on
    // two probes (bare startpos; fen+move). Regenerate after an intended
    // protocol change with `sbt "Test/runMain graft.chess.GoldenGen"`.
    val (matrix, retract) = GoldenMatrix.responses(spark)
    assert(JsonMethods.parse(matrix) == goldenOf("flag_matrix.json"),
      s"flag-matrix response drifted:\n${JsonMethods.pretty(JsonMethods.parse(matrix))}")
    assert(JsonMethods.parse(retract) == goldenOf("retractions_synth.json"),
      s"retractions response drifted:\n${JsonMethods.pretty(JsonMethods.parse(retract))}")
  }

  test("the flag matrix golden honors every cell") {
    import org.json4s._
    val golden = goldenOf("flag_matrix.json")
    val res0 = (golden \ "results") (0)
    // continuations: fetchFirstGame=T, fetchLastGame=F (root); children
    // carry lastGame (ForEachChild last=T) but not firstGame (first=F).
    // A bare probe's root rows are all transpositions, so root-level
    // cont flags are checked on the "all" class instead:
    // all: first=F, last=T at root; first=T, last=F per child.
    val rootAllW = res0 \ "stats" \ "all" \ "human" \ "w"
    assert((rootAllW \ "lastGame") != JNothing, "all.fetchLastGame=T at root")
    assert((rootAllW \ "firstGame") == JNothing, "all.fetchFirstGame=F at root")
    // transpositions: root lastGame=T firstGame=F, absent from children
    val rootTransW = res0 \ "stats" \ "transpositions" \ "human" \ "w"
    assert((rootTransW \ "lastGame") != JNothing)
    assert((rootTransW \ "firstGame") == JNothing)
    val child = res0 \ "children" \ "e2e4"
    assert((child \ "transpositions") == JNothing,
      "transpositions.fetchChildren=F must omit it from children")
    val childContW = child \ "continuations" \ "human" \ "w"
    assert((childContW \ "lastGame") != JNothing, "cont ForEachChild last=T")
    assert((childContW \ "firstGame") == JNothing, "cont ForEachChild first=F")
    val childAllW = child \ "all" \ "human" \ "w"
    assert((childAllW \ "firstGame") != JNothing, "all ForEachChild first=T")
    assert((childAllW \ "lastGame") == JNothing, "all ForEachChild last=F")
    // second probe (fen+move) has both real classes populated at root
    val res1 = (golden \ "results") (1)
    assert((res1 \ "stats" \ "continuations" \ "human" \ "d" \ "firstGame") != JNothing,
      "cont.fetchFirstGame=T at root on the fen+move probe")
  }
}
