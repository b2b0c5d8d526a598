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
}
