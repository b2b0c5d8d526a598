package graft.chess

import graft.SparkTestBase

class BcgnSpec extends SparkTestBase {
  import spark.implicits._

  private def roundTrip(games: org.apache.spark.sql.Dataset[ChessIngest.GameRow]): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("bcgn").toString
    Bcgn.write(games, dir)
    val a = games.collect().sortBy(_.gameId)
    val b = Bcgn.read(spark, dir).collect().sortBy(_.gameId)
    assert(a.length == b.length, s"lost games: ${a.length} -> ${b.length}")
    a.zip(b).foreach { case (x, y) =>
      // Array fields compare by reference in case classes — compare
      // moves explicitly (flags restored by replay must match too)
      assert(x.moves.sameElements(y.moves), s"moves drifted for game ${x.gameId}")
      assert(x.copy(moves = null) == y.copy(moves = null),
        s"header drifted for game ${x.gameId}")
    }
  }

  test("sample corpus (incl. FEN-start game) round-trips exactly") {
    roundTrip(ChessIngest.parseGames(spark,
      spark.createDataset(Seq(SampleGames.pgn)), Core.Level.Human))
  }

  test("random 200-game corpus round-trips exactly (flags via replay)") {
    roundTrip(RandomGames.generate(spark, 200, maxPlies = 60))
  }

  test("bcgn is the compact fast-re-read format: smaller than the PGN text") {
    val games = ChessIngest.parseGames(spark,
      spark.createDataset(Seq(SampleGames.pgn)), Core.Level.Human)
    val bytes = Bcgn.encodeFile(games.collect().iterator)
    assert(bytes.length < SampleGames.pgn.getBytes("UTF-8").length,
      s"binary (${bytes.length}B) should undercut PGN " +
        s"(${SampleGames.pgn.getBytes("UTF-8").length}B)")
  }
}
