package graft.chess

import graft.SparkTestBase

class SaltedAggSpec extends SparkTestBase {
  import spark.implicits._

  test("salted two-level aggregation equals direct aggregation exactly") {
    val occ = ChessIngest.positionStream(spark,
      ChessIngest.parseGames(spark, spark.createDataset(Seq(SampleGames.pgn)),
        Core.Level.Human)).toDF()
    val a = SaltedAgg.direct(occ)
    val b = SaltedAgg.salted(occ, salts = 7)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("positionsAgg's wired salted path (past the skew threshold) equals direct") {
    val occ = ChessIngest.positionStream(spark,
      ChessIngest.parseGames(spark, spark.createDataset(Seq(SampleGames.pgn)),
        Core.Level.Human))
    val direct = ChessIngest.positionsAgg(occ)
    val salted = ChessIngest.positionsAgg(occ,
      approxGames = ChessIngest.SkewGamesThreshold)
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }
}
