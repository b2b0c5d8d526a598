package graft.chess

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic random self-play corpus, generated ON EXECUTORS
  * (reference `bench` role: synthesize load without external data).
  * Each gameId seeds its own RNG, so the corpus is stable across runs
  * and cluster sizes, and generation parallelizes embarrassingly —
  * the pattern a 100 TB load test would use.
  */
object RandomGames {

  def generate(spark: SparkSession, nGames: Int, maxPlies: Int = 60,
               seed: Long = 42L): Dataset[ChessIngest.GameRow] = {
    import spark.implicits._
    spark.range(nGames.toLong).map { id =>
      val rnd = new scala.util.Random(seed ^ (id * 0x9e3779b97f4a7c15L))
      var pos = Position.initial
      val moves = Array.newBuilder[Int]
      var i = 0
      var legal = pos.legalMoves()
      while (i < maxPlies && legal.nonEmpty) {
        val m = legal(rnd.nextInt(legal.length))
        moves += m
        pos = pos.make(m)
        legal = pos.legalMoves()
        i += 1
      }
      // result: mate -> winner by side to move; else draw
      val result: Byte =
        if (legal.isEmpty && pos.inCheck)
          (if (pos.sideToMove == Core.Black) Core.Result.WhiteWin else Core.Result.BlackWin)
        else Core.Result.Draw
      val ms = moves.result()
      ChessIngest.GameRow(id, "synthetic", "bench", "2024.01.01", 2024, 1, 1,
        s"rand$id-w", s"rand$id-b", 1500 + (id % 700).toInt, 1500 + ((id * 7) % 700).toInt,
        result, "", Core.Level.Engine, ms.length, ms)
    }
  }
}
