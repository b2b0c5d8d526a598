package graft.chess

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EPD dump (SURVEY.md §2.1 S6, §2.6 O4; reference `dump` command role):
  * export every position meeting a min-count threshold as EPD text for
  * opening-book building.
  *
  * A 128-bit signature can't be inverted to a board, so the dump
  * pipeline carries ONE exemplar FEN per position: `first(fen)` over a
  * replay stream that includes the FEN column (kept out of the hot
  * import path — dump is a separate job that re-walks games, mirroring
  * the reference's dump-from-games mechanics, SURVEY.md §3.3).
  * Output is globally key-ordered (range-partitioned sort).
  */
object EpdDump {

  case class PosOccFen(posHi: Long, posLo: Long, fen: String,
                       result: Byte, gameId: Long)

  def positionStreamWithFen(spark: SparkSession,
                            games: org.apache.spark.sql.Dataset[ChessIngest.GameRow]):
      org.apache.spark.sql.Dataset[PosOccFen] = {
    import spark.implicits._
    games.flatMap { g =>
      val out = new scala.collection.mutable.ArrayBuffer[PosOccFen](g.moves.length + 1)
      var pos = if (g.startFen.isEmpty) Position.initial
                else Position.fromFen(g.startFen)
      val (h0, l0) = Zobrist.signature(pos)
      out += PosOccFen(h0, l0, pos.toFen, g.result, g.gameId)
      var i = 0
      while (i < g.moves.length) {
        pos = pos.make(g.moves(i))
        val (h, l) = Zobrist.signature(pos)
        out += PosOccFen(h, l, pos.toFen, g.result, g.gameId)
        i += 1
      }
      out
    }
  }

  /** (epd, games, white_wins, draws, black_wins) for positions seen at
    * least `minCount` times, in signature order. EPD = first 4 FEN
    * fields (no clocks — they differ between transposed paths). */
  def dump(spark: SparkSession,
           games: org.apache.spark.sql.Dataset[ChessIngest.GameRow],
           minCount: Long = 2L): DataFrame = {
    val occ = positionStreamWithFen(spark, games).toDF()
      .withColumn("epd", concat_ws(" ",
        slice(split(col("fen"), " "), 1, 4)))
    occ.groupBy(col("posHi"), col("posLo"))
      .agg(first(col("epd")).as("epd"),
           count(lit(1)).as("games"),
           sum(when(col("result") === Core.Result.WhiteWin, 1L).otherwise(0L)).as("white_wins"),
           sum(when(col("result") === Core.Result.Draw, 1L).otherwise(0L)).as("draws"),
           sum(when(col("result") === Core.Result.BlackWin, 1L).otherwise(0L)).as("black_wins"))
      .filter(col("games") >= minCount)
      .orderBy(col("posHi"), col("posLo"))
      .select("epd", "games", "white_wins", "draws", "black_wins")
  }
}
