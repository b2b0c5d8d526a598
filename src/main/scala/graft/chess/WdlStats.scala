package graft.chess

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import ChessIngest.PosOcc

/** A5 one-pass stats aggregator (SURVEY.md §2.4): count + Σ eloDiff +
  * first/last gameId in a single typed Aggregator — the combine function
  * the reference applies when merging equal-key entries during k-way
  * run merge. Registered via `functions.udaf` for the SQL surface;
  * `reduce`/`merge` are the map-side partial and shuffle combine.
  */
object WdlStats {
  case class Buf(games: Long, eloDiffSum: Long, firstGameId: Long, lastGameId: Long)

  val aggregator: Aggregator[PosOcc, Buf, Buf] = new Aggregator[PosOcc, Buf, Buf] {
    def zero: Buf = Buf(0L, 0L, Long.MaxValue, Long.MinValue)
    def reduce(b: Buf, o: PosOcc): Buf =
      Buf(b.games + 1, b.eloDiffSum + o.eloDiff,
          math.min(b.firstGameId, o.gameId), math.max(b.lastGameId, o.gameId))
    def merge(a: Buf, b: Buf): Buf =
      Buf(a.games + b.games, a.eloDiffSum + b.eloDiffSum,
          math.min(a.firstGameId, b.firstGameId), math.max(a.lastGameId, b.lastGameId))
    def finish(b: Buf): Buf = b
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }
}
