package graft.chess

import org.scalatest.funsuite.AnyFunSuite
import Core._

/** Property tests (SURVEY.md §5.2): random legal games drive invariants
  * that hold for ANY game — FEN/UCI/SAN round-trips, hash stability,
  * legality closure — catching cases hand-written fixtures miss.
  * (Plain seed loops: the scalatest↔scalacheck bridge artifact isn't in
  * the offline cache; determinism is a feature here anyway.)
  */
class ChessPropertySpec extends AnyFunSuite {

  /** Play up to `len` random legal moves from startpos. */
  private def randomGame(seed: Long, len: Int): Position = {
    val rnd = new scala.util.Random(seed)
    var pos = Position.initial
    var i = 0
    var moves = pos.legalMoves()
    while (i < len && moves.nonEmpty) {
      pos = pos.make(moves(rnd.nextInt(moves.length)))
      moves = pos.legalMoves()
      i += 1
    }
    pos
  }

  private val cases: Seq[(Long, Int)] =
    (0L until 60L).map(s => (s, 10 + (s * 7 % 70).toInt))

  test("FEN round-trip holds for random positions") {
    cases.foreach { case (s, n) =>
      val pos = randomGame(s, n)
      val back = Position.fromFen(pos.toFen)
      assert(back == pos && back.toFen == pos.toFen, s"seed=$s len=$n")
    }
  }

  test("zobrist is FEN-stable (same position -> same hash)") {
    cases.foreach { case (s, n) =>
      val pos = randomGame(s, n)
      assert(Zobrist.signature(Position.fromFen(pos.toFen)) == Zobrist.signature(pos),
        s"seed=$s len=$n fen=${pos.toFen}")
    }
  }

  test("every legal move round-trips through UCI and SAN") {
    cases.foreach { case (s, n) =>
      val pos = randomGame(s, n)
      pos.legalMoves().foreach { m =>
        assert(San.parseUci(pos, moveToUci(m)).contains(m), s"uci seed=$s")
        val san = San.emit(pos, m)
        assert(San.parse(pos, san).contains(m),
          s"SAN '$san' seed=$s fen=${pos.toFen}")
      }
    }
  }

  test("making a legal move never leaves own king attacked") {
    cases.foreach { case (s, n) =>
      val pos = randomGame(s, n)
      val us = pos.sideToMove
      pos.legalMoves().foreach { m =>
        val next = pos.make(m)
        assert(!next.isAttacked(next.kingSquare(us), next.sideToMove))
      }
    }
  }
}
