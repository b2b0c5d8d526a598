package graft.chess

import org.scalatest.funsuite.AnyFunSuite

/** Move-generator validation against published perft node counts
  * (chessprogramming.org standard positions — the same validation the
  * reference family of engines uses). Covers castling, en passant,
  * promotions, pins, checks.
  */
class PerftSpec extends AnyFunSuite {

  private def perft(fen: String, depth: Int): Long =
    Position.fromFen(fen).perft(depth)

  test("startpos perft 1-4") {
    val p = Position.initial
    assert(p.perft(1) == 20L)
    assert(p.perft(2) == 400L)
    assert(p.perft(3) == 8902L)
    assert(p.perft(4) == 197281L)
  }

  test("kiwipete perft 1-3") {
    val fen = "r3k2r/p1ppqpb1/bn2pnp1/3PN3/1p2P3/2N2Q1p/PPPBBPPP/R3K2R w KQkq - 0 1"
    assert(perft(fen, 1) == 48L)
    assert(perft(fen, 2) == 2039L)
    assert(perft(fen, 3) == 97862L)
  }

  test("position 3 (ep + pins) perft 1-4") {
    val fen = "8/2p5/3p4/KP5r/1R3p1k/8/4P1P1/8 w - - 0 1"
    assert(perft(fen, 1) == 14L)
    assert(perft(fen, 2) == 191L)
    assert(perft(fen, 3) == 2812L)
    assert(perft(fen, 4) == 43238L)
  }

  test("position 4 (promotions) perft 1-3") {
    val fen = "r3k2r/Pppp1ppp/1b3nbN/nP6/BBP1P3/q4N2/Pp1P2PP/R2Q1RK1 w kq - 0 1"
    assert(perft(fen, 1) == 6L)
    assert(perft(fen, 2) == 264L)
    assert(perft(fen, 3) == 9467L)
  }

  test("position 5 perft 1-3") {
    val fen = "rnbq1k1r/pp1Pbppp/2p5/8/2B5/8/PPP1NnPP/RNBQK2R w KQ - 1 8"
    assert(perft(fen, 1) == 44L)
    assert(perft(fen, 2) == 1486L)
    assert(perft(fen, 3) == 62379L)
  }
}
