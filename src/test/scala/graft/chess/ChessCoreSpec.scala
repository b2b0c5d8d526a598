package graft.chess

import org.scalatest.funsuite.AnyFunSuite
import Core._

class ChessCoreSpec extends AnyFunSuite {

  test("FEN round-trips") {
    val fens = Seq(
      Position.StartFen,
      "r3k2r/p1ppqpb1/bn2pnp1/3PN3/1p2P3/2N2Q1p/PPPBBPPP/R3K2R w KQkq - 0 1",
      "8/2p5/3p4/KP5r/1R3p1k/8/4P1P1/8 w - - 0 1",
      "rnbq1k1r/pp1Pbppp/2p5/8/2B5/8/PPP1NnPP/RNBQK2R w KQ - 1 8",
      "4k3/8/8/8/8/8/8/4K2R w K - 0 1")
    fens.foreach(f => assert(Position.fromFen(f).toFen == f))
  }

  test("SAN parse/emit round-trips over a full game") {
    // Morphy's Opera game — castling long, checks, mate.
    val sans = ("e4 e5 Nf3 d6 d4 Bg4 dxe5 Bxf3 Qxf3 dxe5 Bc4 Nf6 Qb3 Qe7 " +
      "Nc3 c6 Bg5 b5 Nxb5 cxb5 Bxb5+ Nbd7 O-O-O Rd8 Rxd7 Rxd7 Rd1 Qe6 " +
      "Bxd7+ Nxd7 Qb8+ Nxb8 Rd8#").split(" ").toSeq
    var pos = Position.initial
    sans.foreach { san =>
      val m = San.parse(pos, san)
      assert(m.isDefined, s"SAN '$san' should parse in ${pos.toFen}")
      assert(San.emit(pos, m.get) == san, s"emit mismatch for $san")
      pos = pos.make(m.get)
    }
    assert(pos.legalMoves().isEmpty && pos.inCheck, "game ends in mate")
  }

  test("UCI codec round-trips") {
    val pos = Position.initial
    pos.legalMoves().foreach { m =>
      assert(San.parseUci(pos, moveToUci(m)).contains(m))
    }
  }

  test("zobrist: transpositions collide, different positions do not") {
    // 1.d4 d5 2.c4 e6 vs 1.c4 e6 2.d4 d5 -> same position, same hash
    def play(moves: Seq[String]): Position =
      moves.foldLeft(Position.initial)((p, s) => p.make(San.parse(p, s).get))
    val a = play(Seq("d4", "d5", "c4", "e6"))
    val b = play(Seq("c4", "e6", "d4", "d5"))
    assert(Zobrist.signature(a) == Zobrist.signature(b))
    val c = play(Seq("d4", "d5", "c4", "c6"))
    assert(Zobrist.signature(a) != Zobrist.signature(c))
  }

  test("zobrist: ep square only hashes when capturable") {
    def play(moves: Seq[String]): Position =
      moves.foldLeft(Position.initial)((p, s) => p.make(San.parse(p, s).get))
    // After 1.e4 the ep square e3 is set but NO black pawn attacks it:
    // hash must equal the identical board parsed with ep = '-'.
    val dead = play(Seq("e4"))
    assert(dead.epSquare == parseSquare("e3"))
    val deadNoEp = Position.fromFen(dead.toFen.replace(" e3 ", " - "))
    assert(Zobrist.signature(dead) == Zobrist.signature(deadNoEp))
    // After 1.e4 a6 2.e5 d5 the ep square d6 IS capturable by the e5
    // pawn: hash must differ from the ep-less reading of the board.
    val live = play(Seq("e4", "a6", "e5", "d5"))
    assert(live.epSquare == parseSquare("d6"))
    val liveNoEp = Position.fromFen(live.toFen.replace(" d6 ", " - "))
    assert(Zobrist.signature(live) != Zobrist.signature(liveNoEp))
  }

  test("make handles en passant and promotion") {
    def play(moves: Seq[String]): Position =
      moves.foldLeft(Position.initial)((p, s) => p.make(San.parse(p, s).get))
    val ep = play(Seq("e4", "Nf6", "e5", "d5", "exd6"))
    assert(ep.pieceAt(parseSquare("d5")) == Empty, "ep-captured pawn removed")
    assert(ep.pieceAt(parseSquare("d6")) == WP)
    val promo = play(Seq("g4", "h5", "gxh5", "g6", "hxg6", "Bh6", "g7", "Nf6", "gxh8=Q+"))
    assert(promo.pieceAt(parseSquare("h8")) == WQ)
    assert(promo.inCheck, "promotion gives check")
  }

  test("partial PGN dates parse") {
    assert(Pgn.parseDate("1992.??.??") == (1992, -1, -1))
    assert(Pgn.parseDate("2021.07.15") == (2021, 7, 15))
    assert(Pgn.parseDate("????.??.??") == (-1, -1, -1))
  }
}
