package graft.chess

import org.scalatest.funsuite.AnyFunSuite
import Core._

/** Retraction synthesis (Retract.scala, reference ERAN role).
  *
  * Soundness is by construction (every candidate is validated by the
  * perft-gated forward engine), so the load-bearing property here is
  * COMPLETENESS: along real game trajectories, every move actually
  * played must be recovered as a retraction of the position it produced
  * — including captures, double pushes, promotions, castles, and en
  * passant, which the crafted cases below pin down individually.
  */
class RetractSpec extends AnyFunSuite {

  private def sig(p: Position): (Long, Long) = Zobrist.signature(p)

  private def containsRetraction(target: Position, pred: Position, m: Int): Boolean =
    Retract.retractions(target).exists { case (p, mm) =>
      sig(p) == sig(pred) && moveFrom(mm) == moveFrom(m) &&
        moveTo(mm) == moveTo(m) && movePromo(mm) == movePromo(m)
    }

  private def play(start: Position, sans: String): Position =
    sans.split(" ").foldLeft(start)((p, s) => p.make(San.parse(p, s).get))

  test("completeness along random game trajectories") {
    // same seeded self-play shape as RandomGames, driver-side
    var checked = 0
    for (g <- 0 until 25) {
      val rnd = new scala.util.Random(0xbeef ^ (g * 0x9e3779b97f4a7c15L))
      var pos = Position.initial
      var legal = pos.legalMoves()
      var ply = 0
      while (ply < 100 && legal.nonEmpty) {
        val m = legal(rnd.nextInt(legal.length))
        val next = pos.make(m)
        assert(containsRetraction(next, pos, m),
          s"missing retraction ${moveToUci(m)} of ${pos.toFen} -> ${next.toFen}")
        checked += 1
        pos = next
        legal = pos.legalMoves()
        ply += 1
      }
    }
    assert(checked > 1500, s"trajectory coverage too thin: $checked plies")
  }

  test("soundness: every candidate replays to the target signature") {
    val targets = Seq(
      Position.initial.make(San.parse(Position.initial, "e4").get),
      play(Position.initial, "d4 d5 c4 e6"),
      play(Position.initial, "e4 e5 Nf3 Nc6 Bc4 Bc5 O-O"))
    for (t <- targets; (pred, m) <- Retract.retractions(t)) {
      assert(pred.legalMoves().contains(m))
      assert(sig(pred.make(m)) == sig(t))
    }
  }

  test("un-castle: O-O is retracted to the pre-castle position") {
    val pre = play(Position.initial, "e4 e5 Nf3 Nc6 Bc4 Bc5")
    val m = San.parse(pre, "O-O").get
    assert(containsRetraction(pre.make(m), pre, m))
  }

  test("un-promotion: push and capture promotions are retracted") {
    val push = Position.fromFen("4k3/P7/8/8/8/8/8/4K3 w - - 0 1")
    val mPush = San.parseUci(push, "a7a8q").get
    assert(containsRetraction(push.make(mPush), push, mPush))

    val cap = Position.fromFen("1n2k3/P7/8/8/8/8/8/4K3 w - - 0 1")
    val mCap = San.parseUci(cap, "a7b8q").get
    assert(containsRetraction(cap.make(mCap), cap, mCap))
  }

  test("un-en-passant: the ep capture is retracted with ep state restored") {
    val pre = Position.fromFen("4k3/8/8/3pP3/8/8/8/4K3 w - d6 0 1")
    val m = San.parseUci(pre, "e5d6").get
    val target = pre.make(m)
    assert(containsRetraction(target, pre, m))
    // "e5d6" is ALSO recoverable as a normal capture unmove (some black
    // piece uncaptured on d6) — those are genuinely distinct legal
    // predecessors. The true ep variant must be among them: ep square
    // d6 carried, captured black pawn restored on d5.
    val recovered = Retract.retractions(target).collect {
      case (p, mm) if moveToUci(mm) == "e5d6" => p
    }
    assert(recovered.exists(p =>
      p.epSquare == Core.square(3, 5) && p.board(Core.square(3, 4)) == BP))
    assert(recovered.exists(p => sig(p) == sig(pre)))
  }

  test("dead-ep FEN normalization does not lose the double-push retraction") {
    // after 1.e4 the ep square e3 is not capturable; an external FEN
    // writes "-" where make() records e3 — both must retract to e2e4
    val afterE4 = Position.initial.make(San.parse(Position.initial, "e4").get)
    val normalized = Position.fromFen(
      "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq - 0 1")
    val m = San.parseUci(Position.initial, "e2e4").get
    assert(containsRetraction(afterE4, Position.initial, m))
    assert(containsRetraction(normalized, Position.initial, m))
  }

  test("candidates dedupe on (signature, move) and stay bounded") {
    val cands = Retract.candidates(play(Position.initial, "d4 d5 c4 e6"))
    assert(cands.nonEmpty)
    assert(cands.distinct.size == cands.size)
    assert(cands.size < 2000, s"candidate explosion: ${cands.size}")
    // the two moves actually played into this position in the sample
    // corpus are among the synthesized retro-moves
    assert(cands.exists(_.uci == "e7e6"))
    assert(cands.exists(_.uci == "d7d5"))
  }
}
