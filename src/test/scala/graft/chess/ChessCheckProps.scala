package graft.chess

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import Core._

/** ScalaCheck properties for the chess core (sbt runs the ScalaCheck
  * framework directly; no scalatest bridge needed).
  */
object ChessCheckProps extends Properties("chess") {

  private val gameGen: Gen[(Long, Int)] =
    for { s <- Gen.choose(0L, 100000L); n <- Gen.choose(0, 120) } yield (s, n)

  private def playTrace(seed: Long, len: Int): Vector[(Position, Int, Position)] = {
    val rnd = new scala.util.Random(seed)
    var pos = Position.initial
    val out = Vector.newBuilder[(Position, Int, Position)]
    var i = 0
    var legal = pos.legalMoves()
    while (i < len && legal.nonEmpty) {
      val m = legal(rnd.nextInt(legal.length))
      val next = pos.make(m)
      out += ((pos, m, next))
      pos = next
      legal = pos.legalMoves()
      i += 1
    }
    out.result()
  }

  property("incremental zobrist == full recompute along any game") =
    forAll(gameGen) { case (seed, len) =>
      val trace = playTrace(seed, len)
      var (h, l) = Zobrist.signature(Position.initial)
      trace.forall { case (prev, m, next) =>
        val hl = Zobrist.applyMove(prev, m, next, h, l)
        h = hl._1; l = hl._2
        (h, l) == Zobrist.signature(next)
      }
    }

  property("FEN round-trip on random reachable positions") =
    forAll(gameGen) { case (seed, len) =>
      val end = playTrace(seed, len).lastOption.map(_._3).getOrElse(Position.initial)
      Position.fromFen(end.toFen) == end && Position.fromFen(end.toFen).toFen == end.toFen
    }

  property("UCI round-trip for every legal move") =
    forAll(gameGen) { case (seed, len) =>
      val end = playTrace(seed, len).lastOption.map(_._3).getOrElse(Position.initial)
      end.legalMoves().forall(m => San.parseUci(end, moveToUci(m)).contains(m))
    }
}
