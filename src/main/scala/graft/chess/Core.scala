package graft.chess

/** Chess primitives (SURVEY.md §1.1, M1): squares, pieces, move encoding.
  * Pure Scala, zero Spark deps — mirrors the ROLE of the reference's
  * `src/chess/{Square,Piece,Move}.h` (behavioral spec only; the
  * reference mount was empty, see SURVEY.md §0).
  *
  * Square index: 0 = a1 … 63 = h8 (rank-major). Piece codes: 0 empty,
  * 1..6 white PNBRQK, 7..12 black pnbrqk.
  */
object Core {
  final val Empty = 0
  final val WP = 1; final val WN = 2; final val WB = 3
  final val WR = 4; final val WQ = 5; final val WK = 6
  final val BP = 7; final val BN = 8; final val BB = 9
  final val BR = 10; final val BQ = 11; final val BK = 12

  final val White = 0
  final val Black = 1

  @inline def isWhitePiece(p: Int): Boolean = p >= WP && p <= WK
  @inline def isBlackPiece(p: Int): Boolean = p >= BP
  @inline def colorOf(p: Int): Int = if (p <= WK) White else Black
  /** 1..6 piece kind (pawn..king) regardless of color. */
  @inline def kindOf(p: Int): Int = if (p == Empty) 0 else if (p <= WK) p else p - 6
  @inline def makePiece(color: Int, kind: Int): Int =
    if (color == White) kind else kind + 6

  @inline def file(sq: Int): Int = sq & 7
  @inline def rank(sq: Int): Int = sq >> 3
  @inline def square(f: Int, r: Int): Int = (r << 3) | f
  def squareName(sq: Int): String = s"${('a' + file(sq)).toChar}${rank(sq) + 1}"
  def parseSquare(s: String): Int = square(s.charAt(0) - 'a', s.charAt(1) - '1')

  // Move encoding: from | to<<6 | promoKind<<12 | flags<<16
  final val FlagEp = 1
  final val FlagCastle = 2
  final val FlagDouble = 4
  final val FlagCapture = 8

  @inline def mkMove(from: Int, to: Int, promo: Int = 0, flags: Int = 0): Int =
    from | (to << 6) | (promo << 12) | (flags << 16)
  @inline def moveFrom(m: Int): Int = m & 63
  @inline def moveTo(m: Int): Int = (m >> 6) & 63
  @inline def movePromo(m: Int): Int = (m >> 12) & 15
  @inline def moveFlags(m: Int): Int = (m >> 16) & 15

  /** UCI long algebraic: e2e4, e7e8q. */
  def moveToUci(m: Int): String = {
    val p = movePromo(m)
    squareName(moveFrom(m)) + squareName(moveTo(m)) +
      (if (p != 0) "pnbrqk".charAt(p - 1).toString else "")
  }

  val NoMove = 0

  // Castling-rights bits
  final val CastleWK = 1; final val CastleWQ = 2
  final val CastleBK = 4; final val CastleBQ = 8

  // Game metadata enums (reference GameClassification.h role)
  object Level { val Human: Byte = 0; val Engine: Byte = 1; val Server: Byte = 2 }
  object Result { val WhiteWin: Byte = 0; val BlackWin: Byte = 1; val Draw: Byte = 2
    def parse(s: String): Option[Byte] = s match {
      case "1-0" => Some(WhiteWin); case "0-1" => Some(BlackWin)
      case "1/2-1/2" => Some(Draw); case _ => None
    }
  }
}
