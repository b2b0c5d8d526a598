package graft.chess

import Core._

/** SAN codec (role of the reference's `src/chess/San.h`): parse a SAN
  * token against a position's legal moves (disambiguation, captures,
  * promotions, castling; check/mate suffixes tolerated), and emit SAN
  * with minimal disambiguation for golden tests.
  */
object San {

  /** Parse `san` in `pos`; None if it matches zero or >1 legal moves. */
  def parse(pos: Position, sanRaw: String): Option[Int] = {
    val san = sanRaw.replaceAll("[+#!?]+$", "")
    if (san == "O-O" || san == "0-0")
      return pos.legalMoves().find(m => (moveFlags(m) & FlagCastle) != 0 && file(moveTo(m)) == 6)
    if (san == "O-O-O" || san == "0-0-0")
      return pos.legalMoves().find(m => (moveFlags(m) & FlagCastle) != 0 && file(moveTo(m)) == 2)

    // [Piece][fromFile][fromRank][x][target][=Promo]
    val re = "^([NBRQK]?)([a-h]?)([1-8]?)(x?)([a-h][1-8])(=([NBRQ]))?$".r
    san match {
      case re(pc, ff, fr, _, tgt, _, promo) =>
        val kind = if (pc.isEmpty) 1 else " NBRQK".indexOf(pc) + 1
        val to = parseSquare(tgt)
        val promoKind = if (promo == null || promo.isEmpty) 0 else " NBRQ".indexOf(promo) + 1
        val cands = pos.legalMoves().filter { m =>
          moveTo(m) == to &&
            kindOf(pos.pieceAt(moveFrom(m))) == kind &&
            movePromo(m) == promoKind &&
            (ff.isEmpty || file(moveFrom(m)) == ff.charAt(0) - 'a') &&
            (fr.isEmpty || rank(moveFrom(m)) == fr.charAt(0) - '1') &&
            (moveFlags(m) & FlagCastle) == 0
        }
        if (cands.length == 1) Some(cands(0)) else None
      case _ => None
    }
  }

  /** Emit SAN (with +/# suffix) for a legal move in `pos`. */
  def emit(pos: Position, m: Int): String = {
    val from = moveFrom(m); val to = moveTo(m)
    val kind = kindOf(pos.pieceAt(from))
    val isCapture = (moveFlags(m) & FlagCapture) != 0
    val base =
      if ((moveFlags(m) & FlagCastle) != 0) {
        if (file(to) == 6) "O-O" else "O-O-O"
      } else if (kind == 1) {
        val cap = if (isCapture) s"${('a' + file(from)).toChar}x" else ""
        val pr = if (movePromo(m) != 0) "=" + "?PNBRQK".charAt(movePromo(m)) else ""
        cap + squareName(to) + pr
      } else {
        val pc = "?PNBRQK".charAt(kind).toString
        // minimal disambiguation among same-kind moves to the same square
        val others = pos.legalMoves().filter(o =>
          o != m && moveTo(o) == to && kindOf(pos.pieceAt(moveFrom(o))) == kind)
        val dis =
          if (others.isEmpty) ""
          else if (!others.exists(o => file(moveFrom(o)) == file(from)))
            ('a' + file(from)).toChar.toString
          else if (!others.exists(o => rank(moveFrom(o)) == rank(from)))
            ('1' + rank(from)).toChar.toString
          else squareName(from)
        pc + dis + (if (isCapture) "x" else "") + squareName(to)
      }
    val next = pos.make(m)
    val suffix =
      if (next.inCheck) { if (next.legalMoves().isEmpty) "#" else "+" } else ""
    base + suffix
  }

  /** UCI token (e2e4, e7e8q) → legal move in `pos`. */
  def parseUci(pos: Position, uci: String): Option[Int] = {
    if (uci.length < 4) return None
    val from = parseSquare(uci.substring(0, 2))
    val to = parseSquare(uci.substring(2, 4))
    val promo = if (uci.length > 4) " nbrq".indexOf(uci.charAt(4).toLower) + 1 else 0
    pos.legalMoves().find(m =>
      moveFrom(m) == from && moveTo(m) == to && movePromo(m) == promo)
  }
}
