package graft.chess

/** Deterministic built-in PGN corpus for the chess query surface.
  *
  * The harness testdata has no chess tables, so the chess operators
  * (ingest → position stream → agg store → explorer probes) run over
  * this embedded corpus: famous short games plus constructed games
  * covering castling (both sides), en passant, promotion, and a
  * transposition pair (same position via different move orders) — the
  * cases the query semantics (continuations vs transpositions) need.
  */
object SampleGames {
  val pgn: String =
    """[Event "Scholar's Mate"]
[Site "?"]
[Date "2020.01.01"]
[Round "1"]
[White "Alpha"]
[Black "Beta"]
[WhiteElo "1200"]
[BlackElo "1000"]
[Result "1-0"]

1. e4 e5 2. Bc4 Nc6 3. Qh5 Nf6 4. Qxf7# 1-0

[Event "Fool's Mate"]
[Site "?"]
[Date "2020.01.02"]
[Round "1"]
[White "Gamma"]
[Black "Delta"]
[WhiteElo "900"]
[BlackElo "1500"]
[Result "0-1"]

1. f3 e5 2. g4 Qh4# 0-1

[Event "Opera Game"]
[Site "Paris"]
[Date "1858.11.02"]
[Round "?"]
[White "Morphy"]
[Black "Allies"]
[Result "1-0"]
[ECO "C41"]

1. e4 e5 2. Nf3 d6 3. d4 Bg4 {pin} 4. dxe5 Bxf3 5. Qxf3 dxe5
6. Bc4 Nf6 7. Qb3 Qe7 8. Nc3 c6 9. Bg5 b5 10. Nxb5 cxb5 11. Bxb5+ Nbd7
12. O-O-O Rd8 13. Rxd7 Rxd7 14. Rd1 Qe6 15. Bxd7+ Nxd7 16. Qb8+ Nxb8
17. Rd8# 1-0

[Event "Transposition A"]
[Site "?"]
[Date "2021.05.??"]
[Round "1"]
[White "Eve"]
[Black "Frank"]
[WhiteElo "2100"]
[BlackElo "2000"]
[Result "1/2-1/2"]

1. d4 d5 2. c4 e6 3. Nc3 Nf6 1/2-1/2

[Event "Transposition B"]
[Site "?"]
[Date "2021.05.??"]
[Round "2"]
[White "Frank"]
[Black "Eve"]
[WhiteElo "2000"]
[BlackElo "2100"]
[Result "0-1"]

1. c4 e6 2. d4 d5 3. Nc3 Nf6 0-1

[Event "En Passant Game"]
[Site "?"]
[Date "2021.06.01"]
[Round "1"]
[White "Gia"]
[Black "Hal"]
[Result "1/2-1/2"]

1. e4 Nf6 2. e5 d5 3. exd6 exd6 4. Nf3 Nc6 1/2-1/2

[Event "Promotion Game"]
[Site "?"]
[Date "2021.06.02"]
[Round "1"]
[White "Ivy"]
[Black "Jon"]
[WhiteElo "1800"]
[BlackElo "1750"]
[Result "1-0"]

1. g4 h5 2. gxh5 g6 3. hxg6 Bh6 4. g7 Nf6 5. gxh8=Q+ Ng8 1-0

[Event "Ruy Lopez Short"]
[Site "?"]
[Date "2022.03.04"]
[Round "1"]
[White "Kay"]
[Black "Lee"]
[WhiteElo "2500"]
[BlackElo "2480"]
[Result "1/2-1/2"]
[ECO "C84"]

1. e4 e5 2. Nf3 Nc6 3. Bb5 a6 4. Ba4 Nf6 5. O-O Be7 1/2-1/2

[Event "Kings Pawn Duel"]
[Site "?"]
[Date "2022.03.05"]
[Round "2"]
[White "Lee"]
[Black "Kay"]
[WhiteElo "2480"]
[BlackElo "2500"]
[Result "0-1"]

1. e4 e5 2. Nf3 Nc6 3. Bc4 Bc5 4. c3 Nf6 5. d3 d6 0-1

[Event "Broken Game Should Be Skipped"]
[Site "?"]
[Date "2022.01.01"]
[Round "1"]
[White "Bad"]
[Black "Data"]
[Result "1-0"]

1. e4 e5 2. Qxa8 1-0
"""
}
