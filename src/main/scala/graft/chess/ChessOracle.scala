package graft.chess

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Hard DuckDB oracles for the chess query path (q40–q47).
  *
  * The chess-SPECIFIC machinery (legal movegen, Zobrist signatures, SAN)
  * is gated by perft + property specs — it is not ANSI-expressible. But
  * everything DOWNSTREAM of the position stream is plain relational
  * algebra over (posHi, posLo, reverseMove, level, result, …) rows. So
  * Verify exports the deterministic position streams + expanded probe
  * key sets as parquet, and the oracle SQL recomputes each query's
  * aggregation/join independently in DuckDB via `read_parquet` on those
  * absolute paths. That turns the aggregation/join half of the chess
  * path (SURVEY.md §2.4 A1–A4, §2.3 J1, §2.8 F6) from rows-only checks
  * into per-round row/schema/hash matches.
  *
  * Determinism: the sample corpus is embedded text; RandomGames seeds
  * per gameId; probe expansion is driver-side movegen on fixed FENs —
  * the exported tables and the query-side recomputation are the same
  * pure functions, so the comparison is meaningful (DuckDB reruns the
  * relational part, not the export).
  */
object ChessOracle {

  // Export root + read_parquet plumbing shared with ApproxOracle —
  // see graft.OracleExport (configurable, not a baked-in path).

  // Corpus parameters shared by the queries (ChessQueries) and the
  // export — a drifted literal would silently break the oracle.
  val BulkN = 500
  val RandN = 300
  val ProbeN = 64
  val MaxPlies = 60
  val ProbePlies = 6

  def fenAfter(sans: Seq[String]): String = {
    var p = Position.initial
    sans.foreach(m => p = p.make(San.parse(p, m).get))
    p.toFen
  }
  /** q43 probe: position after 1.d4 d5 2.c4, probed with move e7e6. */
  def contTransFen: String = fenAfter(Seq("d4", "d5", "c4"))
  /** q47 subject: position after 1.d4 d5 2.c4 e6. */
  def retractFen: String = fenAfter(Seq("d4", "d5", "c4", "e6"))

  /** PosOcc plus the reverse move as UCI text ("start" at game start) so
    * the SQL side never needs the move-int codec. */
  case class PosOccExport(posHi: Long, posLo: Long, reverseMove: Int,
                          reverseUci: String, level: Byte, result: Byte,
                          gameId: Long, eloDiff: Int, ply: Int)

  private def withUci(s: SparkSession,
                      occ: Dataset[ChessIngest.PosOcc]): Dataset[PosOccExport] = {
    import s.implicits._
    occ.map(o => PosOccExport(o.posHi, o.posLo, o.reverseMove,
      if (o.reverseMove == Core.NoMove) "start" else Core.moveToUci(o.reverseMove),
      o.level, o.result, o.gameId, o.eloDiff, o.ply))
  }

  /** Write every table the oracle SQL reads. Called by Verify before the
    * query loop; the tables are small (sample corpus + seeded random
    * corpora), so this is seconds, not a data job. */
  def export(spark: SparkSession): Unit = {
    import spark.implicits._
    def write(df: DataFrame, name: String): Unit =
      graft.OracleExport.write(df, name)

    val sample = ChessIngest.parseGames(spark,
      spark.createDataset(Seq(SampleGames.pgn)), Core.Level.Human)
    write(sample.toDF(), "games_sample")
    write(withUci(spark, ChessIngest.positionStream(spark, sample)).toDF(),
      "positions_sample")
    write(withUci(spark, ChessIngest.positionStream(spark,
      RandomGames.generate(spark, BulkN, MaxPlies))).toDF(), "positions_bulk")
    write(withUci(spark, ChessIngest.positionStream(spark,
      RandomGames.generate(spark, RandN, MaxPlies))).toDF(), "positions_rand")

    val probeFens = RandomGames.generate(spark, ProbeN, ProbePlies)
      .map(g => g.moves.foldLeft(Position.initial)((p, m) => p.make(m)).toFen)
    write(probeFens.flatMap(f => QueryEngine.probeKeys(Seq(f -> None))).toDF(),
      "probes_rand")
    write(QueryEngine.probeKeys(Seq(Position.StartFen -> None)).toDF(),
      "probes_explorer")
    write(QueryEngine.probeKeys(Seq(contTransFen -> Some("e7e6"))).toDF(),
      "probes_cont")
    // q52: retro-candidate set for the retraction-synthesis subject —
    // generation is perft-gated pure compute (RetractSpec); the store
    // join + aggregation is what DuckDB recomputes.
    write(Retract.candidates(Position.fromFen(retractFen)).toDF()
      .select("uci", "predHi", "predLo"), "retract_cands")
  }

  private def p(name: String) = graft.OracleExport.p(name)
  private val W = Core.Result.WhiteWin
  private val D = Core.Result.Draw
  private val B = Core.Result.BlackWin
  private val NoMv = Core.NoMove

  /** W/D/L occurrence counts (each exported row is one occurrence). */
  private def wdl(resCol: String): String =
    s"""CAST(sum(CASE WHEN $resCol = $W THEN 1 ELSE 0 END) AS BIGINT) AS white_wins,
       CAST(sum(CASE WHEN $resCol = $D THEN 1 ELSE 0 END) AS BIGINT) AS draws,
       CAST(sum(CASE WHEN $resCol = $B THEN 1 ELSE 0 END) AS BIGINT) AS black_wins"""

  val oracleSql: Map[String, String] = {
    val (q47Hi, q47Lo) = Zobrist.signature(Position.fromFen(retractFen))
    Map(
      "q40_chess_games" ->
        s"""SELECT result, count(*) AS n_games,
           CAST(sum(plyCount) AS BIGINT) AS total_plies,
           max(whiteElo) AS max_white_elo
           FROM ${p("games_sample")} GROUP BY result""",

      // the entry store is groupBy(posHi,posLo,reverseMove,level,result)
      // over occurrences; recompute it and summarize
      "q41_positions_agg" ->
        s"""WITH entries AS (
             SELECT posHi, posLo, reverseMove, level, result, count(*) AS games
             FROM ${p("positions_sample")} GROUP BY 1, 2, 3, 4, 5)
           SELECT count(*) AS n_entries,
             CAST(sum(games) AS BIGINT) AS n_occurrences,
             count(DISTINCT (posHi, posLo)) AS n_distinct_positions
           FROM entries""",

      "q42_opening_explorer" ->
        s"""SELECT p.childUci AS childUci, count(*) AS games, ${wdl("o.result")}
           FROM ${p("positions_sample")} o
           JOIN ${p("probes_explorer")} p
             ON o.posHi = p.posHi AND o.posLo = p.posLo
           WHERE p.childUci <> ''
           GROUP BY 1 ORDER BY games DESC, childUci ASC""",

      "q43_cont_trans" ->
        s"""SELECT CASE WHEN o.reverseMove = p.contMove AND p.contMove <> $NoMv
                  THEN 'continuations' ELSE 'transpositions' END AS "select",
             CAST(count(*) AS BIGINT) AS games
           FROM ${p("positions_sample")} o
           JOIN ${p("probes_cont")} p
             ON o.posHi = p.posHi AND o.posLo = p.posLo
           WHERE p.childUci = ''
           GROUP BY 1""",

      "q45_chess_bulk_import" ->
        s"""WITH entries AS (
             SELECT posHi, posLo, reverseMove, level, result, count(*) AS games
             FROM ${p("positions_bulk")} GROUP BY 1, 2, 3, 4, 5)
           SELECT count(*) AS n_entries,
             CAST(sum(games) AS BIGINT) AS n_occurrences
           FROM entries""",

      // mirror exploreBatch's groupBy(probeFen,childUci,select,level,result)
      // shape, then count its rows / distinct probes
      "q46_chess_batch_probe" ->
        s"""WITH j AS (
             SELECT p.probeFen, p.childUci,
               CASE WHEN o.reverseMove = p.contMove AND p.contMove <> $NoMv
                    THEN 'c' ELSE 't' END AS sel,
               o.level, o.result
             FROM ${p("positions_rand")} o
             JOIN ${p("probes_rand")} p
               ON o.posHi = p.posHi AND o.posLo = p.posLo
             GROUP BY 1, 2, 3, 4, 5)
           SELECT CAST(count(*) AS BIGINT) AS n_result_rows,
             count(DISTINCT probeFen) AS n_probes_hit
           FROM j""",

      "q47_retractions" ->
        s"""SELECT reverseUci AS uci, CAST(count(*) AS BIGINT) AS games,
             ${wdl("result")}
           FROM ${p("positions_sample")}
           WHERE posHi = $q47Hi AND posLo = $q47Lo
           GROUP BY 1 ORDER BY games DESC, uci ASC""",

      // q52: each exported occurrence row joins at most one candidate
      // variant (rights/ep variants have distinct signatures), so the
      // per-uci count of matched rows equals the store's sum(games)
      "q52_retract_synth" ->
        s"""WITH pred AS (
             SELECT c.uci, CAST(count(*) AS BIGINT) AS pred_games
             FROM ${p("positions_sample")} o
             JOIN ${p("retract_cands")} c
               ON o.posHi = c.predHi AND o.posLo = c.predLo
             GROUP BY 1),
           played AS (
             SELECT reverseUci AS uci, CAST(count(*) AS BIGINT) AS played_games
             FROM ${p("positions_sample")}
             WHERE posHi = $q47Hi AND posLo = $q47Lo AND reverseUci <> 'start'
             GROUP BY 1)
           SELECT p.uci AS uci, p.pred_games,
             COALESCE(pl.played_games, 0) AS played_games
           FROM pred p LEFT JOIN played pl ON p.uci = pl.uci
           ORDER BY pred_games DESC, uci ASC"""
    )
  }
}
