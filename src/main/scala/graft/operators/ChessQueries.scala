package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.chess._
import graft.chess.ChessIngest.GameRow

/** Chess operator surface (SURVEY.md §2 native rows: S1/S2 ingest, A1–A5
  * aggregation, J1 probe join, P5/A4 continuation-transposition split,
  * W1 explorer ranking, F1–F5 codecs).
  *
  * The harness testdata has no chess tables, so these run over the
  * embedded `SampleGames` corpus / seeded RandomGames (sfDir is
  * ignored). Movegen/Zobrist are gated by perft + property specs; the
  * relational half of every query has a REAL DuckDB oracle over the
  * position streams ChessOracle exports (see ChessOracle.scala).
  */
object ChessQueries {

  /** Parse the corpus once per session (tiny: ~10 games). */
  private def games(s: SparkSession): org.apache.spark.sql.Dataset[GameRow] = {
    import s.implicits._
    ChessIngest.parseGames(s, s.createDataset(Seq(SampleGames.pgn)), Core.Level.Human)
  }

  // The sample-corpus agg store is immutable per session — cache it so
  // the six chess queries don't each re-run parse -> replay -> agg.
  // Strong keys + stopped-session purge on access. (A WeakHashMap
  // cannot evict here: the cached DataFrame strongly references its
  // session via queryExecution.sparkSession, pinning the weak key
  // forever.)
  private val aggCache =
    scala.collection.concurrent.TrieMap.empty[SparkSession, DataFrame]
  private def agg(s: SparkSession): DataFrame = {
    aggCache.filterInPlace((sess, _) => !sess.sparkContext.isStopped)
    aggCache.getOrElseUpdate(s,
      ChessIngest.positionsAgg(ChessIngest.positionStream(s, games(s))).cache())
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/S2: PGN ingest — header dimension table (games).
    "q40_chess_games" -> ((s, _) => {
      games(s).toDF()
        .groupBy(col("result"))
        .agg(count(lit(1)).as("n_games"),
             sum(col("plyCount")).cast("long").as("total_plies"),
             max(col("whiteElo")).as("max_white_elo"))
    }),

    // A1–A3/A5: the position-aggregate entry store, summarized.
    "q41_positions_agg" -> ((s, _) => {
      agg(s).agg(
        count(lit(1)).as("n_entries"),
        sum(col("games")).cast("long").as("n_occurrences"),
        countDistinct(col("posHi"), col("posLo")).as("n_distinct_positions"))
    }),

    // J1+W1: opening explorer on the start position — children ranked
    // by popularity with W/D/L split.
    "q42_opening_explorer" -> ((s, _) =>
      QueryEngine.explorer(s, agg(s), Position.StartFen)),

    // Bulk import throughput (reference `bench` role): generate random
    // games ON EXECUTORS, replay to a position stream, aggregate — the
    // full import path at volume. Row reports corpus-level totals.
    "q45_chess_bulk_import" -> ((s, _) => {
      val games = RandomGames.generate(s, ChessOracle.BulkN, ChessOracle.MaxPlies)
      ChessIngest.positionsAgg(ChessIngest.positionStream(s, games))
        .agg(count(lit(1)).as("n_entries"),
             sum(col("games")).cast("long").as("n_occurrences"))
    }),

    // Batch probe (J1 at volume): probe a 300-game random corpus with
    // the 6-ply prefixes of its own first 64 games — probe expansion
    // (root + children keys, ~2300) runs ON EXECUTORS via
    // exploreBatch, the fully-distributed path that scales to 10⁶
    // probes in one job (SURVEY.md §3.2). The reference answers these
    // one binary-search seek at a time.
    "q46_chess_batch_probe" -> ((s, _) => {
      import s.implicits._
      val corpus = RandomGames.generate(s, ChessOracle.RandN, ChessOracle.MaxPlies)
      val store = ChessIngest.positionsAgg(ChessIngest.positionStream(s, corpus))
      // same seeds as corpus games 0..63 -> prefixes exist in the store
      val probeFens = RandomGames.generate(s, ChessOracle.ProbeN, ChessOracle.ProbePlies)
        .map(g => g.moves.foldLeft(Position.initial)((p, m) => p.make(m)).toFen)
      QueryEngine.exploreBatch(s, store, probeFens)
        .agg(count(lit(1)).as("n_result_rows"),
             countDistinct(col("probeFen")).as("n_probes_hit"))
    }),

    // F6 retractions: which moves led to the position after
    // 1.d4 d5 2.c4 e6 (golden: e7e6 from TranspA, d7d5 from TranspB).
    "q47_retractions" -> ((s, _) =>
      QueryEngine.retractions(s, agg(s), ChessOracle.retractFen)),

    // F6/ERAN true retraction synthesis: enumerate ALL legal unmoves of
    // the q47 position (not just stored reverse moves) and join their
    // predecessor signatures against the store — surfaces predecessors
    // that occurred even when the transition was never played.
    "q52_retract_synth" -> ((s, _) =>
      QueryEngine.retractSynth(s, agg(s), ChessOracle.retractFen)),

    // P5/A4: continuation vs transposition split after 1.d4 d5 2.c4,
    // probing with move e7e6 — the transposition-pair games make both
    // classes non-empty (golden counts in ChessSparkSpec).
    "q43_cont_trans" -> ((s, _) =>
      QueryEngine.explore(s, agg(s), Seq(ChessOracle.contTransFen -> Some("e7e6")))
        .filter(col("childUci") === "")
        .groupBy(col("select"))
        .agg(sum(col("games")).cast("long").as("games")))
  )

  /** Movegen/Zobrist stay perft/property-gated, but the aggregation/join
    * half of every chess query IS relational — ChessOracle exports the
    * position streams + probe keys as parquet and these SQL strings let
    * DuckDB recompute each query independently. */
  val oracleSql: Map[String, String] = ChessOracle.oracleSql
}
