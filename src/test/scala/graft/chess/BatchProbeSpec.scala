package graft.chess

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BatchProbeSpec extends SparkTestBase {
  import spark.implicits._

  test("distributed exploreBatch equals driver-side explore") {
    val agg = ChessIngest.positionsAgg(
      ChessIngest.positionStream(spark,
        ChessIngest.parseGames(spark, spark.createDataset(Seq(SampleGames.pgn)),
          Core.Level.Human))).cache()
    // a probe set with guaranteed hits: startpos + after 1.e4 + after 1.d4 d5
    val fens = Seq(
      Position.StartFen,
      Position.initial.make(San.parse(Position.initial, "e4").get).toFen, {
        var p = Position.initial
        Seq("d4", "d5").foreach(m => p = p.make(San.parse(p, m).get))
        p.toFen
      })
    val viaDriver = QueryEngine.explore(spark, agg, fens.map(_ -> None))
      .drop("probeIdx") // batch path has no per-request index
    val viaBatch = QueryEngine.exploreBatch(spark, agg, fens.toDS())
    assert(viaBatch.count() > 0)
    assert(viaBatch.exceptAll(viaDriver).isEmpty &&
           viaDriver.exceptAll(viaBatch).isEmpty,
      "distributed and driver-side probe paths must agree")
  }

  test("exploreBatch scales to a large generated probe set in one job") {
    // probe a 300-game random-corpus store with ALL its games' 8-ply
    // prefixes — executor-side expansion, no driver movegen
    val corpus = RandomGames.generate(spark, 300, maxPlies = 60)
    val store = ChessIngest.positionsAgg(
      ChessIngest.positionStream(spark, corpus)).cache()
    val prefixFens = RandomGames.generate(spark, 300, maxPlies = 8)
      .map(g => g.moves.foldLeft(Position.initial)((p, m) => p.make(m)).toFen)
    val out = QueryEngine.exploreBatch(spark, store, prefixFens)
    // every prefix position exists in the store -> every probe hits
    assert(out.select("probeFen").distinct().count() ==
           prefixFens.distinct().count())
  }
}
