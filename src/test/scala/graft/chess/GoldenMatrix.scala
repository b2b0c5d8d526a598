package graft.chess

import org.apache.spark.sql.SparkSession

/** The flag-lattice golden fixtures, shared by GoldenResponseSpec (the
  * gate) and GoldenGen (the regenerator): one explorer request whose
  * three select classes exercise EVERY per-select fetch flag in both
  * polarities — root headers, per-child headers, fetchChildren opt-out,
  * and the synthesized "all" class — against the SampleGames corpus
  * with the header join active; plus the retractions kind with
  * synthesis on (that response shape has no header tier — stored +
  * synthesized arrays only — so the pin covers it wholly). */
object GoldenMatrix {

  /** FEN after 1.d4 d5 2.c4 — probed with move e7e6 so both real select
    * classes are non-empty (TranspA continues via e6, TranspB
    * transposes in). */
  def midFen: String = {
    var p = Position.initial
    Seq("d4", "d5", "c4").foreach(m => p = p.make(San.parse(p, m).get))
    p.toFen
  }

  /** Flag coverage across the three selects (T/F per flag):
    *   fetchChildren              cont T / trans F / all T
    *   fetchFirstGame             cont T / trans F / all F
    *   fetchLastGame              cont F / trans T / all T
    *   fetchFirstGameForEachChild cont F / all T   (trans childless)
    *   fetchLastGameForEachChild  cont T / all F
    */
  def matrixRequest: String =
    s"""{"token":"matrix","query":{
        "positions":[{"fen":"${Position.StartFen}"},
                     {"fen":"$midFen","move":"e7e6"}],
        "fetchingOptions":{
          "continuations":{"fetchChildren":true,"fetchFirstGame":true,
            "fetchLastGame":false,"fetchFirstGameForEachChild":false,
            "fetchLastGameForEachChild":true},
          "transpositions":{"fetchChildren":false,"fetchFirstGame":false,
            "fetchLastGame":true,"fetchFirstGameForEachChild":true,
            "fetchLastGameForEachChild":false},
          "all":{"fetchChildren":true,"fetchFirstGame":false,
            "fetchLastGame":true,"fetchFirstGameForEachChild":true,
            "fetchLastGameForEachChild":false}}}}"""
      .replaceAll("\n\\s*", "")

  def retractRequest: String =
    s"""{"token":"golden-r","retractions":{"fen":"${ChessOracle.retractFen}","synthesize":true}}"""

  /** (matrix explorer response, retractions response) over SampleGames
    * with headers wired. */
  def responses(spark: SparkSession): (String, String) = {
    import spark.implicits._
    val games = ChessIngest.parseGames(spark,
      spark.createDataset(Seq(SampleGames.pgn)), Core.Level.Human)
    val agg = ChessIngest.positionsAgg(ChessIngest.positionStream(spark, games))
    (ChessServer.handle(spark, agg, matrixRequest, Some(games)),
     ChessServer.handle(spark, agg, retractRequest))
  }
}

/** Regenerates the checked-in goldens after an INTENDED protocol change:
  * `sbt "Test/runMain graft.chess.GoldenGen"`, then review the diff. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (matrix, retract) = GoldenMatrix.responses(spark)
    import org.json4s.jackson.JsonMethods
    def write(name: String, body: String): Unit = {
      val p = java.nio.file.Paths.get(s"src/test/resources/golden/$name")
      java.nio.file.Files.writeString(p,
        JsonMethods.pretty(JsonMethods.parse(body)) + "\n")
      println(s"wrote $p")
    }
    write("flag_matrix.json", matrix)
    write("retractions_synth.json", retract)
    spark.stop()
  }
}
