package graft

import org.apache.spark.sql.SparkSession

/** Standalone server-throughput probe — the Bench server leg in
  * isolation, on a fresh session, so an rps drift in the committed
  * artifact can be bisected into "the server got slower" vs "the
  * bench board's accumulated session state got heavier" without
  * re-running the whole board.
  *
  * Usage: `sbt "runMain graft.ServerProbe [cpus] [rounds]"` — prints
  * one line per round.
  */
object ServerProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.chess._
    val games = ChessIngest.parseGames(spark,
      spark.createDataset(Seq(SampleGames.pgn)), Core.Level.Human)
    val agg = ChessIngest.positionsAgg(
      ChessIngest.positionStream(spark, games)).cache()
    agg.count()
    val e2e4 = "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq - 0 1"
    val lines = Seq(
      s"""{"token":"b1","query":{"positions":[{"fen":"${Position.StartFen}"}],"fetchChildren":true}}""",
      s"""{"token":"b2","query":{"positions":[{"fen":"${Position.StartFen}","move":"e2e4"}],"fetchChildren":true}}""",
      s"""{"token":"b3","retractions":{"fen":"$e2e4","synthesize":true}}""")
    (1 to rounds).foreach { r =>
      val (rps, n) = ChessServer.throughput(spark, agg, lines,
        clients = 8, perClient = 12, games = Some(games))
      println(f"[server-probe] round $r: $rps%.2f req/s over $n requests")
    }
    spark.stop()
  }
}
