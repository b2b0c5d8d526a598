package graft.chess

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EpdDumpSpec extends SparkTestBase {
  import spark.implicits._

  test("EPD dump: startpos first (key order aside), counts correct, EPD parses") {
    val games = ChessIngest.parseGames(spark,
      spark.createDataset(Seq(SampleGames.pgn)), Core.Level.Human)
    val dump = EpdDump.dump(spark, games, minCount = 2).cache()

    val startEpd = Position.StartFen.split(" ").take(4).mkString(" ")
    val start = dump.filter(col("epd") === startEpd).head()
    assert(start.getLong(1) == 9, "start position occurs in all 9 games")
    assert(start.getLong(2) == 3 && start.getLong(3) == 3 && start.getLong(4) == 3)

    // after 1.e4: 5 games (Scholar, Opera, EP, Ruy, KPDuel)
    val afterE4 = {
      val p = Position.initial.make(San.parse(Position.initial, "e4").get)
      p.toFen.split(" ").take(4).mkString(" ")
    }
    assert(dump.filter(col("epd") === afterE4).head().getLong(1) == 5)

    // every dumped EPD must parse back to a legal position
    dump.select("epd").as[String].collect().foreach { epd =>
      val pos = Position.fromFen(epd + " 0 1")
      assert(pos.kingSquare(Core.White) >= 0 && pos.kingSquare(Core.Black) >= 0)
    }
  }
}
