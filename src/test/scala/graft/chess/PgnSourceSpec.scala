package graft.chess

import graft.SparkTestBase
import java.nio.file.{Files, Paths}

class PgnSourceSpec extends SparkTestBase {
  import spark.implicits._

  test("splittable read equals wholetext parse, even with tiny splits") {
    val dir = Files.createTempDirectory("pgn-src").toString
    // big-ish file: repeat the corpus 20x so multiple splits engage
    val big = SampleGames.pgn * 20
    Files.writeString(Paths.get(s"$dir/big.pgn"), big)

    // force many small input splits to exercise boundary handling
    spark.sparkContext.hadoopConfiguration
      .setLong("mapreduce.input.fileinputformat.split.maxsize", 4096)
    try {
      val chunks = PgnSource.readGameChunks(spark, s"$dir/big.pgn")
      assert(chunks.rdd.getNumPartitions > 1, "expected multiple splits")
      assert(chunks.count() == 10 * 20, "every game chunk recovered")

      val games = PgnSource.readGames(spark, s"$dir/big.pgn")
      assert(games.count() == 9 * 20, "9 legal games per copy")

      // the aggregate store from split reading == from wholetext reading
      val viaSplit = ChessIngest.positionsAgg(
        ChessIngest.positionStream(spark, games))
      val viaWhole = ChessIngest.positionsAgg(ChessIngest.positionStream(spark,
        ChessIngest.parseGames(spark, spark.createDataset(Seq(big)),
          Core.Level.Human)))
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.select("posHi", "posLo", "reverseMove", "level", "result", "games")
      assert(norm(viaSplit).exceptAll(norm(viaWhole)).isEmpty &&
             norm(viaWhole).exceptAll(norm(viaSplit)).isEmpty)
    } finally {
      spark.sparkContext.hadoopConfiguration
        .unset("mapreduce.input.fileinputformat.split.maxsize")
    }
  }
}
