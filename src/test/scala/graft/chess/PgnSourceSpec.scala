package graft.chess

import graft.SparkTestBase
import java.nio.file.{Files, Paths}

class PgnSourceSpec extends SparkTestBase {
  import spark.implicits._

  /** Worst-case real-world PGN: deep RAV nesting, Unicode tags,
    * %-escape lines (incl. a fake [Event on an escaped line), ;-to-EOL
    * comments, an illegal game mid-file, a ~10 MB single game, and a
    * truncated final game — the file must parse to EXACTLY the known
    * good/skip counts, identically via forced-split and wholetext. */
  private def adversarialPgn(): (String, Int, Int) = {
    def game(tags: Seq[(String, String)], movetext: String): String =
      tags.map { case (k, v) => s"""[$k "$v"]""" }.mkString("\n") +
        "\n\n" + movetext + "\n\n"
    val sb = new StringBuilder
    // 1: plain good game
    sb ++= game(Seq("Event" -> "Open A", "White" -> "A", "Black" -> "B",
      "Result" -> "1-0"), "1. e4 e5 2. Nf3 Nc6 3. Bb5 1-0")
    // 2: Unicode tag values end to end (names, site, event)
    sb ++= game(Seq("Event" -> "東京オープン", "Site" -> "München",
      "White" -> "Müller, Jörg", "Black" -> "Ægir Þór",
      "Result" -> "1/2-1/2"), "1. d4 d5 2. c4 c6 1/2-1/2")
    // 3: 40-deep nested variations stuffed with garbage tokens — RAV
    // content is dropped, the mainline must survive
    val rav = "( " * 40 + "Qxh9 zz 99... !? " + ") " * 40
    sb ++= game(Seq("Event" -> "RAV hell", "Result" -> "1-0"),
      s"1. e4 $rav e5 2. Nf3 ( 2. f4 ( 2... d6 ) exf4 ) Nc6 1-0")
    // 4: %-escape lines everywhere, including one that would read as a
    // game boundary if the escape mechanism were ignored
    sb ++= game(Seq("Event" -> "Escaped", "Result" -> "0-1"),
      "% import note: next line is NOT a new game\n" +
        "%[Event \"Fake\"]\n1. g3 e5\n% 1. Qxf7# junk the verifier would reject\n2. Bg2 d5 0-1")
    // 5: illegal move MID-FILE — this game must skip, later games must
    // still parse (chunk isolation)
    sb ++= game(Seq("Event" -> "Broken", "Result" -> "1-0"),
      "1. e4 e5 2. Ke3 1-0")
    // 6: ;-to-end-of-line comments between moves — each must eat only
    // ITS line, never the rest of the movetext
    sb ++= game(Seq("Event" -> "Semicolon", "Result" -> "1-0"),
      "1. e4 ; best by test\ne5 2. Nf3 ; classical\nNf6 1-0")
    // 7: ~10 MB single game — a knight-shuffle mainline padded with
    // ~10 KB brace comments per cycle; one Hadoop RECORD many times the
    // forced split size
    val pad = "x" * 10000
    val bigMoves = new StringBuilder
    var mv = 1
    (0 until 1000).foreach { _ =>
      bigMoves ++= s"$mv. Nf3 {$pad} Nf6 ${mv + 1}. Ng1 Ng8 "
      mv += 2
    }
    sb ++= game(Seq("Event" -> "Huge", "Result" -> "1/2-1/2"),
      bigMoves.result() + "1/2-1/2")
    // 8: result "*" (game still in progress) — no result to aggregate,
    // so the importer must SKIP it like the reference's entry model
    sb ++= game(Seq("Event" -> "Unfinished", "Result" -> "*"),
      "1. c4 e5 *")
    // 9: truncated final game (file ends mid-SAN-token) — must skip
    sb ++= s"""[Event "Truncated"]\n[Result "1-0"]\n\n1. e4 e5 2. Nf"""
    (sb.result(), 6, 3)
  }

  test("adversarial corpus: stats exact, forced-split == wholetext") {
    val (big, expGood, expSkip) = adversarialPgn()
    val (good, stats) = Pgn.parseAll(big)
    assert(stats.games == expGood && stats.skipped == expSkip, stats)
    assert(stats.positions == good.map(_.moves.length + 1L).sum)
    assert(good.map(_.event).toSet ==
      Set("Open A", "東京オープン", "RAV hell", "Escaped", "Semicolon", "Huge"))
    assert(good.find(_.event == "Huge").get.moves.length == 4000)
    assert(good.find(_.event == "Escaped").get.moves.length == 4,
      "escape lines must vanish, not corrupt the movetext")
    assert(good.find(_.event == "Semicolon").get.moves.length == 4,
      "a ';' comment must eat only its own line")
    assert(good.find(_.event == "東京オープン").get.white == "Müller, Jörg")

    val dir = Files.createTempDirectory("pgn-adversarial").toString
    Files.writeString(Paths.get(s"$dir/adv.pgn"), big)
    spark.sparkContext.hadoopConfiguration
      .setLong("mapreduce.input.fileinputformat.split.maxsize", 65536)
    try {
      val chunks = PgnSource.readGameChunks(spark, s"$dir/adv.pgn")
      assert(chunks.rdd.getNumPartitions > 1, "expected multiple splits")
      assert(chunks.count() == expGood + expSkip,
        "every chunk recovered, incl. the one spanning ~160 splits")
      val games = PgnSource.readGames(spark, s"$dir/adv.pgn")
      assert(games.count() == expGood)
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
