package graft.chess

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EntryFormatsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val agg = ChessIngest.positionsAgg(
    ChessIngest.positionStream(spark,
      ChessIngest.parseGames(spark, spark.createDataset(Seq(SampleGames.pgn)),
        Core.Level.Human))).cache()

  private def tmp(fmt: EntryFormats.Format): String = {
    val d = java.nio.file.Files.createTempDirectory(s"ef_${fmt.name}").toString
    EntryFormats.write(agg, fmt, d)
    d
  }

  test("delta round-trips the full store exactly") {
    val back = EntryFormats.read(spark, EntryFormats.Delta, tmp(EntryFormats.Delta))
    assert(back.exceptAll(agg).isEmpty && agg.exceptAll(back).isEmpty)
  }

  test("each format keeps exactly its declared measure set") {
    EntryFormats.All.foreach { f =>
      val cols = EntryFormats.read(spark, f, tmp(f)).schema.fieldNames.toSet
      assert(cols == (f.keys ++ f.measures).toSet, s"${f.name}: $cols")
    }
  }

  test("epsilon collapses level/result but conserves total game count") {
    val eps = EntryFormats.read(spark, EntryFormats.Epsilon, tmp(EntryFormats.Epsilon))
    val total = eps.agg(sum("games")).head().getLong(0)
    val fullTotal = agg.agg(sum("games")).head().getLong(0)
    assert(total == fullTotal)
    // coarser key -> at most as many entries
    assert(eps.count() <= agg.count())
    // explorer-style popularity query answers identically from epsilon
    val (h, l) = Zobrist.signature(Position.initial)
    val fromEps = eps.filter(col("posHi") === h && col("posLo") === l)
      .agg(sum("games")).head().getLong(0)
    val fromFull = agg.filter(col("posHi") === h && col("posLo") === l)
      .agg(sum("games")).head().getLong(0)
    assert(fromEps == fromFull && fromEps == 9L)
  }

  test("alpha level-partitioning prunes directories for level probes") {
    val dir = tmp(EntryFormats.Alpha)
    val scan = spark.read.parquet(dir).filter(col("level") === Core.Level.Human.toInt)
    val p = scan.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") &&
      p.contains("level"), s"level filter must become a partition filter:\n$p")
    assert(scan.count() == agg.count(), "sample corpus is all human level")
  }
}
