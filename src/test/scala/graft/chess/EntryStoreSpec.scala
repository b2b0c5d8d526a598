package graft.chess

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** S4/S5: the bucketed+sorted entry-store layout. Bucket pruning on the
  * probe key is the Spark analogue of the reference's sorted-run binary
  * search — a point probe must touch 1/N buckets, visible in the plan
  * as SelectedBucketsCount.
  */
class EntryStoreSpec extends SparkTestBase {
  import spark.implicits._

  test("agg table round-trips through bucketed layout with bucket pruning") {
    val games = ChessIngest.parseGames(spark,
      spark.createDataset(Seq(SampleGames.pgn)), Core.Level.Human)
    val agg = ChessIngest.positionsAgg(
      ChessIngest.positionStream(spark, games))
    spark.sql("DROP TABLE IF EXISTS positions_agg_test")
    // a stale warehouse dir (e.g. from a killed run) also blocks CTAS
    val loc = new java.io.File("spark-warehouse/positions_agg_test")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    ChessIngest.writeAggTable(agg, "positions_agg_test", buckets = 16)

    val back = spark.table("positions_agg_test")
    assert(back.count() == agg.count())

    val (h, l) = Zobrist.signature(Position.initial)
    // autoBucketedScan drops bucketed handling for a bare filter scan,
    // which also forfeits bucket pruning — point probes must disable it
    // (see writeAggTable scaladoc).
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val probe = back.filter(col("posHi") === h && col("posLo") === l)
    val p = probe.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("SelectedBucketsCount: 1 out of 16"),
      s"bucket pruning must hit exactly one bucket\n$p")
    assert(probe.agg(sum("games")).as[Long].head() == 9L)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS positions_agg_test")
  }

  test("co-bucketed join on the bucket key plans with zero shuffle exchanges") {
    val games = ChessIngest.parseGames(spark,
      spark.createDataset(Seq(SampleGames.pgn)), Core.Level.Human)
    val agg = ChessIngest.positionsAgg(ChessIngest.positionStream(spark, games))
    spark.sql("DROP TABLE IF EXISTS positions_agg_cob")
    val loc = new java.io.File("spark-warehouse/positions_agg_cob")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    ChessIngest.writeAggTable(agg, "positions_agg_cob", buckets = 16)
    val t = spark.table("positions_agg_cob")
    // force the at-scale join shape (no broadcast): two bucketed sides
    // aligned on the bucket key must sort-merge WITHOUT any shuffle —
    // the layout the 100 TB store relies on for store-to-store joins
    // (epoch compaction, store diffing)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = t.select(col("posHi"), col("posLo"))
      val b = t.select(col("posHi"), col("games"))
      val j = a.join(b, Seq("posHi"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle either side\n$p")
      assert(p.contains("SortMergeJoin"), p)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS positions_agg_cob")
    }
  }

  test("epoch append + merge compaction preserves totals") {
    // Import in two halves (epochs), union, re-aggregate = compaction;
    // must equal the single-shot import (SURVEY.md §1.2 LSM mapping).
    val all = ChessIngest.parseGames(spark,
      spark.createDataset(Seq(SampleGames.pgn)), Core.Level.Human).cache()
    val ids = all.select("gameId").as[Long].collect().sorted.toIndexedSeq
    val (aIds, bIds) = ids.splitAt(ids.length / 2)
    val epochA = ChessIngest.positionsAgg(
      ChessIngest.positionStream(spark, all.filter(col("gameId").isin(aIds: _*))))
    val epochB = ChessIngest.positionsAgg(
      ChessIngest.positionStream(spark, all.filter(col("gameId").isin(bIds: _*))))
    val compacted = epochA.unionByName(epochB)
      .groupBy("posHi", "posLo", "reverseMove", "level", "result")
      .agg(sum("games").as("games"), sum("eloDiffSum").as("eloDiffSum"),
           min("firstGameId").as("firstGameId"), max("lastGameId").as("lastGameId"))
    val single = ChessIngest.positionsAgg(ChessIngest.positionStream(spark, all))
    assert(compacted.exceptAll(single).isEmpty && single.exceptAll(compacted).isEmpty)
  }
}
