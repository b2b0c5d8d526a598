package graft.operators

/** Regression guard for the 400k-doc sweep crash: when the shingle-set
  * table is a stats-less checkpointed LogicalRDD, the planner's size
  * guess once flipped the CORPUS-SIZED df-table join to broadcast
  * (growing linearly with the corpus until Spark's 8 GiB hard cap).
  * The join is now pinned; this spec fails if the pin ever comes off.
  * The audit runs on prefixIndex's PRE-checkpoint plan — the final
  * candidatePairs plan hides it behind the localCheckpoint boundary. */
class NgramPlanAuditSpec extends graft.SparkTestBase {

  test("prefix-index df join never broadcasts on stats-less inputs") {
    val docs = graft.PipelineBench.generate(spark, 500).localCheckpoint()
    val sets = NgramJoin.shingleSets(docs, 3).localCheckpoint()
    val plan = NgramJoin.prefixIndex(sets, 0.8).queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastExchange") && !plan.contains("BroadcastHashJoin"),
      s"the corpus-sized df table must shuffle, never broadcast:\n$plan")
  }

  test("candidate self-join stays a shuffle join; only MATERIALIZED (real-stats) tables broadcast") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val docs = graft.PipelineBench.generate(spark, 500).localCheckpoint()
    // the candidate generation must never broadcast — its sides are
    // corpus-sized and stats-less (the 400k-doc size-guess crash)
    val candPlan = NgramJoin.candidatePairs(docs, 3, 0.8)
      .queryExecution.sparkPlan.toString
    assert(!candPlan.contains("BroadcastHashJoin"),
      s"candidate generation must shuffle, never broadcast:\n$candPlan")
    // the rescore MAY broadcast — but only tables that are physically
    // materialized (localCheckpoint scans), whose size the planner
    // READ rather than guessed; a broadcast fed by an estimate (raw
    // parquet scan, un-materialized aggregate) is the crash regression
    val full = NgramJoin.similarPairs(docs, 3, 0.8).queryExecution.sparkPlan
    val offenders = full.collect {
      case b: BroadcastExchangeExec
          if !b.child.toString.contains("Scan ExistingRDD") => b
    }
    assert(offenders.isEmpty,
      s"broadcast fed by a size ESTIMATE, not a materialized table:\n${offenders.mkString("\n")}")
  }

  test("no shingle STRING ever shuffles in the rescore; arrays are hashed longs (both pair flavors)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val docs = graft.PipelineBench.generate(spark, 500).localCheckpoint()
    // at 100 TB the shuffle bytes ARE the rescore cost: round-8 dragged
    // the full corpus set table (25-byte shingle STRINGS per element)
    // through two merge joins. The rescore now moves hashed-long
    // arrays, candidate-pruned — the string dies map-side, and any
    // string (scalar OR array) in an exchange is a regression.
    // (A (pair, sh) co-group was measured instead: its join output is
    // Σ_pairs |Sₐ| rows — a pairs×setsize fan-out, 5× slower here.)
    Seq(
      "similar" -> NgramJoin.similarPairs(docs, 3, 0.8),
      "contained" -> NgramJoin.containedPairs(docs, 3, 0.8)
    ).foreach { case (flavor, df) =>
      def carriesString(dt: org.apache.spark.sql.types.DataType): Boolean =
        dt match {
          case StringType => true
          case ArrayType(et, _) => carriesString(et)
          case _ => false
        }
      val offenders = df.queryExecution.sparkPlan.collect {
        case e: ShuffleExchangeExec
            if e.output.exists(a => carriesString(a.dataType)) => e
      }
      assert(offenders.isEmpty,
        s"$flavor: string-typed shuffle legs:\n${offenders.mkString("\n")}")
    }
  }
}
