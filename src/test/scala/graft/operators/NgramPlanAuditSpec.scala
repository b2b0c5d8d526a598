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

  test("candidate self-join and rescore joins stay shuffle joins too") {
    val docs = graft.PipelineBench.generate(spark, 500).localCheckpoint()
    val plan = NgramJoin.similarPairs(docs, 3, 0.8).queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"every NgramJoin join side can be corpus-sized:\n$plan")
  }

  test("no array-typed row ever shuffles in the rescore (both pair flavors)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    val docs = graft.PipelineBench.generate(spark, 500).localCheckpoint()
    // at 100 TB the shuffle bytes ARE the rescore cost: the co-group
    // count must move (doc, doc, sh) longs, never the shingle arrays
    // the old array_intersect rescore dragged through two merge joins
    Seq(
      "similar" -> NgramJoin.similarPairs(docs, 3, 0.8),
      "contained" -> NgramJoin.containedPairs(docs, 3, 0.8)
    ).foreach { case (flavor, df) =>
      val offenders = df.queryExecution.sparkPlan.collect {
        case e: ShuffleExchangeExec
            if e.output.exists(_.dataType.isInstanceOf[ArrayType]) => e
      }
      assert(offenders.isEmpty,
        s"$flavor: array-typed shuffle legs:\n${offenders.mkString("\n")}")
    }
  }
}
