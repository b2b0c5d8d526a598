package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("as-of join attaches latest right.ts <= left.ts per key") {
    val purchases = Seq(
      (1L, "u1", 100L), // after clicks at 50, 90 -> 90
      (2L, "u1", 50L),  // equal-ts click at 50 -> 50 (inclusive)
      (3L, "u2", 10L),  // no prior click -> dropped (inner)
      (4L, "u2", 500L), // clicks at 20, 400 -> 400
      (5L, "u3", 77L)   // u3 has no clicks at all -> dropped
    ).toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      ("u1", 50L), ("u1", 90L), ("u2", 20L), ("u2", 400L)
    ).toDF("user_id", "click_ts")

    val out = AsOfJoin(purchases, clicks, "user_id", "ts", "click_ts")
      .select("event_id", "click_ts").as[(Long, Long)].collect().toMap

    assert(out == Map(1L -> 90L, 2L -> 50L, 4L -> 400L))
  }

  test("as-of join keeps all left payload columns") {
    val l = Seq((1L, "u1", 10L, "x")).toDF("id", "k", "ts", "payload")
    val r = Seq(("u1", 5L)).toDF("k", "rts")
    val out = AsOfJoin(l, r, "k", "ts", "rts")
    assert(out.columns.toSeq == Seq("id", "k", "ts", "payload", "rts"))
    assert(out.count() == 1)
  }
}
