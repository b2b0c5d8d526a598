package graft

import org.apache.spark.sql.functions._
import graft.operators.SimHash

class SimHashSpec extends SparkTestBase {
  import spark.implicits._

  test("identical texts get identical signatures; near texts low hamming") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (0L, base),
      (1L, base),                                  // identical -> hamming 0
      (2L, base.replace("today", "tomorrow")),     // near -> small hamming
      (3L, "totally unrelated corpus about spark catalyst optimizer rules and shuffle exchanges")
    ).toDF("doc_id", "text")

    val h = SimHash.hammingAdjacent(docs)
      .select("doc_a", "hamming").as[(Long, Long)].collect().toMap
    assert(h(0L) == 0L, s"identical docs must have hamming 0, got ${h(0L)}")
    assert(h(1L) < 16L, s"near-dup should be close, got ${h(1L)}")
    assert(h(2L) > h(1L), "unrelated doc should be farther than near-dup")
  }
}
