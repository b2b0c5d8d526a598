package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.DupSpans

/** q88 — cross-document exact substring spans. The oracle proves
  * cross-engine value equality at sf0.01; these specs prove the span
  * semantics on constructed corpora (where the expected spans are known
  * by hand) and the hash-key losslessness the oracle re-checks at data
  * scale.
  */
class DupSpansSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, "/root/testdata/sf0.01")

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("a shared m-token run reports as ONE merged span of length m") {
    // 12-token run planted in both docs (k=8 → 5 overlapping dup grams
    // each); the islands pass must fuse them into one span of 12.
    val run = (1 to 12).map(i => s"r$i").mkString(" ")
    val d = df(
      (0L, s"alpha beta $run gamma delta"),
      (1L, s"one two three $run four five"))
    val out = DupSpans.dupSpans(d).orderBy("doc_id").collect()
    out.foreach { case Row(id: Long, n: Long, spans: Long, dup: Long, mx: Long, frac: Double) =>
      assert(spans == 1L, s"doc $id: expected one merged span, got $spans")
      assert(dup == 12L && mx == 12L, s"doc $id: span len $dup/$mx")
      assert(frac == 12.0 / n, s"doc $id: frac $frac")
    }
  }

  test("two separated shared runs stay two spans; unique docs report zeros") {
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val gap = (1 to 5).map(i => s"g$i").mkString(" ") // < k, never duplicated
    val d = df(
      (0L, s"$a $gap $b"),
      (1L, s"x1 $a x2 x3 x4 x5 x6 x7 x8 x9 $b"),
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"))
    val rows = DupSpans.dupSpans(d).orderBy("doc_id").collect()
    val r0 = rows(0)
    assert(r0.getLong(2) == 2L && r0.getLong(3) == 16L && r0.getLong(4) == 8L,
      s"doc 0: $r0")
    val r2 = rows(2)
    assert(r2.getLong(2) == 0L && r2.getLong(3) == 0L && r2.getDouble(5) == 0.0,
      s"doc 2 should be untouched: $r2")
  }

  test("within-doc repetition counts as duplicated surface") {
    val run = (1 to 8).map(i => s"w$i").mkString(" ")
    val d = df((0L, s"$run pad1 pad2 pad3 $run"),
               (1L, "z1 z2 z3 z4 z5 z6 z7 z8 z9"))
    val r0 = DupSpans.dupSpans(d).filter(col("doc_id") === 0L).head()
    assert(r0.getLong(2) == 2L && r0.getLong(3) == 16L, s"doc 0: $r0")
  }

  test("docs shorter than k tokens never join the gram stream") {
    val d = df((0L, "s1 s2 s3"), (1L, "s1 s2 s3"))
    val rows = DupSpans.dupSpans(d).collect()
    assert(rows.forall(r => r.getLong(3) == 0L),
      s"sub-k docs can share ALL their text without forming a gram: ${rows.toSeq}")
  }

  test("q93: reported min-length L decouples from gram width K") {
    // doc 0 shares a 12-token run with doc 1 and a 40-token run with
    // doc 2 — at L=8 both spans report, at L=16 only the 40-run, at
    // L=32 still only the 40-run; the K=8 detection is identical in
    // all three, only the post-filter moves.
    val run12 = (1 to 12).map(i => s"m$i").mkString(" ")
    val run40 = (1 to 40).map(i => s"n$i").mkString(" ")
    val d = df(
      (0L, s"alpha $run12 beta gamma delta epsilon zeta $run40 omega"),
      (1L, s"one two three $run12 four five six seven eight"),
      (2L, s"x1 x2 x3 $run40 x4 x5"))
    val rows = DupSpans.dupSpansByMinLen(d)
      .orderBy("min_len", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows((8L, 0L)) == ((2L, 52L, 40L)), s"L=8 doc0: ${rows((8L, 0L))}")
    assert(rows((16L, 0L)) == ((1L, 40L, 40L)), "L=16 drops the 12-run")
    assert(rows((32L, 0L)) == ((1L, 40L, 40L)))
    assert(rows((8L, 1L)) == ((1L, 12L, 12L)))
    assert(rows((16L, 1L)) == ((0L, 0L, 0L)), "doc1's only span is < 16")
    assert(rows((32L, 2L)) == ((1L, 40L, 40L)))
    // L = K is exactly the q88 semantics (every merged span is >= K)
    val atK = DupSpans.dupSpansByMinLen(d).filter(col("min_len") === 8L)
      .drop("min_len").orderBy("doc_id").collect().toSeq
    val q88 = DupSpans.dupSpans(d).orderBy("doc_id").collect().toSeq
    assert(atK == q88, "L=K must reproduce q88 row-for-row")
  }

  test("q93 on the real corpus: monotone in L, and L=8 equals q88") {
    val byL = DupSpans.dupSpansByMinLen(docs).collect()
      .groupBy(_.getLong(0))
    val dupTokens = byL.view.mapValues(_.map(_.getLong(4)).sum).toMap
    assert(dupTokens(8L) >= dupTokens(16L) && dupTokens(16L) >= dupTokens(32L),
      s"dup surface must shrink as L grows: $dupTokens")
    val l8 = byL(8L).map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    val q88 = DupSpans.dupSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(l8 == q88)
  }

  test("hashed-key path equals the string-keyed twin on the real corpus") {
    val hashed = DupSpans.dupSpans(docs, hashed = true)
      .orderBy("doc_id").collect().toSeq
    val strings = DupSpans.dupSpans(docs, hashed = false)
      .orderBy("doc_id").collect().toSeq
    assert(hashed == strings,
      s"xxhash64 keying changed results: ${hashed.take(3)} vs ${strings.take(3)}")
    assert(hashed.exists(_.getLong(3) > 0L),
      "corpus should contain at least one duplicated span (q53 finds 25 near-dup pairs)")
  }
}
