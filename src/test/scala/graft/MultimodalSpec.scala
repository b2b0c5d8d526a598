package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val assets =
    Multimodal.assetsFromDocuments(Tables.documents(spark, sf)).cache()

  test("asset table: payload bytes match text utf8 length, modality cycles") {
    val row = assets.filter(col("asset_id") === 3L).head()
    assert(row.modality == "image")
    val doc = Tables.documents(spark, sf).filter(col("doc_id") === 3L)
      .select("text").as[String].head()
    assert(row.payload.sameElements(doc.getBytes("UTF-8")))
  }

  test("decode stub: deterministic features with correct byte stats") {
    val f = Multimodal.decodeStub(assets).filter(col("asset_id") === 0L).head()
    val payload = assets.filter(col("asset_id") === 0L).head().payload
    assert(f.n_bytes == payload.length)
    val mean = payload.map(_ & 0xff).map(_.toLong).sum.toDouble / payload.length
    assert(math.abs(f.mean_byte - mean) < 1e-9)
    // run twice -> identical (stub must be deterministic)
    val f2 = Multimodal.decodeStub(assets).filter(col("asset_id") === 0L).head()
    assert(f == f2)
  }

  test("resize keeps aspect ratio and bounds") {
    assert(Multimodal.resizeDims(640, 480, 64) == (64, 48))
    assert(Multimodal.resizeDims(480, 640, 64) == (48, 64))
    assert(Multimodal.resizeDims(1000, 10, 64) == (64, 1))
  }

  test("frame sampling: one frame per second, bounded by duration") {
    val frames = Multimodal.sampleFrames(assets)
    val one = frames.filter(col("asset_id") === 2L) // doc 2 -> video
    val dur = assets.filter(col("asset_id") === 2L).head().duration_ms
    assert(one.count() == (dur - 1) / 1000 + 1)
    assert(one.agg(max("frame_idx")).as[Int].head() == ((dur - 1) / 1000).toInt)
  }

  test("q173: gate attribution is consistent; every gate binds; modality scoping holds") {
    val rows = SparkEntry.queries("q173_media_gates")(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(rows.nonEmpty)
    rows.foreach { case (mod, b, l, h, rm, f, ff, keep) =>
      val passes = Seq(b, l, h, rm, f)
      val wantFf = passes.indexWhere(_ == 0L) match {
        case -1 => 0L
        case i  => i + 1L
      }
      assert(ff == wantFf && keep == (if (wantFf == 0L) 1L else 0L),
        s"($mod) attribution: passes=$passes ff=$ff keep=$keep")
      // gates outside a modality's scope must be vacuously passed
      if (mod == "audio") assert(l == 1L && h == 1L && f == 1L)
      if (mod == "image") assert(rm == 1L && f == 1L)
      if (mod == "video") assert(rm == 1L)
    }
    // every gate keeps AND drops somewhere — a bar outside the data
    // range audits nothing
    Seq[((String, Long, Long, Long, Long, Long, Long, Long)) => Long](
      _._2, _._3, _._4, _._5, _._6).zipWithIndex.foreach { case (g, i) =>
      assert(rows.exists(r => g(r) == 0L), s"gate ${i + 1} never fails")
      assert(rows.exists(r => g(r) == 1L), s"gate ${i + 1} never passes")
    }
    assert(rows.exists(_._8 == 1L) && rows.exists(_._8 == 0L))
  }
}
