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
}
