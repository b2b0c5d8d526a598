package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingDecontaminate

/** Stream–static join: a real micro-batch document stream tagged
  * against the static benchmark blocklist equals the batch tagging, and
  * agrees with q63's contaminated-doc accounting. */
class StreamingDecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf).cache()
  private lazy val bl =
    StreamingDecontaminate.blocklist(docs.filter($"doc_id" % 97 === 0)).cache()

  test("streaming tag equals batch tag over a real micro-batch run") {
    val landing = Files.createTempDirectory("graft-decon-landing").toString
    // two drops -> at least two micro-batches with maxFilesPerTrigger=1
    docs.filter($"doc_id" % 2 === 0).write.mode("overwrite").parquet(landing)
    docs.filter($"doc_id" % 2 =!= 0).write.mode("append").parquet(landing)

    val streamIn = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
    val outDir = Files.createTempDirectory("graft-decon-out").toString
    val q = StreamingDecontaminate.tag(streamIn, bl)
      .select($"doc_id", $"contaminated")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-decon-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(outDir).select($"doc_id", $"contaminated")
    val batch = StreamingDecontaminate.tag(docs, bl)
      .select($"doc_id", $"contaminated")
    assert(streamed.count() == docs.count(), "every doc tagged exactly once")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("batch tag agrees with q63's per-lang contaminated counts") {
    val tagged = StreamingDecontaminate.tag(docs, bl)
      .filter($"doc_id" % 97 =!= 0 && $"contaminated")
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val q63 = SparkEntry.queries("q63_decontaminate")(spark, sf)
      .select($"lang", $"n_contaminated").as[(String, Long)].collect().toMap
    q63.foreach { case (lang, n) =>
      assert(tagged.getOrElse(lang, 0L) == n, s"lang=$lang") }
  }

  test("docs under 3 tokens tag cleanly as uncontaminated") {
    // regression: sequence(0, size-3) descends below index 1 for short
    // docs; the trigram build must be guarded inside the expression
    val short = Seq((1L, "", "en"), (2L, "one", "en"), (3L, "two words", "en"),
      (4L, "three word doc", "en")).toDF("doc_id", "text", "lang")
    val out = StreamingDecontaminate.tag(short, bl)
      .select($"doc_id", $"contaminated").as[(Long, Boolean)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(!out(1L) && !out(2L) && !out(3L))
  }

  test("tag preserves the doc schema and only adds the flag") {
    val tagged = StreamingDecontaminate.tag(docs, bl)
    assert(tagged.columns.toSeq ==
      docs.columns.toSeq :+ "contaminated",
      "no helper columns may leak into the tagged stream")
    // the blocklist side collapses to ONE broadcast row
    assert(bl.agg(collect_set($"g")).count() == 1)
  }
}
