package graft.chess

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read-amplification measurement behind the compaction trigger policy
  * (`StreamingImport.CompactEpochsConf`): the SAME corpus is written as
  * a 1-, 4- and 16-epoch store, a fixed batch-probe workload is timed
  * against each (median of 3), then the 16-epoch store is compacted and
  * re-timed. Every probe over an epoched store unions every epoch's
  * files and re-merges equal keys, so latency grows with epoch count —
  * this artifact (COMPACTION_BENCH.json) quantifies by how much, and
  * the policy default is chosen so probes stay near the compacted floor
  * while the rewrite cost amortizes over many appends.
  *
  * A second section measures the STREAMING dedup stores the same way
  * (`stream_*` fields): the per-batch band-store probe that
  * IncrementalDedup pays on every micro-batch, against 1/4/16
  * batch_id-partitioned layouts, then after a `BatchStore.compact`
  * fold — the read-amp row behind `BatchStore.DefaultCompactBatches`.
  *
  * Usage: `sbt "runMain graft.chess.CompactionBench [nGames]"`.
  */
object CompactionBench {

  // layouts register with the JVM-exit reaper at creation, so a run
  // that dies mid-measurement leaks nothing
  private def tmp(p: String): String = graft.TempDirs.register(
    java.nio.file.Files.createTempDirectory(p).toString)

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split("\\s+")(0)
    catch { case _: Throwable => "-1" }

  /** Time the batch-probe workload (probe keys broadcast into the
    * store read, J1 shape) against one store layout. */
  private def probeSec(spark: SparkSession, dir: String,
                       probes: DataFrame): Double = {
    val t0 = System.nanoTime()
    StreamingImport.readStore(spark, dir)
      .join(broadcast(probes), Seq("posHi", "posLo")).count()
    (System.nanoTime() - t0) / 1e9
  }

  private def parquetFiles(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(dir))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadPre = loadavg()

    val occ = ChessIngest.positionStream(spark,
      RandomGames.generate(spark, n)).toDF().cache()
    occ.count()

    // one corpus, three layouts: the epoch column slices game ids into
    // e equal ranges, exactly what e successive ingest batches produce
    val layouts = Seq(1, 4, 16).map { e =>
      val dir = tmp(s"graft-compbench-e$e")
      val w = (n.toLong + e - 1) / e
      (0 until e).foreach { i =>
        val slice = occ.filter(col("gameId") >= i * w && col("gameId") < (i + 1) * w)
        SaltedAgg.direct(slice)
          .withColumn("epoch", lit(i.toLong))
          .write.mode("append").partitionBy("epoch").parquet(dir)
      }
      e -> dir
    }.toMap

    // fixed probe workload: 1000 deterministic keys
    val probes = occ.select("posHi", "posLo").distinct()
      .orderBy(col("posHi"), col("posLo")).limit(1000).cache()
    probes.count()

    def m3(dir: String): Double =
      median((1 to 3).map(_ => probeSec(spark, dir, probes)))

    val perLayout = layouts.toSeq.sortBy(_._1).map { case (e, dir) =>
      e -> (m3(dir), parquetFiles(dir), spark.read.parquet(dir).count()) }

    val compacted = tmp("graft-compbench-compacted")
    val t0 = System.nanoTime()
    StreamingImport.compact(spark, layouts(16), compacted)
    val compactSec = (System.nanoTime() - t0) / 1e9
    val compactedProbe = m3(compacted)
    val compactedFiles = parquetFiles(compacted)

    // --- streaming dedup store (BatchStore fold) read-amplification ---
    // The hottest streaming read path: every micro-batch joins its new
    // band keys against the ACCUMULATED store. Same corpus laid out as
    // 1, 4 and 16 batch_id partitions (what 1/4/16 micro-batches
    // produce with compaction off), probed with a fixed new-batch band
    // set; then the 16-partition store is folded (BatchStore.compact)
    // and re-probed — quantifying what the conf'd trigger buys.
    import graft.operators.MinHashLSH
    import graft.streaming.BatchStore
    val nDocs = n // scale the doc corpus with the games arg
    val docs = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 30).map(j =>
          concat(lit("tok"), pmod(col("id") * 31 + j * 7, lit(500)))): _*).as("text"))
      .cache()
    docs.count()
    val probeBatch = MinHashLSH.bandsOf(
      docs.filter(col("doc_id") % 16 === 15)).cache()
    probeBatch.count()
    val streamLayouts = Seq(1, 4, 16).map { e =>
      val dir = tmp(s"graft-compbench-bands-e$e")
      (0 until e).foreach { i =>
        // slice the store docs (doc_id%16 < 15) into e non-empty batches
        MinHashLSH.bandsOf(docs.filter(col("doc_id") % 16 < 15 &&
            shiftright(col("doc_id"), 4) % e === i))
          .withColumn("batch_id", lit(i.toLong))
          .write.mode("append").partitionBy("batch_id").parquet(dir)
      }
      e -> dir
    }.toMap
    def streamProbeSec(dir: String): Double = {
      val t = System.nanoTime()
      BatchStore.earlier(spark, dir, Long.MaxValue).as("o")
        .join(probeBatch.as("n"),
          col("o.band_idx") === col("n.band_idx") &&
          col("o.band_hash") === col("n.band_hash"))
        .select(col("o.doc_id"), col("n.doc_id")).distinct().count()
      (System.nanoTime() - t) / 1e9
    }
    def sm3(dir: String): Double =
      median((1 to 3).map(_ => streamProbeSec(dir)))
    val streamPerLayout = streamLayouts.toSeq.sortBy(_._1)
      .map { case (e, dir) => e -> (sm3(dir), parquetFiles(dir)) }
    val st0 = System.nanoTime()
    BatchStore.compact(spark, streamLayouts(16), 16L)
    val streamCompactSec = (System.nanoTime() - st0) / 1e9
    val streamCompactedProbe = sm3(streamLayouts(16))
    val streamCompactedFiles = parquetFiles(streamLayouts(16))
    val streamProbesJson = streamPerLayout
      .map { case (e, (s, _)) => s""""batches_$e":$s""" }.mkString(",")
    val streamFilesJson = streamPerLayout
      .map { case (e, (_, f)) => s""""batches_$e":$f""" }.mkString(",")

    val probesJson = perLayout
      .map { case (e, (s, _, _)) => s""""epochs_$e":$s""" }.mkString(",")
    val filesJson = perLayout
      .map { case (e, (_, f, _)) => s""""epochs_$e":$f""" }.mkString(",")
    // stored rows per layout: equal keys stay UNMERGED across epochs
    // (the start position is a row in every epoch), so row count is the
    // layout's true amplification driver — what every probe re-merges
    val rowsJson = perLayout
      .map { case (e, (_, _, r)) => s""""epochs_$e":$r""" }.mkString(",")
    val json =
      s"""{"metric":"compaction_bench","games":$n,""" +
        s""""probe_s":{$probesJson,"compacted":$compactedProbe},""" +
        s""""files":{$filesJson,"compacted":$compactedFiles},""" +
        s""""rows":{$rowsJson,"compacted":${spark.read.parquet(compacted).count()}},""" +
        s""""compact_s":$compactSec,""" +
        s""""policy_epochs":${StreamingImport.DefaultCompactEpochs},""" +
        s""""stream_probe_s":{$streamProbesJson,"compacted":$streamCompactedProbe},""" +
        s""""stream_files":{$streamFilesJson,"compacted":$streamCompactedFiles},""" +
        s""""stream_compact_s":$streamCompactSec,""" +
        s""""policy_batches":${graft.streaming.BatchStore.DefaultCompactBatches},""" +
        s""""loadavg_pre":$loadPre}"""
    println(); println(json); Console.out.flush()
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("COMPACTION_BENCH.json"), json)
    catch { case _: Throwable => }
    // layouts are TempDirs-registered; the exit reaper deletes them
    spark.stop()
  }
}
