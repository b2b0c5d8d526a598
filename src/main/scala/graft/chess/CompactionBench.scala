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
        s""""loadavg_pre":$loadPre}"""
    println(); println(json); Console.out.flush()
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("COMPACTION_BENCH.json"), json)
    catch { case _: Throwable => }
    // layouts are TempDirs-registered; the exit reaper deletes them
    spark.stop()
  }
}
