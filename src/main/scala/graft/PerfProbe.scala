package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop timing probe: run a handful of named queries (args) with
  * Bench's warm-session discipline and print per-query medians — for
  * iterating on ONE operator's plan without paying a full Bench run.
  * Not part of the driver contract; Bench remains the artifact. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.cleaner.periodicGC.interval", "15s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        if (sys.env.contains("SPARK_GRAFT_PROBE_GC")) {
          val g0 = System.nanoTime()
          System.gc()
          System.err.println(f"[probe] gc ${(System.nanoTime() - g0) / 1e9}%.2f s")
        }
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $name%-28s median ${times(times.size / 2)}%.2f s  (${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
