package graft.chess

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Console entrypoint mirroring the reference's command surface
  * (create / merge / query-server / dump / bench — SURVEY.md §3):
  *
  * {{{
  * runMain graft.chess.App create <pgn|bcgn> <storeDir> [alpha|beta|delta|epsilon]
  *                                                          splittable import -> epoch 0 (delta) or a format-generation store
  * runMain graft.chess.App append <pgnPath> <storeDir>     add another epoch (incremental)
  * runMain graft.chess.App merge  <storeDir> <outDir>      compact epochs to one
  * runMain graft.chess.App dump   <pgnPath> <outTsv> [min] EPD dump (book building)
  * runMain graft.chess.App server <pgnPath> <port>         TCP query server
  * runMain graft.chess.App bench  [nGames]                 synthetic import+probe bench
  * runMain graft.chess.App tobcgn <pgnPath> <bcgnDir>      PGN -> S3 binary interchange
  * }}}
  */
object App {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Games from either interchange format: a .bcgn dir/file (S3 binary
    * codec, via the DataSource V2 connector — a single-file path loads
    * exactly that file, not its parent directory's sibling corpora) or
    * PGN text (S1). */
  private def readGames(spark: SparkSession, path: String) = {
    import spark.implicits._
    val f = new java.io.File(path)
    val isBcgn = path.endsWith(".bcgn") ||
      (f.isDirectory && Option(f.list()).exists(_.exists(_.endsWith(".bcgn"))))
    if (isBcgn) spark.read.format("bcgn").load(path).as[ChessIngest.GameRow]
    else PgnSource.readGames(spark, path)
  }

  def main(args: Array[String]): Unit = {
    val spark = session()
    args.toList match {
      case "tobcgn" :: pgn :: out :: Nil =>
        Bcgn.write(PgnSource.readGames(spark, pgn), out)
        println(s"[tobcgn] wrote $out")

      case "create" :: pgn :: store :: rest =>
        val agg = ChessIngest.positionsAgg(ChessIngest.positionStream(spark,
          readGames(spark, pgn)))
        rest.headOption match {
          // reference: create <format> ... — non-delta generations write
          // their measure-set/layout profile (EntryFormats), no epochs
          case Some(fmtName) if fmtName != "delta" =>
            EntryFormats.write(agg, EntryFormats.byName(fmtName), store)
            println(s"[store] $store: format=$fmtName, " +
              s"${spark.read.parquet(store).count()} entries")
          case _ =>
            agg.withColumn("epoch", lit(0L))
              .write.mode("overwrite").partitionBy("epoch").parquet(store)
            report(spark, store)
        }

      case "append" :: pgn :: store :: Nil =>
        // partition-dir inference yields int for epoch=N — cast first
        val nextEpoch = spark.read.parquet(store)
          .agg(max(col("epoch").cast("long"))).head().getLong(0) + 1L
        ChessIngest.positionsAgg(ChessIngest.positionStream(spark,
            readGames(spark, pgn)))
          .withColumn("epoch", lit(nextEpoch))
          .write.mode("append").partitionBy("epoch").parquet(store)
        report(spark, store)

      case "merge" :: store :: out :: Nil =>
        StreamingImport.compact(spark, store, out)
        report(spark, out)

      case "dump" :: pgn :: out :: rest =>
        val minCount = rest.headOption.map(_.toLong).getOrElse(2L)
        EpdDump.dump(spark, readGames(spark, pgn), minCount)
          .withColumn("line", concat_ws("\t", col("epd"), col("games"),
            col("white_wins"), col("draws"), col("black_wins")))
          .select("line")
          .write.mode("overwrite").text(out)
        println(s"[dump] wrote $out (minCount=$minCount)")

      case "server" :: pgn :: port :: Nil =>
        import spark.implicits._
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(pgn)))
        val agg = ChessIngest.positionsAgg(ChessIngest.positionStream(spark,
          ChessIngest.parseGames(spark, spark.createDataset(Seq(text)),
            Core.Level.Human))).cache()
        agg.count()
        println(s"[server] listening on $port")
        ChessServer.serveTcp(spark, agg, port.toInt)

      case "bench" :: rest =>
        val n = rest.headOption.map(_.toInt).getOrElse(2000)
        // corpus generation (random self-play, movegen-bound) is NOT
        // part of the import metric — materialize it first
        val tg = System.nanoTime()
        val corpus = RandomGames.generate(spark, n, maxPlies = 60).cache()
        corpus.count()
        val tGen = (System.nanoTime() - tg) / 1e9
        val t0 = System.nanoTime()
        val occ = ChessIngest.positionStream(spark, corpus).cache()
        val nOcc = occ.count()
        val agg = ChessIngest.positionsAgg(occ, approxGames = n).cache()
        val nEntries = agg.count()
        val tImport = (System.nanoTime() - t0) / 1e9
        println(f"""{"gen_s":$tGen%.2f}""")
        // batch probe: every distinct position key probed back at once
        val t1 = System.nanoTime()
        val probes = occ.select("posHi", "posLo").distinct()
        val hits = agg.join(probes, Seq("posHi", "posLo")).count()
        val tProbe = (System.nanoTime() - t1) / 1e9
        println(f"""{"bench":"chess","games":$n,"positions":$nOcc,"entries":$nEntries,"import_s":$tImport%.2f,"pos_per_s":${(nOcc / tImport).toLong},"probe_keys":${hits},"probe_s":$tProbe%.2f}""")

      case other =>
        System.err.println(s"unknown command: ${other.mkString(" ")}")
        System.err.println("usage: create|append|merge|dump|server|bench (see scaladoc)")
    }
    spark.stop()
  }

  private def report(spark: SparkSession, store: String): Unit = {
    val df = spark.read.parquet(store)
    val epochs = df.select("epoch").distinct().count()
    println(s"[store] $store: ${df.count()} entries across $epochs epoch(s)")
  }
}
