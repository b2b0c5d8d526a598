package graft.chess

import org.apache.spark.sql.{Dataset, SparkSession}

/** Splittable PGN scan (SURVEY.md §4.3 / M8 — the 100 TB ingest path).
  *
  * `wholetext` reading caps parallelism at one task per FILE and OOMs
  * on multi-GB PGNs. Games, however, are delimited by `[Event ` at
  * line starts, so Hadoop's TextInputFormat with a custom record
  * delimiter (`\n[Event `) yields ONE GAME PER RECORD with correct
  * handling of records that span HDFS-style split boundaries — the
  * same property the reference exploits for its chunked PGN reader.
  * A 10 GB file becomes ~80 parallel 128 MB splits with zero custom
  * InputFormat code.
  */
object PgnSource {

  private val Delim = "\n[Event "

  /** One PGN game text per row, from any mix of files/dirs/globs. */
  def readGameChunks(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", Delim)
    spark.sparkContext
      .newAPIHadoopFile(
        path,
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text],
        conf)
      .map { case (_, text) => text.toString }
      .filter(_.trim.nonEmpty)
      // every record except a file's first had its "[Event " delimiter
      // consumed — restore it so each row is a standalone game chunk
      .map(s => if (s.startsWith("[Event ")) s else "[Event " + s)
      .toDS()
  }

  /** Splittable end-to-end import: path → parsed games. */
  def readGames(spark: SparkSession, path: String,
                level: Byte = Core.Level.Human): Dataset[ChessIngest.GameRow] =
    ChessIngest.parseGames(spark, readGameChunks(spark, path), level)
}
