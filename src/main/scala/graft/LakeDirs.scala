package graft

import org.apache.spark.sql.SparkSession

/** Layout-root resolution for the written index/shard layouts (q79's
  * IVF index, q84's shard export, q90's streamed index): a deployment
  * points the conf at a lake prefix (`file:`, `hdfs:`, `s3a:` — any
  * Hadoop-FileSystem scheme; everything downstream of the returned
  * string goes through `spark.read`/`write` and [[Fs]], never
  * `java.io.File`) and the layout lands under
  * `<prefix>/<kind>/<corpus-basename>`, one root per corpus so scale
  * factors don't collide. Unset, the layout builds under a registered
  * JVM-lifetime temp dir — the harness mode, same default the conf'd
  * compaction triggers use. */
object LakeDirs {

  def resolve(s: SparkSession, conf: String, kind: String, corpusDir: String): String =
    s.conf.get(conf, "") match {
      case "" => TempDirs.register(
        java.nio.file.Files.createTempDirectory(s"graft-$kind").toString)
      case base =>
        s"${base.stripSuffix("/")}/$kind/" +
          new org.apache.hadoop.fs.Path(corpusDir).getName
    }
}
