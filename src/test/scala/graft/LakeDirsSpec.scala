package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, VectorQueries}

/** The conf'd lake-path layer: with `spark.graft.*.dir` set, the
  * written layouts (q79 IVF index, q84 shards) land under the conf'd
  * prefix — resolved and probed exclusively through the Hadoop
  * FileSystem API, so a `file:`-scheme URI here stands in for the
  * hdfs:/s3a: deployment path — and the store machinery (write, probe,
  * epoch append, compaction guard) works against it unchanged. Unset,
  * resolution falls back to a registered temp dir (the harness mode). */
class LakeDirsSpec extends SparkTestBase {

  private val conf = "spark.graft.test.lakeDir"

  test("unset conf resolves to a fresh temp dir per call") {
    val a = LakeDirs.resolve(spark, conf, "k", "/data/sf1")
    val b = LakeDirs.resolve(spark, conf, "k", "/data/sf1")
    assert(a != b && new java.io.File(a).isDirectory)
  }

  test("conf'd prefix resolves deterministically, scale factors don't collide") {
    spark.conf.set(conf, "file:/lake/root/")
    try {
      assert(LakeDirs.resolve(spark, conf, "q79_ivf", "/data/sf1") ==
        "file:/lake/root/q79_ivf/sf1")
      assert(LakeDirs.resolve(spark, conf, "q79_ivf", "/data/sf2") ==
        "file:/lake/root/q79_ivf/sf2")
      assert(LakeDirs.resolve(spark, conf, "q84_shards", "/data/sf1") ==
        "file:/lake/root/q84_shards/sf1")
    } finally spark.conf.unset(conf)
  }

  test("the whole IVF store cycle runs against a file:-scheme conf'd dir") {
    val base = "file:" + TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft-lake").toString)
    spark.conf.set(conf, base)
    val dir =
      try LakeDirs.resolve(spark, conf, "ivf", sf)
      finally spark.conf.unset(conf)
    assert(dir.startsWith("file:"), dir)

    val e = VectorQueries.emb(spark, sf)
    val n = e.count()
    val nlist = VectorQueries.ivfNList(n)
    IvfIndex.writeIndexed(e, dir, nlist, Some(n))
    assert(Fs.exists(s"$dir/centroids") && Fs.exists(s"$dir/index"))

    // probe through the layout == in-memory answer (q79's contract)
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("emb").as("pemb"))
    val got = IvfIndex.topKIndexed(probes, dir,
        VectorQueries.ivfNProbe(nlist), k = 3)
      .select("probe_id", "vec_id", "rn").collect().map(_.toSeq).toSet
    val want = IvfIndex.topK(e, probes, nlist,
        VectorQueries.ivfNProbe(nlist), k = 3, Some(n))
      .select("probe_id", "vec_id", "rn").collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)

    // the compaction same-layout guard compares FS-qualified paths, so
    // it fires for the same dir spelled through a different scheme too
    val bare = dir.stripPrefix("file:")
    intercept[IllegalArgumentException] {
      IvfIndex.compactEpochs(spark, dir, bare)
    }
    // and a genuinely different sibling passes + yields an equal index
    IvfIndex.compactEpochs(spark, dir, s"$dir-compacted")
    val comp = IvfIndex.topKIndexed(probes, s"$dir-compacted",
        VectorQueries.ivfNProbe(nlist), k = 3)
      .select("probe_id", "vec_id", "rn").collect().map(_.toSeq).toSet
    assert(comp == want)
  }
}
