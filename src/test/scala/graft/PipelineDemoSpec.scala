package graft

import org.apache.spark.sql.functions._
import graft.operators.{ConnectedComponents, KMeans, NgramJoin, TextQueries}

/** CI-scale gate for the PipelineBench demo logic: the planted
  * structure must be recovered EXACTLY at n=1000, so regressions in the
  * generator or any stage fail here instead of only at demo time. */
class PipelineDemoSpec extends SparkTestBase {
  import spark.implicits._

  private val n = 1000
  private lazy val docs = PipelineBench.generate(spark, n).localCheckpoint()

  // planted: every 20-block with base id >= 20 is a 4-clique
  // (base, exact copy, two near-dups); block 0 plants nothing
  private val plantedClusters = (n / 20) - 1

  test("exact dedup finds exactly the planted copies") {
    val groups = docs.groupBy(md5($"text")).agg(count(lit(1)).as("c"))
      .filter($"c" > 1)
    assert(groups.count() == plantedClusters)
    assert(groups.agg(max($"c")).head().getLong(0) == 2L)
  }

  test("ngram join + connected components recover the planted 4-cliques") {
    val pairs = NgramJoin.similarPairs(docs, 3, 0.8)
    val lab = ConnectedComponents.labels(spark,
      pairs.select($"doc_a".as("src"), $"doc_b".as("dst")))
    val sizes = lab.groupBy($"comp_id").agg(count(lit(1)).as("m"))
      .select($"m").as[Long].collect()
    assert(sizes.length == plantedClusters, s"got ${sizes.length} clusters")
    assert(sizes.forall(_ == 4L), "every planted cluster is a 4-clique")
  }

  test("planted topics are recovered exactly by 3 Lloyd rounds") {
    val e = spark.range(n.toLong).map(id => (id, PipelineBench.embFor(id)))
      .toDF("vec_id", "emb").localCheckpoint()
    val prof = KMeans.clusterProfile(e, 100, 3)
      .select($"cluster_id", $"n_members").as[(Long, Long)].collect()
    assert(prof.length == 100)
    assert(prof.forall(_._2 == n / 100),
      s"expected uniform ${n / 100}-member topics, got ${prof.take(5).mkString}")
  }

  test("decontamination flags every member of a benchmark doc's clique") {
    // 997 > n, so make the bench slice id % 100 == 0 here: base docs
    // whose whole 4-clique shares (nearly) all trigrams
    val ts = split(trim($"text"), "\\s+")
    val g = docs.select($"doc_id", ts.as("ts"))
      .filter(size($"ts") >= 3)
      .select($"doc_id",
        explode(array_distinct(TextQueries.tokenTrigrams($"ts"))).as("g"))
    val bench = g.filter($"doc_id" % 100 === 0).select($"g").distinct()
    val flagged = g.filter($"doc_id" % 100 =!= 0).join(broadcast(bench), "g")
      .select($"doc_id").distinct().as[Long].collect().toSet
    // every bench base doc's exact copy (id+1) must be flagged
    val copies = (100L until n by 100).filter(_ % 20 == 0).map(_ + 1)
    copies.foreach(c => assert(flagged.contains(c), s"copy $c not flagged"))
  }
}
