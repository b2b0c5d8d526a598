package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-scale demonstration of the dedup pipeline (the LLM-data
  * counterpart of `chess.App bench`): generate a synthetic document
  * corpus ON EXECUTORS (seeded per doc_id — no data movement, stable
  * across cluster sizes), then run the full near-dup stack at volume:
  *
  *   exact dedup → MinHash-LSH candidates → exact n-gram Jaccard
  *   (prefix-filtered) → connected components → keep-best-per-cluster
  *
  * Planted structure makes the output checkable: each 20-block with a
  * base id >= 20 is a 4-member dup cluster — the base doc, an exact
  * copy at +1, and near-dups at +2/+3 (3-4 tokens substituted out of
  * ~200) — so expected counts scale linearly with n (see textFor).
  *
  * Prints one JSON line: per-stage seconds + docs/s + found counts.
  * Run: sbt "runMain graft.PipelineBench [nDocs]"   (default 100000)
  */
object PipelineBench {

  private val Vocab: Array[String] = {
    val rnd = new scala.util.Random(1234567L)
    Array.fill(500)(Iterator.continually(rnd.nextInt(26)).take(6)
      .map(c => ('a' + c).toChar).mkString)
  }

  private def tokensFor(id: Long): Array[String] = {
    val rnd = new scala.util.Random(0x5eed0002L ^ (id * 0x9e3779b97f4a7c15L))
    Array.fill(150 + (id % 100).toInt)(Vocab(rnd.nextInt(Vocab.length)))
  }

  /** Deterministic doc text. Every 20-block is a planted 4-member dup
    * cluster over its BASE doc (id ≡ 0 mod 20): +1 = exact copy,
    * +2/+3 = near-dups with 3/4 token substitutions (trigram Jaccard
    * ≈ 0.85–0.95). Specials only ever derive from base docs, so the
    * expected cluster structure is exactly n/20 4-cliques. */
  def textFor(id: Long): String = {
    val off = id % 20
    if (id >= 20 && off == 1) tokensFor(id - 1).mkString(" ")
    else if (id >= 20 && (off == 2 || off == 3)) {
      val t = tokensFor(id - off)
      val rnd = new scala.util.Random(0xd1f0 ^ id)
      (0 until off.toInt + 1).foreach(_ =>
        t(rnd.nextInt(t.length)) = Vocab(rnd.nextInt(Vocab.length)))
      t.mkString(" ")
    } else tokensFor(id).mkString(" ")
  }

  def generate(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { id => (id, textFor(id)) }
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
  }

  /** Deterministic synthetic embedding: unit vector near one of
    * `topics` well-separated planted centers (topic = id % topics, so
    * ids 0..topics-1 — the k-means seeds — cover every topic once). */
  def embFor(id: Long, dim: Int = 64, topics: Int = 100): Array[Double] = {
    val c = new scala.util.Random(0xc0ffee ^ (id % topics))
    val r = new scala.util.Random(0xe4bL ^ (id * 0x9e3779b97f4a7c15L))
    val v = Array.fill(dim)(c.nextGaussian() + r.nextGaussian() * 0.3)
    val nrm = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / nrm)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (docs, tGen) = timed {
      val d = generate(spark, n).localCheckpoint(); d.count(); d
    }
    val (nExact, tExact) = timed {
      docs.groupBy(md5(col("text"))).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).count()
    }
    val (nMinhash, tMinhash) = timed {
      operators.MinHashLSH.verifiedPairs(docs, minJaccard = 0.8).count()
    }
    val (pairs, tNgram) = timed {
      val p = operators.NgramJoin.similarPairs(docs, 3, 0.8).localCheckpoint()
      p.count(); p
    }
    val ((nClusters, nMembers), tCC) = timed {
      // driverThreshold=0 pins the DISTRIBUTED star-contraction path —
      // this bench demonstrates the 100 TB shape, not the small-graph
      // driver fast path the hybrid would pick at this edge count
      val lab = operators.ConnectedComponents.labels(spark,
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")),
        driverThreshold = 0L)
      (lab.select("comp_id").distinct().count(), lab.count())
    }
    // Benchmark decontamination at volume: every 997th doc forms the
    // held-out eval slice; its distinct-trigram blocklist broadcasts
    // and the corpus side is one narrow scan + map-side semi join.
    val (nContam, tDecon) = timed {
      val g = docs
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
        .filter(size(col("ts")) >= 3)
        .select(col("doc_id"), explode(array_distinct(
          operators.TextQueries.tokenTrigrams(col("ts")))).as("g"))
      val bench = g.filter(col("doc_id") % 997 === 0).select(col("g")).distinct()
      g.filter(col("doc_id") % 997 =!= 0).join(broadcast(bench), "g")
        .select(col("doc_id")).distinct().count()
    }
    // Topic clustering at volume: 100 planted centers, 3 Lloyd rounds
    // from the deterministic one-seed-per-topic start. Perfect recovery
    // means 100 clusters of exactly n/100 members each.
    val (kmStats, tKm) = timed {
      import spark.implicits._
      // checkpoint: lloyd makes 2 passes per round (assign + means) and
      // would otherwise regenerate the corpus each time
      val e = spark.range(n.toLong).map(id => (id, embFor(id)))
        .toDF("vec_id", "emb").localCheckpoint()
      val prof = operators.KMeans.clusterProfile(e, 100, 3)
      val r = prof.agg(count(lit(1)), min(col("n_members")),
        max(col("n_members"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val total = tGen + tExact + tMinhash + tNgram + tCC + tDecon + tKm
    println(s"""{"metric":"pipeline_bench","n_docs":$n,""" +
      s""""gen_s":${f"$tGen%.2f"},"exact_s":${f"$tExact%.2f"},""" +
      s""""minhash_s":${f"$tMinhash%.2f"},"ngram_s":${f"$tNgram%.2f"},""" +
      s""""cc_s":${f"$tCC%.2f"},"decon_s":${f"$tDecon%.2f"},""" +
      s""""kmeans_s":${f"$tKm%.2f"},"total_s":${f"$total%.2f"},""" +
      s""""docs_per_s":${(n / total).toInt},""" +
      s""""exact_dup_groups":$nExact,"minhash_pairs":$nMinhash,""" +
      s""""ngram_pairs":${pairs.count()},"clusters":$nClusters,"clustered_docs":$nMembers,""" +
      s""""contaminated_docs":$nContam,""" +
      s""""km_clusters":${kmStats._1},"km_min_size":${kmStats._2},"km_max_size":${kmStats._3}}""")
    spark.stop()
  }
}
