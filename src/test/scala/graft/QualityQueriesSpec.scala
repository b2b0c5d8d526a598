package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.QualityQueries

/** q85/q86 — corpus-statistics quality weighting. The oracle proves
  * cross-engine value equality; these specs prove the properties the
  * oracle can't see: hash-key losslessness (q85 shuffles xxhash64
  * longs, never token strings), the closed feature space that makes
  * q86's profile broadcast-able, and the semantic direction of the
  * importance weights (target-language docs score above baseline).
  */
class QualityQueriesSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, "/root/testdata/sf0.01")

  test("q85: hashed-key path equals the string-keyed twin (hashing lossless)") {
    val hashed = QualityQueries.rareTokenQuality(docs)
      .orderBy("doc_id").collect().toSeq
    val strings = QualityQueries.rareTokenQualityByString(docs)
      .orderBy("doc_id").collect().toSeq
    assert(hashed == strings,
      s"xxhash64 keying changed results: ${hashed.take(3)} vs ${strings.take(3)}")
  }

  test("q85: counts nest (hapax <= rare <= tokens) and fractions are exact ratios") {
    val rows = QualityQueries.rareTokenQuality(docs).collect()
    assert(rows.length == docs.count())
    rows.foreach { case Row(id: Long, n: Long, rare: Long, hapax: Long, frac: Double) =>
      assert(hapax <= rare && rare <= n, s"doc $id: $hapax/$rare/$n")
      assert(frac == rare.toDouble / n, s"doc $id: frac not the exact ratio")
    }
  }

  test("q86: feature buckets stay inside the closed [0, 4096) space") {
    val mm = QualityQueries.docFeatures(docs)
      .agg(min(col("f")), max(col("f"))).head()
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < QualityQueries.NBuckets, mm.toString)
  }

  test("q86: target-language docs weigh above the non-target mean") {
    val byLang = QualityQueries.dsirWeights(docs)
      .groupBy(col("lang")).agg(avg(col("affinity")).as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val others = (byLang - QualityQueries.TargetLang).values
    assert(byLang(QualityQueries.TargetLang) > others.max,
      s"en should dominate every other lang mean: $byLang")
  }

  test("q86: every doc with >=2 tokens is scored, masses are positive") {
    val w = QualityQueries.dsirWeights(docs)
    val expected = docs
      .filter(size(split(trim(col("text")), "\\s+")) >= 2).count()
    assert(w.count() == expected)
    val bad = w.filter(col("t_mass") <= 0 || col("s_mass") <= 0 ||
      col("affinity") <= 0).count()
    assert(bad == 0)
  }

  test("q94: consistent-phrase docs score fluent; common-token salad does not") {
    import spark.implicits._
    // 50 docs share one phrase; the salad doc reuses the SAME common
    // tokens in an unseen order — q85's unigram rarity cannot separate
    // them (every token is corpus-frequent), the transition model can.
    val d = ((0 until 50).map(i => (i.toLong, "alpha beta gamma delta"))
      :+ (99L, "beta alpha delta gamma")).toDF("doc_id", "text")
    val out = QualityQueries.bigramFluency(d)
      .collect().map(r => r.getLong(0) -> r).toMap
    (0 until 50).foreach { i =>
      assert(out(i.toLong).getDouble(4) == 1.0, s"pattern doc $i not fluent")
    }
    // beta->alpha and alpha->delta are 1-in-51 continuations (below
    // 1/16); delta->gamma is delta's only continuation (p=1, fluent)
    val salad = out(99L)
    assert(salad.getLong(1) == 3 && salad.getLong(3) == 3, salad.toString)
    assert(salad.getDouble(4) == 1.0 / 3, salad.toString)
  }

  test("q94: every >=2-token doc is scored; counts nest; frac is the exact ratio") {
    val rows = QualityQueries.bigramFluency(docs).collect()
    val expected = docs
      .filter(size(split(trim(col("text")), "\\s+")) >= 2).count()
    assert(rows.length == expected)
    rows.foreach { case Row(id: Long, n: Long, fl: Long, hx: Long, frac: Double) =>
      assert(fl <= n && hx <= n, s"doc $id: $fl/$hx/$n")
      assert(frac == fl.toDouble / n, s"doc $id: frac not the exact ratio")
    }
  }
}
