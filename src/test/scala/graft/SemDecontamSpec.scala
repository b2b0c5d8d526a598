package graft

import org.apache.spark.sql.functions._

/** q283 semantic eval-set decontamination — the PLANTED-PARAPHRASE
  * guard the verdict asked for: the synthetic testdata has no labeled
  * paraphrases (q283 legitimately flags nothing at sf0.001), so this
  * spec constructs the exact leak class the operator exists for — a
  * corpus document whose TEXT shares tokens but not one token trigram
  * with an eval document (q63's n-gram decontaminator scores it
  * clean) while its EMBEDDING sits within SemEps of the eval vector —
  * writes it as a real parquet pair and drives the REGISTERED query
  * over it. Geometry: ±basis seed directions (semK floors at 16 =
  * 2·dim), the planted neighbor is a NON-seed id so the 2-round Lloyd
  * assignment buckets it with the eval vector's cell.
  */
class SemDecontamSpec extends SparkTestBase {

  private val Dim = 8

  private def unit(i: Int, sign: Double): Array[Float] = {
    val v = Array.fill(Dim)(0.0f); v(i) = sign.toFloat; v
  }

  /** normalize(a + eps·b) in float space. */
  private def mix(a: Array[Float], b: Array[Float], eps: Double): Array[Float] = {
    val m = a.indices.map(i => a(i) + eps * b(i)).toArray
    val n = math.sqrt(m.map(x => x * x).sum)
    m.map(x => (x / n).toFloat)
  }

  private val evalText =
    "the cat sat on the mat and looked around quietly before sleeping"
  // shares tokens ("the", "cat", "and") but NO token trigram
  private val paraText =
    "the cat rested upon a rug and gazed about silently until asleep"

  private def trigrams(t: String): Set[Seq[String]] =
    t.trim.split("\\s+").filter(_.nonEmpty).toSeq.sliding(3).toSet

  test("planted paraphrase: flagged semantically, invisible to q63's trigrams") {
    val dir = java.nio.file.Files
      .createTempDirectory("semdecontam").toString
    // ids 0..15 are the Lloyd seeds (±e_i); 16..31 are non-seeds near
    // the NEGATIVE directions (cells 8..15) — except id 20, the
    // planted paraphrase, mixed tight around +e0 = the eval vector
    val vecs = (0 until 32).map { id =>
      val v =
        if (id < 8) unit(id, 1.0)
        else if (id < 16) unit(id - 8, -1.0)
        else if (id == 20) mix(unit(0, 1.0), unit(1, 1.0), 0.25)
        else mix(unit((id - 16) % 8, -1.0), unit((id - 15) % 8, 1.0), 0.1)
      (id.toLong, v, 0)
    }
    val docs = (0 until 32).map { id =>
      val (text, lang) =
        if (id == 0) (evalText, "en")
        else if (id == 20) (paraText, "en")
        else (s"filler document number $id with unrelated words", "xx")
      (id.toLong, text, lang, "srcT", text.length.toLong)
    }
    import spark.implicits._
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    // the leak is real: embedding-close...
    val e0 = vecs(0)._2.map(_.toDouble)
    val p = vecs(20)._2.map(_.toDouble)
    val cos = e0.indices.map(i => e0(i) * p(i)).sum /
      (math.sqrt(e0.map(x => x * x).sum) * math.sqrt(p.map(x => x * x).sum))
    assert(cos >= graft.operators.VectorQueries.SemEps,
      s"planted cosine $cos below SemEps — the plant is broken")
    // ...but trigram-invisible, and not because the texts are alien
    assert(trigrams(evalText).intersect(trigrams(paraText)).isEmpty,
      "texts share a trigram — q63 would catch this, plant is too easy")
    val sharedToks = evalText.split(" ").toSet
      .intersect(paraText.split(" ").toSet)
    assert(sharedToks.size >= 2,
      s"paraphrase shares only $sharedToks — not paraphrase-shaped")

    val out = SparkEntry.queries("q283_sem_decontam")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    // eval doc 0 leaves the corpus side; the paraphrase is en's only
    // corpus doc and IS flagged, with the planted cosine
    val en = out("en")
    assert(en.getLong(1) == 1L && en.getLong(2) == 1L,
      s"en row $en — the planted paraphrase was not flagged")
    assert(math.abs(en.getDouble(3) - cos) < 5e-5,
      s"max_cos ${en.getDouble(3)} != planted $cos")
    // no false flags: every other doc sits in a negative-direction
    // cell, far from the only eval vector
    val xx = out("xx")
    assert(xx.getLong(1) == 30L && xx.getLong(2) == 0L,
      s"xx row $xx — false flags on unrelated docs")

    // and the q63-style decontaminator really misses it: zero shared
    // distinct trigrams means zero `shared` rows for doc 20
    val ts = split(trim(col("text")), "\\s+")
    val g = Tables.documents(spark, dir)
      .select(col("doc_id"), ts.as("ts")).filter(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("ts")) - 3), i =>
          concat_ws(" ", element_at(col("ts"), i + 1),
            element_at(col("ts"), i + 2),
            element_at(col("ts"), i + 3))))).as("g"))
    val benchGrams = g.filter(col("doc_id") === 0L).select(col("g"))
    val hits = g.filter(col("doc_id") === 20L)
      .join(benchGrams, "g").count()
    assert(hits == 0L,
      s"trigram decontamination caught the plant ($hits shared) — " +
        "the semantic pass is not demonstrating anything trigrams can't")
  }
}
