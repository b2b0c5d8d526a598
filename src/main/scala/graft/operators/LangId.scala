package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heuristic language identification (SURVEY.md §2.11 L5): score text
  * against per-language function-word profiles, predict the argmax.
  *
  * A deliberately simple, fully-codegen'd n-gram/stopword profile — the
  * point is the Spark surface (pure column expressions, no UDF, linear
  * scan), not SOTA accuracy. argmax is computed via array_max over
  * (score, lang) structs → deterministic lexicographic tie-break.
  */
object LangId {
  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"),
    "es" -> Seq("el", "la", "que", "de", "los", "es", "un", "una", "por", "con"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "这", "他")
  )

  /** Adds `lang_pred` to any DataFrame with a `text` column. The token
    * array is materialized ONCE into a temp column — inlining it would
    * re-evaluate the split regex once per language profile (measured
    * ~6× slower at sf0.001). */
  def predict(docs: DataFrame): DataFrame = {
    val withToks = docs.withColumn("__toks", split(trim(lower(col("text"))), "\\s+"))
    val scored: Seq[Column] = profiles.toSeq.sortBy(_._1).map {
      case (lang, words) =>
        val wordArr = array(words.map(lit): _*)
        val hits = size(filter(col("__toks"), t => array_contains(wordArr, t)))
        // zh has no spaces: count profile-char occurrences instead.
        val score =
          if (lang == "zh")
            words.map(w => size(split(col("text"), w, -1)) - 1)
              .reduce(_ + _)
          else hits
        struct(score.cast("long").as("score"), lit(lang).as("lang"))
    }
    withToks.withColumn("lang_pred",
      array_max(array(scored: _*)).getField("lang"))
      .drop("__toks")
  }
}
