package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Heuristic language identification (SURVEY.md §2.11 L5): score text
  * against per-language function-word profiles, predict the argmax.
  *
  * Scoring is ONE native UDF pass: the column-expression formulation
  * (per-language `filter(toks, array_contains(...))`) runs on
  * interpreted higher-order functions — 4 langs × every token ×
  * 10-word profile per row dominated the sf0.1 bench. Tie-break is
  * lexicographically-largest language at equal score (identical to the
  * previous `array_max` over (score, lang) structs).
  */
object LangId {
  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"),
    "es" -> Seq("el", "la", "que", "de", "los", "es", "un", "una", "por", "con"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "这", "他")
  )

  private val wordProfiles: Array[(String, Set[String])] =
    profiles.toArray.sortBy(_._1).collect {
      case (lang, words) if lang != "zh" => lang -> words.toSet
    }
  private val zhChars: Array[Char] = profiles("zh").map(_.charAt(0)).toArray

  /** Pure scoring function: language with the most profile hits. */
  def classify(text: String): String = {
    val toks = text.trim.toLowerCase.split("\\s+")
    var bestLang = ""
    var bestScore = Long.MinValue
    def consider(lang: String, score: Long): Unit =
      if (score > bestScore || (score == bestScore && lang > bestLang)) {
        bestLang = lang; bestScore = score
      }
    wordProfiles.foreach { case (lang, words) =>
      var hits = 0L
      var i = 0
      while (i < toks.length) { if (words.contains(toks(i))) hits += 1; i += 1 }
      consider(lang, hits)
    }
    // zh has no spaces: count profile-char occurrences in the raw text
    var zh = 0L
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var j = 0
      while (j < zhChars.length) { if (c == zhChars(j)) zh += 1; j += 1 }
      i += 1
    }
    consider("zh", zh)
    bestLang
  }

  private val classifyUdf = udf(classify _)

  /** Adds `lang_pred` to any DataFrame with a `text` column. */
  def predict(docs: DataFrame): DataFrame =
    docs.withColumn("lang_pred", classifyUdf(col("text")))
}
