package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Heuristic language identification (SURVEY.md §2.11 L5): score text
  * against per-language function-word profiles, predict the argmax.
  *
  * Scoring is ONE pass per row through a native codegen'd expression
  * (`LangIdExpr`): the column-expression formulation (per-language
  * `filter(toks, array_contains(...))`) runs on interpreted
  * higher-order functions, and the earlier Scala-UDF form paid the
  * encoder ser/de round trip per row — the expression stays inside
  * whole-stage codegen and calls the scoring loop directly. Tie-break
  * is lexicographically-largest language at equal score.
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

  /** Adds `lang_pred` to any DataFrame with a `text` column. */
  def predict(docs: DataFrame): DataFrame =
    docs.withColumn("lang_pred",
      GraftSqlBridge.column(LangIdExpr(GraftSqlBridge.expression(col("text")))))
}

/** Codegen'd classifier: generated code calls `LangId.classify` on the
  * UTF8String directly — no UDF encoder round trip, and the expression
  * participates in whole-stage codegen so the surrounding project/agg
  * stays in one generated stage. */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(t: Any): Any =
    UTF8String.fromString(LangId.classify(t.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.operators.LangId.classify($c.toString()));")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}
