package graft

import org.apache.spark.sql.functions._
import graft.operators.LangId

class LangIdSpec extends SparkTestBase {
  import spark.implicits._

  test("predicts obvious languages from function words") {
    val docs = Seq(
      (0L, "the cat is on the mat and it is happy that the sun is out"),
      (1L, "der Hund ist nicht zu Hause und die Katze ist mit den Kindern"),
      (2L, "le chat est sur la table et les enfants sont pour une fois calmes"),
      (3L, "el perro es un animal que vive con los humanos por una larga historia")
    ).toDF("doc_id", "text")
    val preds = LangId.predict(docs)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(preds(0L) == "en")
    assert(preds(1L) == "de")
    assert(preds(2L) == "fr")
    assert(preds(3L) == "es")
  }

  test("majority accuracy on labeled testdata documents") {
    val docs = Tables.documents(spark, sf)
    val scored = LangId.predict(docs)
      .select(when(col("lang") === col("lang_pred"), 1.0).otherwise(0.0).as("hit"))
      .agg(avg("hit")).as[Double].head()
    // Heuristic profile over synthetic text: just assert it beats chance.
    assert(scored > 0.2, s"lang-id accuracy $scored should beat 1/5 chance")
  }
}
