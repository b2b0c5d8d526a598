package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming benchmark decontamination (SURVEY.md §2.9 × §2.11 L5e):
  * documents arrive as a stream and must be tagged against a STATIC
  * eval-set blocklist before entering the training corpus.
  *
  * This is the stream–static join pattern: the blocklist is a bounded
  * table (eval sets are MBs), so it collapses to ONE broadcast row
  * holding the distinct gram set, and tagging is a stateless
  * `arrays_overlap` projection — no watermark, no state store, valid in
  * append mode at any stream rate. The exact same code path runs in
  * batch (the spec's equivalence gate), because nothing here is
  * stream-specific.
  *
  * Deliberately NOT an exploded gram join on the stream side: explode +
  * distinct-per-doc would need stateful aggregation (watermarked) to
  * re-collapse to one row per doc; testing set overlap against the
  * broadcast array keeps the stream side narrow.
  */
object StreamingDecontaminate {
  import graft.operators.TextQueries.tokenTrigrams

  /** Distinct trigrams of the benchmark (eval) docs — the static
    * blocklist side. */
  def blocklist(benchDocs: DataFrame): DataFrame =
    benchDocs
      .select(split(trim(col("text")), "\\s+").as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(explode(array_distinct(tokenTrigrams(col("ts")))).as("g"))
      .distinct()

  /** Tag each (streaming or batch) doc with `contaminated`: does it
    * share any trigram with the blocklist? One stateless projection
    * against a single broadcast row. The trigram build is guarded
    * INSIDE the expression: under 3 tokens, sequence(0, size-3)
    * descends through index 0 and element_at throws — the && short
    * circuit alone does not prevent `grams` from evaluating. */
  def tag(docs: DataFrame, blocklistGrams: DataFrame): DataFrame = {
    val bl = blocklistGrams.agg(collect_set(col("g")).as("bl"))
    docs
      .withColumn("ts", split(trim(col("text")), "\\s+"))
      .withColumn("grams", when(size(col("ts")) >= 3,
        array_distinct(tokenTrigrams(col("ts")))).otherwise(array().cast("array<string>")))
      .crossJoin(broadcast(bl))
      .withColumn("contaminated", arrays_overlap(col("grams"), col("bl")))
      .drop("ts", "grams", "bl")
  }
}
