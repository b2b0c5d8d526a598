package graft.operators

import org.apache.spark.sql.SparkSession

/** The cross-query shared materialized stages (q53→q54 pair stage,
  * q77→q78 decode stage, q79's written IVF index), built eagerly and
  * TIMED — so Bench can warm them before the measured runs and emit
  * their build cost as a first-class artifact field ("stage_build")
  * instead of letting median-of-N silently discard the ingest cost of
  * the first run. The headline per-query times then measure steady-state
  * probe/compose cost (what repeats in production), while the one-time
  * stage cost stays auditable next to them. */
object SharedStages {

  /** Build (memoized per session via StageCache) every shared stage at
    * `d`, returning build seconds per stage. */
  def warm(s: SparkSession, d: String): Map[String, Double] = {
    def time(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    Map(
      "ngram_pairs" -> time(TextQueries.ngramPairsStage(s, d).count()),
      "media_features" -> time(MultimodalQueries.mediaFeaturesStage(s, d).count()),
      "shot_frames" -> time(MultimodalQueries.shotFramesStage(s, d).count()),
      "ivf_index" -> time(VectorQueries.ivfIndexDir(s, d)),
      "shard_export" -> time(TextQueries.shardExportDir(s, d)),
      "pq_model" -> time(VectorQueries.pqModel(s, d)),
      "pq_residual_model" -> time(VectorQueries.pqResidualModel(s, d)),
      "bpe_encode" -> time(TextQueries.bpeEncodedStage(s, d).count()),
      "knn_graph" -> time(VectorQueries.knnGraph(s, d).count()),
      "pca_model" -> time(Pca.model(s, d)))
  }
}
