package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.NearestCentroid
import graft.functions.Num._

/** Distributed spherical k-means (Lloyd iterations) over an embedding
  * corpus (SURVEY.md §2.11 L3 — the clustering step of a training-data
  * pipeline: topic bucketing, domain mixing, curriculum grouping).
  *
  * Shape per iteration:
  *   1. ASSIGN — one narrow codegen'd projection: each vector scores the
  *      k current centroids via the broadcast [[NearestCentroid]]
  *      expression (cosine argmax, ties to the larger cell id). No
  *      shuffle, no join; plan size is O(1) in k (the centroid matrix
  *      travels as a Spark broadcast, never as plan literals — the
  *      IvfIndex lesson).
  *   2. UPDATE — per-(cluster, dim) means via posexplode + a partial+
  *      final hash aggregation. The sums route through DECIMAL
  *      ([[graft.functions.Num.dsum]]) so the means are accumulation-
  *      order independent: bit-identical run to run and to the DuckDB
  *      oracle, which is what lets an ITERATIVE float algorithm keep a
  *      hash-exact oracle (any ulp drift in iteration i would cascade
  *      into different assignments at i+1).
  *   3. The k×dim mean matrix (tiny: k and dim are model constants, not
  *      data-scaled) collects to the driver and broadcasts for the next
  *      assignment pass.
  *
  * At 100 TB each iteration is one scan + one shuffle of k×dim rows —
  * the textbook distributed Lloyd plan. Seeding is deterministic
  * (vectors with id < k), so runs are reproducible without RNG
  * coordination.
  */
object KMeans {
  import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}

  /** Deterministic seed centroids: the embedding vectors with
    * vec_id < k, in id order (cid i = vector i). The ids must densely
    * cover 0..k-1 — cid is the POSITION in this array, and the q65/q68
    * oracles equate it with vec_id, so a sparse id space would silently
    * shift every label. */
  def seedCentroids(points: DataFrame, k: Int): Array[Array[Double]] = {
    val seeds = points.filter(col("vec_id") < k)
      .select(col("vec_id"), col("emb"))
      .collect()
      .sortBy(_.getLong(0))
    require(seeds.length == k && seeds.zipWithIndex.forall {
        case (r, i) => r.getLong(0) == i },
      s"seed ids must be exactly 0..${k - 1}; got ${seeds.map(_.getLong(0)).mkString(",")}")
    seeds.map(_.getSeq[Double](1).toArray)
  }

  /** (vec_id, emb, cid) — one assignment pass against the given
    * centroid matrix. */
  def assign(points: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val bc = points.sparkSession.sparkContext.broadcast(cents)
    points.withColumn("cid", toCol(NearestCentroid(toExpr(col("emb")), bc)))
  }

  /** Per-cluster decimal-exact component means of the assigned points,
    * as a driver-side matrix keyed by cid (empty clusters drop out, so
    * the result maps cid -> centroid, not a dense array). */
  def meanCentroids(assigned: DataFrame): Map[Int, Array[Double]] =
    assigned.select(col("cid"), posexplode(col("emb")))
      .groupBy(col("cid"), col("pos"))
      .agg((dsum(col("col"), 12) / count(lit(1))).as("cx"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      }

  /** The trained clustering model after `iters` Lloyd rounds: the
    * surviving cluster ids (original labels, sorted) and their centroid
    * matrix in that order. Model-sized — broadcastable, reusable to
    * assign DIFFERENT data (e.g. an arriving stream) under the frozen
    * clustering, which is what keeps incremental consumers
    * batch-identical. */
  def lloydModel(points: DataFrame, k: Int, iters: Int): (Array[Int], Array[Array[Double]]) = {
    require(iters >= 1, "at least one assignment pass")
    var cids = (0 until k).toArray
    var cents = seedCentroids(points, k)
    for (_ <- 2 to iters) {
      val means = meanCentroids(assign(points, cents))
      cids = cids.filter(means.contains).sorted
      cents = cids.map(means)
    }
    (cids, cents)
  }

  /** The trained-model assignment as a COLUMN over an arbitrary vector
    * expression: the compacted survivor matrix scores via the broadcast
    * expression and the index remaps through a tiny array literal back
    * to original cluster labels. Lets several codebooks code one scan
    * (q95 assigns both PQ subspaces in a single projection — no
    * corpus-sized self-join to pair the codes). */
  def assignExpr(embCol: org.apache.spark.sql.Column,
                 model: (Array[Int], Array[Array[Double]]),
                 spark: SparkSession): org.apache.spark.sql.Column = {
    val (cids, cents) = model
    val bc = spark.sparkContext.broadcast(cents)
    val base = toCol(NearestCentroid(toExpr(embCol), bc))
    if (cids.sameElements(cids.indices)) base
    else element_at(array(cids.map(lit): _*), base + 1)
  }

  /** (vec_id, emb, cid) of `points` under a trained model. */
  def assignModel(points: DataFrame,
                  model: (Array[Int], Array[Array[Double]])): DataFrame =
    points.withColumn("cid",
      assignExpr(col("emb"), model, points.sparkSession))

  /** `iters` Lloyd rounds from the deterministic seeds; returns the
    * final (vec_id, emb, cid) assignment. With iters=1 this is plain
    * nearest-seed partitioning.
    *
    * A cluster that loses all members DISAPPEARS for later rounds (its
    * centroid is undefined); survivors keep their original cids. The
    * assignment expression works over the compacted survivor matrix and
    * the index remaps through a tiny array literal, so the relational
    * oracle (where an empty cid simply has no mean rows) sees identical
    * semantics. */
  def lloyd(points: DataFrame, k: Int, iters: Int): DataFrame =
    assignModel(points, lloydModel(points, k, iters))

  /** Cluster profile after `iters` rounds: size and lowest member id
    * per cluster — integer-exact, the oracle-facing view. */
  def clusterProfile(points: DataFrame, k: Int, iters: Int): DataFrame =
    lloyd(points, k, iters)
      .groupBy(col("cid").cast("long").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"), min(col("vec_id")).as("min_vec_id"))
}
