package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate nearest neighbor (SURVEY.md §2.3 J7
  * scale path, alternative to hyperplane LSH).
  *
  * Index: `nlist` centroids sampled deterministically from the corpus
  * (every (n/nlist)-th vector by id — data-dependent, unlike random
  * hyperplanes, so cells track the actual distribution); each vector is
  * assigned to its nearest centroid in ONE projection over a broadcast
  * centroid array. Search: a probe ranks the same centroid list,
  * searches its `nprobe` best cells, and rescores candidates exactly.
  *
  * Scale: centroids are a driver-side array of nlist*dim doubles
  * (bounded, not data-scaled); assignment is a narrow codegen'd pass
  * (native cosine); the probe join touches ~corpus*nprobe/nlist rows.
  * At 100 TB the assignment column is written once at ingest and the
  * cell id becomes a partition/bucket key.
  */
object IvfIndex {

  /** Deterministic centroid sample: ids 0, step, 2*step, ... */
  def centroids(corpus: DataFrame, nlist: Int): Array[(Int, Array[Double])] = {
    val n = corpus.count()
    val step = math.max(1L, n / nlist)
    corpus.filter(col("vec_id") % step === 0 && col("vec_id") < step * nlist)
      .select(col("vec_id"), col("emb"))
      .collect()
      .sortBy(_.getLong(0))
      .zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](1).toArray }
  }

  /** Column: id of the nearest centroid (greatest cosine). */
  private def cellOf(v: Column, cents: Array[(Int, Array[Double])]): Column = {
    val scored = cents.map { case (id, c) =>
      struct(cosine(v, array(c.map(lit).toSeq: _*)).as("s"), lit(id).as("id"))
    }
    array_max(array(scored.toSeq: _*)).getField("id")
  }

  /** Columns: ids of the `nprobe` nearest centroids for a probe. */
  private def cellsOf(v: Column, cents: Array[(Int, Array[Double])],
                      nprobe: Int): Column = {
    val scored = cents.map { case (id, c) =>
      struct(cosine(v, array(c.map(lit).toSeq: _*)).as("s"), lit(id).as("id"))
    }
    slice(reverse(array_sort(array(scored.toSeq: _*))), 1, nprobe)
      .getField("id")
  }

  /** Candidate rows (probe_id, vec_id, sim) from the nprobe best cells
    * of each probe; callers apply their own top-k. */
  def topK(corpus: DataFrame, probes: DataFrame,
           nlist: Int, nprobe: Int, k: Int): DataFrame = {
    val cents = centroids(corpus, nlist)
    val assigned = corpus.withColumn("cell", cellOf(col("emb"), cents))
    val probed = probes
      .withColumn("cell", explode(cellsOf(col("pemb"), cents, nprobe)))
    assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
              cosine(col("pemb"), col("emb")).as("sim"))
      .distinct()
  }
}
