package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns (SURVEY.md §2.8 F10)
  * using codegen'd higher-order functions — no UDFs, stays inside
  * whole-stage codegen, evaluates left-to-right (deterministic float
  * accumulation order, matching the DuckDB oracle's sequential loops).
  */
object VectorFunctions {
  /** Elementwise dot product; inputs should already be array<double>. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Random-hyperplane LSH bucket id: sign bit of `vec · plane_j` for
    * each of the given literal hyperplanes, packed into a long. */
  def hyperplaneBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val planeLit = array(p.map(lit).toSeq: _*)
      when(dot(vec, planeLit) >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
}
