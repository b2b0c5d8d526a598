package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns (SURVEY.md §2.8 F10).
  *
  * dot/cosine are native codegen'd Catalyst expressions
  * (VectorExpressions.scala) — the higher-order-function formulation
  * (`aggregate(zip_with(...))`) is CodegenFallback and interpreted
  * per element, which dominated the KNN profile. Both accumulate
  * left-to-right, so results stay bit-identical to the DuckDB oracle's
  * sequential loops.
  */
object VectorFunctions {
  import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}

  /** Elementwise dot product; inputs should already be array<double>. */
  def dot(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    toCol(CosineSim(toExpr(a), toExpr(b)))

  /** Random-hyperplane LSH bucket id: sign bit of `vec · plane_j` for
    * each of the given literal hyperplanes, packed into a long. */
  def hyperplaneBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val planeLit = array(p.map(lit).toSeq: _*)
      when(dot(vec, planeLit) >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
}
