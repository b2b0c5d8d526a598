package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Centroid-assignment kernels shared by interpreted eval and generated
  * code. Centroids travel as a Spark BROADCAST variable referenced from
  * the expression (via `ctx.addReferenceObj`), never as plan literals:
  * an nlist×dim literal array blows up plan size / codegen at
  * production nlist (65k cells × 768 dims is a ~400 MB plan), while a
  * broadcast ships once per executor and the plan stays O(1).
  */
object CentroidKernels {

  /** cosine(v, c) with CosineSim's exact semantics (shorter length wins,
    * 0.0 on zero norm) so cell assignment matches the rescore metric. */
  private def cos(v: ArrayData, c: Array[Double]): Double = {
    val n = math.min(v.numElements(), c.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = v.getDouble(i); val y = c(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** argmax_i cosine(v, cents(i)); ties resolve to the larger cell id
    * (the order max-over-(score,id) structs produces). */
  def nearestCell(v: ArrayData, cents: Array[Array[Double]]): Int = {
    var best = Double.NegativeInfinity; var bestId = 0
    var i = 0
    while (i < cents.length) {
      val s = cos(v, cents(i))
      if (s > best || (s == best && i > bestId)) { best = s; bestId = i }
      i += 1
    }
    bestId
  }

  /** Ids of the `nprobe` highest-cosine centroids, descending by
    * (score, id). */
  def nearestCells(v: ArrayData, cents: Array[Array[Double]], nprobe: Int): ArrayData = {
    val scored = Array.tabulate(cents.length)(i => (cos(v, cents(i)), i))
    val ids = scored.sortBy { case (s, i) => (-s, -i) }
      .take(math.min(nprobe, cents.length)).map(_._2)
    new GenericArrayData(ids)
  }
}

@ExpressionDescription(
  usage = "nearest_centroid(v) - id of the broadcast centroid with greatest cosine similarity to v.")
case class NearestCentroid(child: Expression,
                           centroids: Broadcast[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(v: Any): Any =
    CentroidKernels.nearestCell(v.asInstanceOf[ArrayData], centroids.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("centroidsBc", centroids,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CentroidKernels.nearestCell($c, (double[][]) $bc.value());")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

@ExpressionDescription(
  usage = "nearest_centroids(v, nprobe) - ids of the nprobe broadcast centroids nearest to v by cosine.")
case class NearestCentroids(child: Expression,
                            centroids: Broadcast[Array[Array[Double]]],
                            nprobe: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override protected def nullSafeEval(v: Any): Any =
    CentroidKernels.nearestCells(v.asInstanceOf[ArrayData], centroids.value, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("centroidsBc", centroids,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CentroidKernels.nearestCells($c, (double[][]) $bc.value(), $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}
