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

  /** Two-level assignment: score the (√nlist-sized) coarse quantizer,
    * take the `cprobe` best coarse cells, then argmax over only THEIR
    * member fine centroids — O(√nlist·(1+cprobe)) cosines per vector
    * instead of O(nlist). Same (score, larger-id) tie rule as
    * [[nearestCell]]; whenever the true nearest fine centroid is
    * inside the probed coarse cells (the overwhelmingly common case —
    * that is what cprobe > 1 buys), the result is identical to the
    * flat scan. */
  def nearestCellHier(v: ArrayData, coarse: Array[Array[Double]],
                      members: Array[Array[Int]],
                      cents: Array[Array[Double]], cprobe: Int): Int = {
    // top-cprobe coarse ids, descending (score, id) — coarse is small
    val k = math.min(cprobe, coarse.length)
    val topS = new Array[Double](k); val topI = new Array[Int](k)
    java.util.Arrays.fill(topS, Double.NegativeInfinity)
    java.util.Arrays.fill(topI, -1)
    var j = 0
    while (j < coarse.length) {
      val s = cos(v, coarse(j))
      var p = 0
      var placed = false
      while (p < k && !placed) {
        if (s > topS(p) || (s == topS(p) && j > topI(p))) {
          var q = k - 1
          while (q > p) { topS(q) = topS(q - 1); topI(q) = topI(q - 1); q -= 1 }
          topS(p) = s; topI(p) = j
          placed = true
        }
        p += 1
      }
      j += 1
    }
    var best = Double.NegativeInfinity; var bestId = 0
    var p = 0
    while (p < k) {
      if (topI(p) >= 0) {
        val m = members(topI(p))
        var x = 0
        while (x < m.length) {
          val i = m(x)
          val s = cos(v, cents(i))
          if (s > best || (s == best && i > bestId)) { best = s; bestId = i }
          x += 1
        }
      }
      p += 1
    }
    bestId
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

@ExpressionDescription(
  usage = "nearest_centroid_hier(v) - two-level centroid assignment through a broadcast coarse quantizer.")
case class NearestCentroidHier(child: Expression,
                               coarse: Broadcast[Array[Array[Double]]],
                               members: Broadcast[Array[Array[Int]]],
                               centroids: Broadcast[Array[Array[Double]]],
                               cprobe: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid_hier"

  override protected def nullSafeEval(v: Any): Any =
    CentroidKernels.nearestCellHier(v.asInstanceOf[ArrayData], coarse.value,
      members.value, centroids.value, cprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcC = ctx.addReferenceObj("coarseBc", coarse,
      "org.apache.spark.broadcast.Broadcast")
    val bcM = ctx.addReferenceObj("membersBc", members,
      "org.apache.spark.broadcast.Broadcast")
    val bcF = ctx.addReferenceObj("centroidsBc", centroids,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.CentroidKernels.nearestCellHier($c,
         |  (double[][]) $bcC.value(), (int[][]) $bcM.value(),
         |  (double[][]) $bcF.value(), $cprobe);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidHier =
    copy(child = newChild)
}
