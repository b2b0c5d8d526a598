package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Compiled SimHash majority kernel (r15, guide §1.2 step 2 / §4's
  * "prefer codegen-friendly expressions"): the Charikar signature over
  * a document's distinct token hashes used to be 64 separate
  * `aggregate` higher-order expressions — HOFs are CodegenFallback, so
  * every document paid 64 INTERPRETED traversals of its token-hash
  * array (per element: lambda-variable rebinding plus a boxed
  * shift/and/add expression walk). One compiled loop does the whole
  * count-and-compare in primitive longs. Arithmetic is IDENTICAL
  * (exact per-bit ones counts, majority iff 2·ones_i > n), so
  * signatures are bit-equal — SimHashSpec pins that against the old
  * expression form, and the q26/q100/q102 oracles re-prove it on rows,
  * schema and hash every round.
  */
object SimHashKernels {

  /** Signature bit i = 1 iff more hashes set bit i than not. Exact at
    * any array size (counts are ints, compare in long). */
  def signature(hs: ArrayData): Long = {
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      var h = hs.getLong(j)
      while (h != 0L) { // visit only set bits (~32/hash for xxhash64)
        counts(java.lang.Long.numberOfTrailingZeros(h)) += 1
        h &= h - 1L
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (2L * counts(i) > n) sig |= 1L << i
      i += 1
    }
    sig
  }
}

@ExpressionDescription(
  usage = "simhash_sig(hashes) - 64-bit Charikar majority signature over an array of token hashes.")
case class SimHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(hs: Any): Any =
    SimHashKernels.signature(hs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashKernels.signature($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}
