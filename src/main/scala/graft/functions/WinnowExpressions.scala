package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing selection (Schleimer et al. 2003) for q128.
  *
  * The declarative formulation — `transform(sequence(...), i ->
  * md5(substring(...)))` feeding an `aggregate(slice(...))` window fold
  * — is CodegenFallback: every k-gram goes through interpreted
  * HigherOrderFunction plumbing AND pays a hex-string round trip
  * (md5 → hex → substring → conv → cast), measured at ~9 s of q128's
  * 9.1 s on the sf0.1 corpus. This kernel computes the identical value
  * in one O(L) pass per document: UTF-8 byte offsets per code point
  * (matching Spark's character semantics for `length`/`substring`),
  * raw 48-bit md5 prefixes straight from the digest bytes (the value
  * `conv(substring(md5(x), 1, 12), 16, 10)` produces), and a monotonic
  * deque for the sliding-window minimum with rightmost tie-break
  * (robust winnowing — `if(x.h <= acc.h, x, acc)` in the fold).
  *
  * Returns the DISTINCT selected fingerprints per document (the SQL
  * chain's `array_distinct` + the downstream per-doc `distinct()`
  * collapsed into the kernel's hash set). Value-identity with the SQL
  * formulation is pinned by AnalyticsFamilySpec's driver replay and a
  * dedicated twin-equality test.
  */
object WinnowKernels {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 12 hex chars (48 bits) of md5(bytes[from, until)) as the
    * non-negative long conv(·, 16, 10) yields. */
  private def h48(bytes: Array[Byte], from: Int, until: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, from, until - from)
    val g = d.digest()
    ((g(0) & 0xffL) << 40) | ((g(1) & 0xffL) << 32) |
      ((g(2) & 0xffL) << 24) | ((g(3) & 0xffL) << 16) |
      ((g(4) & 0xffL) << 8) | (g(5) & 0xffL)
  }

  def fingerprints(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = text.getBytes
    val n = text.numChars()
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Long])
    // code-point start offsets into the UTF-8 bytes (offs(n) = end)
    val offs = new Array[Int](n + 1)
    var i = 0
    var b = 0
    while (i < n) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(n) = bytes.length
    val nk = n - k + 1
    val hs = new Array[Long](nk)
    i = 0
    while (i < nk) { hs(i) = h48(bytes, offs(i), offs(i + k)); i += 1 }
    // sliding-window minimum over w-wide windows, ties to the rightmost
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](nk)
    var head = 0
    var tail = 0
    i = 0
    while (i < nk) {
      // >= pops earlier equal minima: the later (rightmost) one wins
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (i >= w - 1) {
        while (deque(head) <= i - w) head += 1
        out.add(hs(deque(head)))
      }
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }
}

@ExpressionDescription(
  usage = "winnow_fingerprints(text, k, w) - distinct winnowing fingerprints (48-bit md5 prefixes) of text's char k-grams under w-wide windows.")
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(t: Any): Any =
    WinnowKernels.fingerprints(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowKernels.fingerprints($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}
