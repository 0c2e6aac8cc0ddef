package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused W-token sliding-window hash (the ExactSubstr occurrence key,
  * Lee et al. 2021): for a token array `tk` of n elements, the array of
  * n−W+1 values `xxhash64(array_join(slice(tk, i+1, W), ' '))` —
  * BYTE-IDENTICAL to that composed higher-order-function chain (same
  * separator bytes, same XXH64 seed 42), so substituting it changes no
  * downstream dup decision.
  *
  * Why a dedicated expression: the composed chain is interpreted per
  * element and allocates per WINDOW — a GenericArrayData for each
  * `slice`, a builder + UTF8String for each `array_join` — so a corpus
  * scan pays O(tokens) allocations of O(window-bytes) each, twice (the
  * dup-count pass and the flag pass both compute it). Here each token's
  * byte region is resolved once per row and every window is hashed out
  * of one reused byte buffer: zero per-window allocations, one pass.
  */
case class WindowHash64(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"window width must be >= 1, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowHash64.evalWindows($c, $w)")
  override def nullSafeEval(v: Any): Any =
    WindowHash64.evalWindows(v.asInstanceOf[ArrayData], w)
  override protected def withNewChildInternal(c: Expression): WindowHash64 =
    copy(child = c)
}

object WindowHash64 {
  private final val Seed = 42L
  private final val Space = ' '.toByte

  /** Static entry for generated code (naming note in MinHash64). */
  def evalWindows(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return ArrayData.toArrayData(Array.emptyLongArray)
    // Resolve every token's byte region ONCE (getUTF8String allocates a
    // wrapper; the composed chain re-resolved each token W times).
    val objs = new Array[AnyRef](n)
    val offs = new Array[Long](n)
    val lens = new Array[Int](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // split() never yields nulls; treat one defensively as empty.
      val t = if (s == null) UTF8String.EMPTY_UTF8 else s
      objs(i) = t.getBaseObject
      offs(i) = t.getBaseOffset
      lens(i) = t.numBytes()
      i += 1
    }
    val out = new Array[Long](n - w + 1)
    // One reused buffer sized to the largest window; windows overlap by
    // W-1 tokens but copying ~window bytes is far cheaper than the
    // per-window UTF8String builds this replaces.
    var winBytes = w - 1 // separators
    i = 0
    while (i < w) { winBytes += lens(i); i += 1 }
    var maxBytes = winBytes
    i = w
    while (i < n) { winBytes += lens(i) - lens(i - w); if (winBytes > maxBytes) maxBytes = winBytes; i += 1 }
    val buf = new Array[Byte](maxBytes)
    var p = 0
    while (p <= n - w) {
      var len = 0
      var j = p
      while (j < p + w) {
        if (j > p) { buf(len) = Space; len += 1 }
        Platform.copyMemory(objs(j), offs(j), buf,
          Platform.BYTE_ARRAY_OFFSET + len, lens(j))
        len += lens(j)
        j += 1
      }
      out(p) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed)
      p += 1
    }
    ArrayData.toArrayData(out)
  }

  def windowHash64(c: Column, w: Int): Column =
    ExprUtil.col(WindowHash64(ExprUtil.expr(c), w))
}
