package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the reference operators Spark lacks
  * (SURVEY §2.8 gap list). All are codegen-native: `doGenCode` emits a
  * static call inside whole-stage codegen — no row boxing, no codegen
  * fences. Null handling comes from `nullSafeEval`/`defineCodeGen`; all
  * are usable from SQL via [[GraftFunctions.register]].
  */
object ExprUtil {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def col(e: Expression): Column = ColumnBridge.column(e)
  def expr(c: Column): Expression = ColumnBridge.expression(c)
}

/** swapcase (reference `cpp/include/cudf/strings/case.hpp:83`).
  * Codegen-native: emits a static call inside whole-stage codegen.
  */
case class SwapCase(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    SwapCase.swap(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.functions.SwapCase.swap($c)")
  override protected def withNewChildInternal(c: Expression): SwapCase = copy(c)
}

object SwapCase {
  def swap(u: UTF8String): UTF8String = {
    val s = u.toString
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      out.append(
        if (Character.isUpperCase(c)) Character.toLowerCase(c)
        else if (Character.isLowerCase(c)) Character.toUpperCase(c)
        else c)
      i += 1
    }
    UTF8String.fromString(out.toString)
  }
}

/** is_title (reference `strings/capitalize.hpp:123`): every alpha-run
  * starts uppercase and continues lowercase.
  */
case class IsTitle(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    IsTitle.check(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.functions.IsTitle.check($c)")
  override protected def withNewChildInternal(c: Expression): IsTitle = copy(c)
}

object IsTitle {
  def check(u: UTF8String): Boolean = {
    val s = u.toString
    var sawCased = false
    var inWord = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) {
        if (!inWord) {
          if (!Character.isUpperCase(c)) return false
          sawCased = true
        } else if (!Character.isLowerCase(c)) return false
        inWord = true
      } else inWord = false
      i += 1
    }
    sawCased
  }
}

/** xxhash_32 (reference `cpp/include/cudf/hashing.hpp:183`, seed-able).
  * Standard XXH32 over the string's UTF-8 bytes.
  */
case class XxHash32Expr(child: Expression, seed: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    XxHash32Expr.hash(bytes, seed)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.XxHash32Expr.hash($c.getBytes(), $seed)")
  override protected def withNewChildInternal(c: Expression): XxHash32Expr =
    copy(child = c)
}

object XxHash32Expr {
  private val P1 = -1640531535 // 2654435761
  private val P2 = -2048144777 // 2246822519
  private val P3 = -1028477379 // 3266489917
  private val P4 = 668265263
  private val P5 = 374761393

  /** Reference XXH32 (xxhash.h algorithm, public domain spec). */
  def hash(data: Array[Byte], seed: Int): Int = {
    val len = data.length
    var idx = 0
    var h: Int =
      if (len >= 16) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        while (idx <= len - 16) {
          v1 = round(v1, getInt(data, idx)); idx += 4
          v2 = round(v2, getInt(data, idx)); idx += 4
          v3 = round(v3, getInt(data, idx)); idx += 4
          v4 = round(v4, getInt(data, idx)); idx += 4
        }
        Integer.rotateLeft(v1, 1) + Integer.rotateLeft(v2, 7) +
          Integer.rotateLeft(v3, 12) + Integer.rotateLeft(v4, 18)
      } else seed + P5
    h += len
    while (idx <= len - 4) {
      h += getInt(data, idx) * P3
      h = Integer.rotateLeft(h, 17) * P4
      idx += 4
    }
    while (idx < len) {
      h += (data(idx) & 0xff) * P5
      h = Integer.rotateLeft(h, 11) * P1
      idx += 1
    }
    h ^= h >>> 15
    h *= P2
    h ^= h >>> 13
    h *= P3
    h ^= h >>> 16
    h
  }
  private def round(acc: Int, input: Int): Int =
    Integer.rotateLeft(acc + input * P2, 13) * P1
  private def getInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
}

/** rsplit (reference `strings/split/split.hpp:84`): split from the right
  * with at most `maxSplits` splits, like Python `str.rsplit(sep, n)`.
  */
case class RSplit(left: Expression, right: Expression, maxSplits: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(str: Any, sep: Any): Any =
    RSplit.evalSplit(str.asInstanceOf[UTF8String], sep.asInstanceOf[UTF8String], maxSplits)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.RSplit.evalSplit($a, $b, $maxSplits)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RSplit =
    copy(left = l, right = r)
}

object RSplit {
  /** Static entry for generated code (not `eval` — that collides with
    * `Expression.eval(InternalRow)` and kills the static forwarder).
    */
  def evalSplit(str: UTF8String, sep: UTF8String, maxSplits: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = str.toString
    val d = sep.toString
    // Empty separator: lastIndexOf("") == rest.length would strip nothing
    // and loop forever. Python's str.rsplit raises; we return the whole
    // string un-split (the Frame-facade contract documents this).
    if (d.isEmpty)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(UTF8String.fromString(s)))
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var rest = s
    var splits = 0
    while ((maxSplits < 0 || splits < maxSplits) && {
        val i = rest.lastIndexOf(d); i >= 0
      }) {
      val i = rest.lastIndexOf(d)
      parts += rest.substring(i + d.length)
      rest = rest.substring(0, i)
      splits += 1
    }
    parts += rest
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      parts.reverse.map(UTF8String.fromString).toArray)
  }
}

/** porter_stemmer_measure (reference `cpp/include/nvtext/stemmer.hpp:80`):
  * the number of VC sequences in the word's CV pattern ('y' is a vowel
  * after a consonant).
  */
case class PorterMeasure(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.functions.PorterMeasure.measure($c)")
  override def nullSafeEval(v: Any): Any =
    PorterMeasure.measure(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): PorterMeasure = copy(c)
}

object PorterMeasure {
  def measure(u: UTF8String): Int = {
    val s = u.toString.toLowerCase
    var measure = 0
    var prevVowel = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val isVowel = "aeiou".indexOf(c) >= 0 || (c == 'y' && i > 0 && !prevVowel)
      if (!isVowel && prevVowel) measure += 1
      prevVowel = isVowel
      i += 1
    }
    measure
  }
}

/** wrap (reference `cpp/include/cudf/strings/wrap.hpp:65`): greedy
  * word-wrap at `width` — spaces at wrap points become newlines; words
  * longer than the width stay unbroken on their own line.
  */
case class WrapText(child: Expression, width: Int) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    WrapText.wrap(v.asInstanceOf[UTF8String], width)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.functions.WrapText.wrap($c, $width)")
  override protected def withNewChildInternal(c: Expression): WrapText =
    copy(child = c)
}

object WrapText {
  def wrap(u: UTF8String, width: Int): UTF8String = {
    val words = u.toString.split(" ", -1)
    val out = new java.lang.StringBuilder(u.numBytes + 8)
    var lineLen = 0
    var first = true
    words.foreach { w =>
      if (first) { out.append(w); lineLen = w.length; first = false }
      else if (lineLen + 1 + w.length <= width) {
        out.append(' ').append(w); lineLen += 1 + w.length
      } else { out.append('\n').append(w); lineLen = w.length }
    }
    UTF8String.fromString(out.toString)
  }
}

/** normalize_characters (reference `cpp/include/nvtext/normalize.hpp:216`):
  * unicode NFD decomposition, combining-mark (accent) removal, and
  * optional lowercasing — the text-pipeline normalization pass.
  */
case class NormalizeChars(child: Expression, toLower: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    NormalizeChars.normalize(v.asInstanceOf[UTF8String], toLower)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeChars.normalize($c, $toLower)")
  override protected def withNewChildInternal(c: Expression): NormalizeChars =
    copy(child = c)
}

object NormalizeChars {
  def normalize(u: UTF8String, toLower: Boolean): UTF8String = {
    val nfd = java.text.Normalizer.normalize(u.toString, java.text.Normalizer.Form.NFD)
    val stripped = nfd.replaceAll("\\p{M}+", "")
    UTF8String.fromString(if (toLower) stripped.toLowerCase else stripped)
  }
}

/** Column-API + SQL registration for the custom expressions. */
object GraftFunctions {
  import ExprUtil.col

  import ExprUtil.expr

  def swapcase(c: Column): Column = col(SwapCase(expr(c)))
  def is_title(c: Column): Column = col(IsTitle(expr(c)))
  def xxhash32(c: Column, seed: Int = 0): Column = col(XxHash32Expr(expr(c), seed))
  def rsplit(c: Column, sep: Column, maxSplits: Int = -1): Column =
    col(RSplit(expr(c), expr(sep), maxSplits))
  def porter_measure(c: Column): Column = col(PorterMeasure(expr(c)))
  def murmur3_128(c: Column, seed: Long = 0L): Column =
    col(Murmur3x64_128(expr(c), seed))
  def wrap_text(c: Column, width: Int): Column = col(WrapText(expr(c), width))
  def normalize_chars(c: Column, toLower: Boolean = true): Column =
    col(NormalizeChars(expr(c), toLower))

  private def foldableSeed(e: Expression, fn: String): Long = e match {
    case lit if lit.foldable =>
      lit.eval(null) match {
        case i: Int => i.toLong
        case l: Long => l
        case other => throw new IllegalArgumentException(
          s"$fn seed must be an integer literal, got $other")
      }
    case _ => throw new IllegalArgumentException(
      s"$fn seed must be a foldable literal")
  }

  /** Register all custom functions for SQL use (`SELECT swapcase(x) …`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("swapcase", es => SwapCase(es.head), "built-in")
    reg.createOrReplaceTempFunction("is_title", es => IsTitle(es.head), "built-in")
    // Seed-able hashes: honor an optional foldable integer seed; any other
    // arity/shape is an explicit analysis-time error (not silently seed 0).
    reg.createOrReplaceTempFunction("xxhash32", {
      case Seq(e) => XxHash32Expr(e, 0)
      case Seq(e, s) =>
        val seed = foldableSeed(s, "xxhash32")
        if (seed < Int.MinValue || seed > Int.MaxValue)
          throw new IllegalArgumentException(
            s"xxhash32 seed must fit in 32 bits, got $seed")
        XxHash32Expr(e, seed.toInt)
      case es => throw new IllegalArgumentException(
        s"xxhash32 expects (str[, seed]); got ${es.length} args")
    }, "built-in")
    reg.createOrReplaceTempFunction("porter_measure", es => PorterMeasure(es.head), "built-in")
    reg.createOrReplaceTempFunction("murmur3_128", {
      case Seq(e) => Murmur3x64_128(e, 0L)
      case Seq(e, s) => Murmur3x64_128(e, foldableSeed(s, "murmur3_128"))
      case es => throw new IllegalArgumentException(
        s"murmur3_128 expects (str[, seed]); got ${es.length} args")
    }, "built-in")
  }
}
