package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass text statistics for the annotate/quality hot path.
  *
  * The regex formulations these replace are ASCII-class counts that
  * java.util.regex answers by materializing a match ARRAY per row
  * (`size(regexp_extract_all(text, cls))`) or by rewriting the string
  * (`split(regexp_replace(...))`) — per-row allocation proportional to
  * the match count, interpreted regex state machines per byte. Each
  * expression here is one branch-light loop over the UTF-8 bytes:
  * every class involved (`\s`, `\p{Punct}`, `[A-Z]`) is pure-ASCII in
  * Java's default regex mode, and UTF-8 continuation/lead bytes are
  * ≥ 0x80, so byte membership equals char membership and multibyte
  * text can never miscount. Bit-identity against the regex chains
  * (multibyte + whitespace-edge cases included) is spec'd in
  * SqlFunctionsSpec.
  *
  * Same codegen posture as HashExpressions: `doGenCode` emits one
  * monomorphic `compute` call, the stage stays in WholeStageCodegen.
  */
private[functions] object AsciiText {
  /** Java regex \s in default mode: [ \t\n\x0B\f\r]. */
  @inline def isWs(b: Byte): Boolean =
    b == ' ' || (b >= 0x09 && b <= 0x0d)

  /** Java regex \p{Punct}: the 32 ASCII punctuation chars. */
  @inline def isPunct(b: Byte): Boolean =
    (b >= '!' && b <= '/') || (b >= ':' && b <= '@') ||
      (b >= '[' && b <= '`') || (b >= '{' && b <= '~')

  def typeCheck(kind: String, child: Expression)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$kind expects a string child, got $other")
    }
}

/** Count of chars matching `\p{Punct}` — the native
  * `size(regexp_extract_all(text, '\p{Punct}'))`.
  */
case class AsciiPunctCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    AsciiText.typeCheck("punct_count", child)

  override def dataType: DataType = LongType

  def compute(s: UTF8String): Long = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var c = 0L
    var i = 0
    while (i < n) {
      if (AsciiText.isPunct(
        org.apache.spark.unsafe.Platform.getByte(base, off + i))) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("punctcnt", this, classOf[AsciiPunctCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of chars matching `[A-Z]` — the native
  * `size(regexp_extract_all(text, '[A-Z]'))`.
  */
case class AsciiUpperCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    AsciiText.typeCheck("upper_count", child)

  override def dataType: DataType = LongType

  def compute(s: UTF8String): Long = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var c = 0L
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (b >= 'A' && b <= 'Z') c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uppercnt", this, classOf[AsciiUpperCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whitespace token count — the native
  * `size(split(regexp_replace(text, '^\s+|\s+$', ''), '\s+'))` with
  * the empty/whitespace-only → 0 rule: the count of maximal runs of
  * non-`\s` chars.
  */
case class WsTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    AsciiText.typeCheck("ws_token_count", child)

  override def dataType: DataType = LongType

  def compute(s: UTF8String): Long = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var c = 0L
    var inRun = false
    var i = 0
    while (i < n) {
      val ws = AsciiText.isWs(
        org.apache.spark.unsafe.Platform.getByte(base, off + i))
      if (!ws && !inRun) { c += 1; inRun = true }
      else if (ws) inRun = false
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wstokcnt", this, classOf[WsTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Normalized whitespace tokens — the native
  * `split(trim(regexp_replace(lower(text), '\s+', ' ')), ' ')`:
  * lowercase once (UTF8String.toLowerCase — the same call Spark's
  * `lower()` makes under the default collation), then slice the
  * maximal non-`\s` runs without rewriting the string. A string with
  * no tokens (empty or all-whitespace) yields `[""]`, exactly like
  * `split("", " ")`.
  */
case class NormalizedTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    AsciiText.typeCheck("normalized_tokens", child)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  def compute(s0: UTF8String): GenericArrayData = {
    val s = s0.toLowerCase
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var i = 0
    while (i < n) {
      // skip a whitespace run
      while (i < n && AsciiText.isWs(
        org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !AsciiText.isWs(
          org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
        // copy the run: the backing bytes of `s` are this expression's
        // temporary — returned tokens must own their bytes
        val tok = new Array[Byte](i - start)
        org.apache.spark.unsafe.Platform.copyMemory(base, off + start, tok,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, i - start)
        out += UTF8String.fromBytes(tok)
      }
    }
    if (out.isEmpty) out += UTF8String.EMPTY_UTF8
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normtoks", this, classOf[NormalizedTokens].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** Column API for [[AsciiPunctCount]]; input: string. */
  def punct_count(text: Column): Column =
    Bridge.column(AsciiPunctCount(Bridge.expression(text)))

  /** Column API for [[AsciiUpperCount]]; input: string. */
  def upper_count(text: Column): Column =
    Bridge.column(AsciiUpperCount(Bridge.expression(text)))

  /** Column API for [[WsTokenCount]]; input: string. */
  def ws_token_count(text: Column): Column =
    Bridge.column(WsTokenCount(Bridge.expression(text)))

  /** Column API for [[NormalizedTokens]]; input: string. */
  def normalized_tokens(text: Column): Column =
    Bridge.column(NormalizedTokens(Bridge.expression(text)))
}
