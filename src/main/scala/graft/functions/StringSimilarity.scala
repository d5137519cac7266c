package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a codegen'd Catalyst expression
  * (SURVEY.md §2d — the fuzzy-matching member of the dedup family).
  *
  * Spark ships `levenshtein` but no Jaro–Winkler, and entity-resolution
  * blocking pipelines want exactly this metric (cheap, prefix-weighted,
  * tolerant of transpositions). One tight primitive loop per row over
  * the UTF-8 bytes — byte semantics match DuckDB/PostgreSQL fuzzystrmatch
  * so the oracle can pin values exactly:
  *
  *  - empty input (either side) → 0.0
  *  - match window = max(len)/2 − 1, floored at 0
  *  - transpositions counted as half the out-of-order matched positions
  *  - Winkler prefix boost (scale 0.1, prefix capped at 4) only when
  *    the plain Jaro score exceeds 0.7
  *
  * The generated code calls `compute` through a codegen reference —
  * same pattern as [[MinHashSignature]]: the surrounding stage stays in
  * WholeStageCodegen, one monomorphic call per row, no boxing.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  def compute(lu: UTF8String, ru: UTF8String): Double = {
    val s = lu.getBytes
    val t = ru.getBytes
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val hi = math.min(m - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var k = 0
    var half = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) half += 1
        k += 1
      }
      i += 1
    }
    val md = matches.toDouble
    val jaro = (md / n + md / m + (md - half / 2.0) / md) / 3.0
    if (jaro > 0.7) {
      val maxP = math.min(4, math.min(n, m))
      var p = 0
      while (p < maxP && s(p) == t(p)) p += 1
      jaro + 0.1 * p * (1.0 - jaro)
    } else jaro
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jw", this, classOf[JaroWinkler].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $ref.compute($l, $r);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringSimilarity {
  /** Jaro–Winkler similarity in [0,1] of two string columns. */
  def jaro_winkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
}
