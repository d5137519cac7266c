package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership test against a pre-built filter — the probe
  * side of a runtime semi-join reduction (see
  * [[graft.ops.RuntimeFilter]]).
  *
  * The serialized filter rides in the expression (one copy per plan,
  * registered as a codegen reference object, deserialized once per
  * executor), so the probe is a map-side bit test: no shuffle, no
  * broadcast-join hash table, just `k` hash probes per row inside the
  * scan's WholeStageCodegen span.
  */
case class BloomMightContain(child: Expression, bits: Array[Byte])
    extends UnaryExpression with Predicate {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bits))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a LongType key, got ${child.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = child.nullable

  // the default case-class equality would compare the byte array by
  // reference; compare contents so plan canonicalization stays sane
  override def equals(o: Any): Boolean = o match {
    case BloomMightContain(c, b) =>
      c == child && java.util.Arrays.equals(b, bits)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bits)

  def mightContain(v: Long): Boolean = filter.mightContainLong(v)

  override protected def nullSafeEval(input: Any): Any =
    mightContain(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", this, classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomFunctions {

  /** Column API for [[BloomMightContain]]; `key` must be LongType. */
  def bloom_might_contain(key: Column, bits: Array[Byte]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(key), bits))
}
