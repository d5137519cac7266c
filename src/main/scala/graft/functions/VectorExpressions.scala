package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Vector math as native Catalyst expressions (SURVEY.md §2e).
  *
  * `zip_with`/`aggregate` higher-order functions evaluate their lambdas
  * interpreted, per element — a 64-dim cosine costs ~200 boxed calls.
  * These expressions run one tight primitive loop per row and read
  * float or double arrays directly (floats widen exactly, so results
  * are bit-identical to the cast-then-double-fold they replace).
  */
private object VecRead {
  /** Element accessor for array<float> / array<double> children. */
  def get(dt: DataType): (ArrayData, Int) => Double = {
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => (a, i) => a.getFloat(i).toDouble
      case DoubleType => (a, i) => a.getDouble(i)
      case other => sys.error(s"vector ops need float/double arrays, got $other")
    }
  }
}

/** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), sequential fold order.
  * `doGenCode` keeps the surrounding stage in WholeStageCodegen (one
  * monomorphic `compute` call per row — see HashExpressions scaladoc).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  @transient private lazy val getL = VecRead.get(left.dataType)
  @transient private lazy val getR = VecRead.get(right.dataType)

  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = getL(a, i); val y = getR(b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(
      compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosine", this, classOf[CosineSimilarity].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Multi-table random-hyperplane LSH bucket ids: for table t, bit j is
  * sign(v · plane_{t,j}); planes drawn from a seeded Gaussian stream —
  * identical across executors/runs. Output: array<long>, one bucket per
  * table.
  */
case class HyperplaneBuckets(child: Expression, planes: Int, tables: Int,
    seed: Long, dim: Int,
    // explicit [table][plane][dim] coefficients (the md5-derived
    // oracle-path planes); null = seeded-Gaussian fast path
    planesOverride: Array[Array[Array[Double]]] = null)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val getV = VecRead.get(child.dataType)

  // [table][plane][dim] — same stream as Similarity.planeVectors per table
  @transient private lazy val planeVecs: Array[Array[Array[Double]]] =
    if (planesOverride != null) planesOverride
    else Array.tabulate(tables) { t =>
      val r = new scala.util.Random(seed + 1000L * t)
      Array.fill(planes)(Array.fill(dim)(r.nextGaussian()))
    }

  def compute(v: ArrayData): ArrayData = {
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < planes) {
        val p = planeVecs(t)(j)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += getV(v, i) * p(i); i += 1 }
        if (dot > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplane", this, classOf[HyperplaneBuckets].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Ids of the `nprobe` nearest centroids by cosine, nearest first —
  * the IVF assignment/probe kernel. Centroids ride along as literal
  * model state inside the expression (k × dim doubles).
  */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val getV = VecRead.get(child.dataType)
  @transient private lazy val centroidNorms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val sims = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val m = math.min(n, cent.length)
      var dot = 0.0; var nv = 0.0
      var i = 0
      while (i < m) { val x = getV(v, i); dot += x * cent(i); nv += x * x; i += 1 }
      sims(c) = dot / (math.sqrt(nv) * centroidNorms(c))
      c += 1
    }
    val order = sims.indices.sortBy(i => (-sims(i), i)).take(nprobe)
    new GenericArrayData(order.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this, classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Elementwise vector-sum aggregate: Σ over rows of array<float|double>
  * columns, one buffer add per ROW (not per element — the posexplode
  * alternative shuffles corpus×dim rows). TypedImperativeAggregate →
  * ObjectHashAggregate with map-side partials: k×dim doubles cross the
  * wire per partition, independent of corpus size. The centroid/mean
  * kernel for IVF training and embedding averaging.
  */
case class VectorSumAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Double]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val getV = VecRead.get(child.dataType)

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = if (buffer.length >= n) buffer else
      java.util.Arrays.copyOf(buffer, n)
    var i = 0
    while (i < n) { buf(i) += getV(arr, i); i += 1 }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    val (big, small) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
}

object VectorFunctions {
  def vector_cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def nearest_centroids(vec: Column, centroids: Array[Array[Double]],
      nprobe: Int): Column =
    Bridge.column(NearestCentroids(Bridge.expression(vec), centroids, nprobe))

  def hyperplane_buckets(vec: Column, planes: Int, tables: Int,
      seed: Long = 11L, dim: Int = 64): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(vec), planes, tables,
      seed, dim))

  /** [[hyperplane_buckets]] over an EXPLICIT plane matrix (the
    * md5-derived oracle planes) — same codegen'd kernel, no HOF tax. */
  def hyperplane_buckets_with(vec: Column, planes: Array[Array[Array[Double]]],
      dim: Int = 64): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(vec),
      planes.head.length, planes.length, 0L, dim, planes))

  /** Aggregate: elementwise sum of vector rows (see [[VectorSumAgg]]). */
  def vector_sum(vec: Column): Column =
    Bridge.column(VectorSumAgg(Bridge.expression(vec)).toAggregateExpression())
}
