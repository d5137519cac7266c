package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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

/** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), sequential fold order. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  @transient private lazy val getL = VecRead.get(left.dataType)
  @transient private lazy val getR = VecRead.get(right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = getL(a, i); val y = getR(b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
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
    seed: Long, dim: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val getV = VecRead.get(child.dataType)

  // [table][plane][dim] — same stream as Similarity.planeVectors per table
  @transient private lazy val planeVecs: Array[Array[Array[Double]]] =
    Array.tabulate(tables) { t =>
      val r = new scala.util.Random(seed + 1000L * t)
      Array.fill(planes)(Array.fill(dim)(r.nextGaussian()))
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
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

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Ids of the `nprobe` nearest centroids by cosine, nearest first —
  * the IVF assignment/probe kernel. Centroids ride along as literal
  * model state inside the expression (k × dim doubles).
  */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val getV = VecRead.get(child.dataType)
  @transient private lazy val centroidNorms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
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

  override protected def withNewChildInternal(newChild: Expression): Expression =
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
}
