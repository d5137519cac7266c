package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra–Gries frequent-items ("heavy hitters") sketch as a native
  * aggregate — the streaming-mergeable summary a 100 TB corpus scan
  * needs where an exact `GROUP BY item` would shuffle every distinct
  * value (think: domain counts, token counts, near-unbounded
  * cardinality). State is ≤ `k` counters regardless of input size;
  * map-side partials mean only k (item, count) pairs per partition
  * cross the wire.
  *
  * Guarantees (classic MG + Agarwal et al. mergeability):
  *  - estimated count ∈ [true − n/(k+1), true] for every item;
  *  - every item with true count > n/(k+1) is present in the sketch;
  *  - when the group's distinct-item count never exceeds k, no
  *    decrement ever fires and all counts are EXACT (what the DuckDB
  *    oracle of `q_heavy_hitters` relies on).
  *
  * Output: array<struct<item string, cnt long>> sorted by cnt desc,
  * then item asc — deterministic for hashing.
  */
case class FreqItemsSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LinkedHashMap[String, Long]]
    with UnaryLike[Expression] {

  require(k >= 1, s"freq_items needs k >= 1, got $k")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, Long] =
    mutable.LinkedHashMap.empty

  private def offer(buf: mutable.LinkedHashMap[String, Long], item: String,
      weight: Long): Unit = {
    buf.get(item) match {
      case Some(c) => buf(item) = c + weight
      case None if buf.size < k => buf(item) = weight
      case None =>
        // decrement-all by the incoming weight (bounded by the smallest
        // counter); drop zeros; leftover weight re-offered
        val dec = math.min(weight, buf.values.min)
        var leftover = weight - dec
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - dec)
        buf.foreach { case (i, c) => if (c <= 0) dead += i }
        dead.foreach(buf.remove)
        if (leftover > 0) offer(buf, item, leftover)
    }
  }

  override def update(buf: mutable.LinkedHashMap[String, Long],
      input: InternalRow): mutable.LinkedHashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.toString, 1L)
    buf
  }

  override def merge(b1: mutable.LinkedHashMap[String, Long],
      b2: mutable.LinkedHashMap[String, Long]): mutable.LinkedHashMap[String, Long] = {
    b2.foreach { case (item, c) => offer(b1, item, c) }
    b1
  }

  override def eval(buf: mutable.LinkedHashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.LinkedHashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf(new String(b, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsSketch =
    copy(child = newChild)
}

object SketchFunctions {
  /** Aggregate: Misra–Gries top-items sketch over a string column. */
  def freq_items(item: Column, k: Int): Column =
    Bridge.column(FreqItemsSketch(Bridge.expression(item), k)
      .toAggregateExpression())
}
