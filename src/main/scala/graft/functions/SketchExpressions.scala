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

/** Quantile-sketch aggregation buffer: bounded (value, weight) items
  * plus the compaction phase bit (survivors alternate between the
  * upper and lower element of each pair across compactions, so the
  * per-compaction rank shift cancels instead of accumulating
  * one-sidedly — the deterministic stand-in for KLL's random coin).
  */
final class QSketchBuf(var phase: Boolean,
    val items: mutable.ArrayBuffer[(Double, Long)])

/** Mergeable quantile sketch (single-level KLL-style compactor,
  * cf. Karnin/Lang/Liberty "Optimal Quantile Approximation in
  * Streams" — public literature): a capacity-bounded (value, weight)
  * buffer; on overflow the sorted buffer is pair-compacted (one
  * survivor per neighbor pair carrying the pair's total weight),
  * halving size for a bounded rank error.
  *
  * The [[FreqItemsSketch]] contract, for quantiles:
  *  - while total input ≤ `capacity`, no compaction fires, weights
  *    stay 1, and eval is the EXACT (n−1)·p interpolated percentile —
  *    bit-identical to `percentile()` / DuckDB `quantile_cont` (what
  *    the `q_quantile_sketch` oracle checks at the gate's SF);
  *  - past capacity, state stays O(capacity) with mergeable map-side
  *    partials (rank-error bound asserted empirically in SketchSpec).
  *
  * Output: array<double>, one entry per requested percentile.
  */
case class QuantileSketch(child: Expression, percentiles: Seq[Double],
    capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QSketchBuf]
    with UnaryLike[Expression] {

  require(capacity >= 8, s"quantile sketch needs capacity >= 8, got $capacity")
  require(percentiles.nonEmpty && percentiles.forall(p => p >= 0 && p <= 1),
    s"percentiles must be in [0,1], got $percentiles")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): QSketchBuf =
    new QSketchBuf(false, mutable.ArrayBuffer.empty)

  /** Sorted pair-compaction: halves the buffer. Each adjacent pair
    * collapses to ONE of its elements carrying the PAIR'S TOTAL
    * weight — mass-preserving, so a rank query only errs at the one
    * pair that straddles it (≤ that pair's dropped weight), the
    * property the KLL analysis needs. (Doubling the survivor instead
    * would lose the dropped element's weight whenever pair weights
    * differ — merged buffers mix weights — and the estimates drift
    * unboundedly.) The survivor side alternates per compaction via the
    * buffer's phase bit: always keeping the upper element biases every
    * estimate upward by ~one pair-weight per compaction, which
    * accumulates linearly in n/capacity; alternating cancels it
    * (deterministically — no RNG, results stay reproducible for a
    * given merge order). An odd-sized buffer keeps its first element
    * unpaired.
    */
  private def compact(buf: QSketchBuf): Unit = {
    val sorted = buf.items.sortBy(x => (x._1, x._2))
    val keepUpper = buf.phase
    buf.phase = !buf.phase
    buf.items.clear()
    var start = 0
    if (sorted.length % 2 == 1) { buf.items += sorted(0); start = 1 }
    var i = start
    while (i + 1 < sorted.length) {
      val (v1, w1) = sorted(i)
      val (v2, w2) = sorted(i + 1)
      buf.items += (((if (keepUpper) v2 else v1), w1 + w2))
      i += 2
    }
  }

  private[graft] def add(buf: QSketchBuf, v: Double, w: Long): Unit = {
    buf.items += ((v, w))
    if (buf.items.length > capacity) compact(buf)
  }

  override def update(buf: QSketchBuf, input: InternalRow): QSketchBuf = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Number].doubleValue(), 1L)
    buf
  }

  override def merge(b1: QSketchBuf, b2: QSketchBuf): QSketchBuf = {
    b2.items.foreach { case (v, w) => add(b1, v, w) }
    b1
  }

  /** Weighted interpolated quantile: with all weights 1 this is the
    * standard (n−1)·p rule; with weights it interpolates between the
    * representative values on the cumulative-weight scale.
    */
  override def eval(buf: QSketchBuf): Any = {
    if (buf.items.isEmpty)
      return new GenericArrayData(percentiles.map(_ => Double.NaN).toArray[Any])
    val sorted = buf.items.sortBy(x => (x._1, x._2)).toArray
    val total = sorted.iterator.map(_._2).sum
    // expand ranks: element j (0-based over total weight) for weight w
    // occupies ranks [cum, cum+w)
    val out = percentiles.map { p =>
      val target = p * (total - 1)
      val lo = math.floor(target).toLong
      val frac = target - lo
      def valueAt(rank: Long): Double = {
        var cum = 0L
        var i = 0
        while (i < sorted.length) {
          cum += sorted(i)._2
          if (rank < cum) return sorted(i)._1
          i += 1
        }
        sorted(sorted.length - 1)._1
      }
      val vLo = valueAt(lo)
      // lo + (hi − lo)·frac, NOT lo·(1−f)+hi·f: algebraically equal but
      // IEEE-different — this is the form percentile()/quantile_cont use
      if (frac == 0.0) vLo else vLo + (valueAt(lo + 1) - vLo) * frac
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def serialize(buf: QSketchBuf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(buf.phase)
    out.writeInt(buf.items.length)
    buf.items.foreach { case (v, w) => out.writeDouble(v); out.writeLong(w) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QSketchBuf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val phase = in.readBoolean()
    val n = in.readInt()
    val items = mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { items += ((in.readDouble(), in.readLong())); i += 1 }
    new QSketchBuf(phase, items)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketch =
    copy(child = newChild)
}

/** Distinct-count buffer: an exact value set while small, dense HLL
  * registers after. `sparse == null` marks dense mode.
  */
final class DSketchBuf(var sparse: mutable.HashSet[String],
    var dense: Array[Byte])

/** Mergeable distinct-count sketch (HyperLogLog, cf. Flajolet et al.
  * 2007 — public literature) with an exact sparse mode, completing the
  * engine's mergeable-summary triad (frequent items, quantiles,
  * distinct counts). At 100 TB an exact COUNT(DISTINCT) shuffles every
  * distinct value; this aggregate ships ≤ max(threshold, 2^p) bytes of
  * state per partition and never re-shuffles rows.
  *
  * The family contract:
  *  - while a group's distinct count ≤ `exactThreshold`, the buffer is
  *    an exact set of the VALUES (not hashes — no collision caveat) and
  *    eval equals COUNT(DISTINCT) bit-for-bit (what the
  *    `q_distinct_sketch` DuckDB oracle checks at the gate SF);
  *  - past the threshold the buffer densifies to 2^p one-byte HLL
  *    registers: estimate within ~1.04/√(2^p) relative error (p=12 →
  *    ~1.6% σ, spec-checked at 200k distinct), linear-counting
  *    correction for the low range;
  *  - register max-merge is associative AND commutative, so unlike the
  *    MG/KLL cousins the dense estimate is merge-order-INDEPENDENT —
  *    the same number on every cluster layout (spec-asserted).
  */
case class DistinctSketch(child: Expression, p: Int = 12,
    exactThreshold: Int = 4096,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DSketchBuf]
    with UnaryLike[Expression] {

  require(p >= 4 && p <= 18, s"distinct sketch needs 4 <= p <= 18, got $p")
  require(exactThreshold >= 0, s"negative exactThreshold: $exactThreshold")

  private def m = 1 << p

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): DSketchBuf =
    new DSketchBuf(mutable.HashSet.empty, null)

  /** FNV-1a 64 over UTF-8 bytes + a SplitMix64 finalizer: FNV alone
    * mixes low bits poorly and HLL reads the TOP p bits for the
    * register index — the finalizer's avalanche fixes that.
    */
  private def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    var z = h
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def offerDense(reg: Array[Byte], v: String): Unit = {
    val h = hash64(v)
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    // rank of the first 1-bit in the remaining 64−p bits, 1-based;
    // all-zero suffix takes the max rank 64−p+1
    val rho = (if (w == 0L) 64 - p + 1
               else math.min(java.lang.Long.numberOfLeadingZeros(w) + 1,
                 64 - p + 1)).toByte
    if (rho > reg(idx)) reg(idx) = rho
  }

  private def densify(buf: DSketchBuf): Unit = {
    val reg = new Array[Byte](m)
    buf.sparse.foreach(offerDense(reg, _))
    buf.sparse = null
    buf.dense = reg
  }

  private def offer(buf: DSketchBuf, v: String): Unit =
    if (buf.sparse != null) {
      buf.sparse += v
      if (buf.sparse.size > exactThreshold) densify(buf)
    } else offerDense(buf.dense, v)

  /** Test hook: offer a single already-stringified value. */
  private[graft] def offerValue(buf: DSketchBuf, v: String): Unit = offer(buf, v)

  override def update(buf: DSketchBuf, input: InternalRow): DSketchBuf = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.toString)
    buf
  }

  override def merge(b1: DSketchBuf, b2: DSketchBuf): DSketchBuf = {
    if (b2.sparse != null) b2.sparse.foreach(offer(b1, _))
    else {
      if (b1.sparse != null) densify(b1)
      val r1 = b1.dense; val r2 = b2.dense
      var i = 0
      while (i < m) { if (r2(i) > r1(i)) r1(i) = r2(i); i += 1 }
    }
    b1
  }

  override def eval(buf: DSketchBuf): Any =
    if (buf.sparse != null) buf.sparse.size.toLong
    else {
      val reg = buf.dense
      var invSum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        invSum += java.lang.Double.longBitsToDouble(
          (1023L - (reg(i) & 0xffL)) << 52) // 2^{-reg(i)} exactly
        if (reg(i) == 0) zeros += 1
        i += 1
      }
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _ => 0.7213 / (1.0 + 1.079 / m)
      }
      val raw = alpha * m * m.toDouble / invSum
      // small-range (linear counting) correction; the 64-bit hash makes
      // the classic large-range correction unreachable
      val est = if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
                else raw
      math.rint(est).toLong
    }

  override def serialize(buf: DSketchBuf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    if (buf.sparse != null) {
      out.writeBoolean(true)
      out.writeInt(buf.sparse.size)
      buf.sparse.foreach { s =>
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(b.length); out.write(b)
      }
    } else {
      out.writeBoolean(false)
      out.write(buf.dense)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DSketchBuf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    if (in.readBoolean()) {
      val n = in.readInt()
      val set = mutable.HashSet.empty[String]
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len); in.readFully(b)
        set += new String(b, java.nio.charset.StandardCharsets.UTF_8)
        i += 1
      }
      new DSketchBuf(set, null)
    } else {
      val reg = new Array[Byte](m); in.readFully(reg)
      new DSketchBuf(null, reg)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DistinctSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DistinctSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DistinctSketch =
    copy(child = newChild)
}

/** [[DistinctSketch]] variant that evaluates to its SERIALIZED STATE
  * (binary) instead of the estimate — the re-aggregatable-summary
  * pattern (Druid/BigQuery sketch columns): materialize per-bucket
  * (e.g. per-day) states ONCE, then answer any coarser rollup by
  * MERGING states with [[DistinctSketchMerge]] — no re-scan of the
  * raw data, ever. Exactness contract is inherited: states below the
  * threshold are exact value sets, so merged estimates of small
  * cardinalities are exact COUNT(DISTINCT).
  */
case class DistinctSketchState(child: Expression, p: Int = 12,
    exactThreshold: Int = 4096,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DSketchBuf]
    with UnaryLike[Expression] {

  private val inner = DistinctSketch(child, p, exactThreshold)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): DSketchBuf =
    inner.createAggregationBuffer()
  override def update(buf: DSketchBuf, input: InternalRow): DSketchBuf =
    inner.update(buf, input)
  override def merge(b1: DSketchBuf, b2: DSketchBuf): DSketchBuf =
    inner.merge(b1, b2)
  override def eval(buf: DSketchBuf): Any = inner.serialize(buf)
  override def serialize(buf: DSketchBuf): Array[Byte] = inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): DSketchBuf =
    inner.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DistinctSketchState =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DistinctSketchState =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DistinctSketchState =
    copy(child = newChild)
}

/** Merges serialized [[DistinctSketchState]] partials back into one
  * estimate — the rollup half of the re-aggregatable pattern. Input
  * rows are BINARY states; output is the distinct-count estimate the
  * equivalent one-shot [[DistinctSketch]] over the union would give
  * (exactly equal by construction: same buffer, same merge).
  */
case class DistinctSketchMerge(child: Expression, p: Int = 12,
    exactThreshold: Int = 4096,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DSketchBuf]
    with UnaryLike[Expression] {

  private val inner = DistinctSketch(child, p, exactThreshold)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == BinaryType) TypeCheckSuccess
    else TypeCheckFailure(
      s"distinct_merge expects serialized sketch states (binary), got ${child.dataType}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): DSketchBuf =
    inner.createAggregationBuffer()
  override def update(buf: DSketchBuf, input: InternalRow): DSketchBuf = {
    val v = child.eval(input)
    if (v != null)
      inner.merge(buf, inner.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(b1: DSketchBuf, b2: DSketchBuf): DSketchBuf =
    inner.merge(b1, b2)
  override def eval(buf: DSketchBuf): Any = inner.eval(buf)
  override def serialize(buf: DSketchBuf): Array[Byte] = inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): DSketchBuf =
    inner.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DistinctSketchMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DistinctSketchMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DistinctSketchMerge =
    copy(child = newChild)
}

/** Shared hashing for the count-min family: one 64-bit content hash
  * split into two halves drives all `depth` rows via Kirsch–
  * Mitzenmacher double hashing (h1 + j·h2), the standard trick that
  * makes d independent-enough row hashes from one evaluation.
  */
object Cms {
  def hash64(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    var z = h
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def index(h: Long, row: Int, width: Int): Int = {
    val h1 = h & 0xffffffffL
    val h2 = (h >>> 32) | 1L // odd, so rows differ even for h2 = 0
    (((h1 + row.toLong * h2) & Long.MaxValue) % width).toInt
  }

  /** Point estimate = min over rows — called from both interpreted and
    * generated code (static, so codegen can reference it by name).
    */
  def estimate(sketch: org.apache.spark.sql.catalyst.util.ArrayData,
      item: UTF8String, depth: Int, width: Int): Long = {
    if (sketch.numElements() != depth * width)
      throw new IllegalArgumentException(
        s"cms_estimate(depth=$depth, width=$width) expects ${depth * width} " +
          s"counters but the sketch has ${sketch.numElements()} — the probe's " +
          "(depth, width) must match the aggregate that built the sketch")
    val h = hash64(item.getBytes)
    var best = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = sketch.getLong(j * width + index(h, j, width))
      if (c < best) best = c
      j += 1
    }
    best
  }
}

/** Count-min sketch aggregate (Cormode & Muthukrishnan 2005 — public
  * literature): a depth×width grid of counters; every item increments
  * one counter per row, a point query reads the MINIMUM. The
  * frequency-table member of the mergeable-summary family (next to
  * MG top-items, KLL quantiles, HLL distinct): fixed O(depth·width)
  * state per group, and the merge is plain element-wise ADDITION —
  * associative, commutative, merge-order-INDEPENDENT, so the sketch is
  * bit-identical on every cluster layout (unlike MG/KLL whose state
  * depends on merge order).
  *
  * Guarantees: estimates never undercount; overcount ≤ e/width · N
  * with probability 1 − e^−depth per query (spec-checked past
  * capacity). When the distinct items hash collision-free — guaranteed
  * whenever distinct ≪ width and checked by the oracle at the gate SF —
  * every estimate is EXACT.
  *
  * Output: array<long> of depth·width counters, row-major.
  */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"cms depth must be in [1,16], got $depth")
  require(width >= 2, s"cms width must be >= 2, got $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Cms.hash64(
        v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < depth) {
        buf(j * width + Cms.index(h, j, width)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

/** Point lookup into a [[CountMinAgg]] sketch: min over the depth rows.
  * Codegen-resident — the generated code calls the static
  * [[Cms.estimate]], so probing a broadcast sketch inside a scan stays
  * in the WholeStageCodegen span.
  */
case class CmsEstimate(sketch: Expression, item: Expression,
    depth: Int, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = sketch
  override def right: Expression = item
  override def dataType: DataType = LongType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (sketch.dataType, item.dataType) match {
      case (ArrayType(LongType, _), StringType) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"cms_estimate requires (array<long>, string), got $other")
    }
  }

  override protected def nullSafeEval(sk: Any, it: Any): Any =
    Cms.estimate(sk.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      it.asInstanceOf[UTF8String], depth, width)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (sk, it) =>
      s"graft.functions.Cms.estimate($sk, $it, $depth, $width)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CmsEstimate =
    copy(sketch = newLeft, item = newRight)
}

object SketchFunctions {
  /** Aggregate: Misra–Gries top-items sketch over a string column. */
  def freq_items(item: Column, k: Int): Column =
    Bridge.column(FreqItemsSketch(Bridge.expression(item), k)
      .toAggregateExpression())

  /** Aggregate: mergeable quantile sketch over a numeric column —
    * exact interpolated percentiles while input ≤ capacity.
    */
  def quantile_sketch(value: Column, percentiles: Seq[Double],
      capacity: Int = 1 << 17): Column =
    Bridge.column(QuantileSketch(Bridge.expression(value), percentiles, capacity)
      .toAggregateExpression())

  /** Aggregate: mergeable distinct-count sketch — exact while the
    * group's cardinality stays ≤ exactThreshold, HLL beyond.
    */
  def distinct_sketch(item: Column, p: Int = 12,
      exactThreshold: Int = 4096): Column =
    Bridge.column(DistinctSketch(Bridge.expression(item), p, exactThreshold)
      .toAggregateExpression())

  /** Aggregate: distinct sketch evaluating to its serialized STATE —
    * materialize per-bucket summaries for later re-aggregation.
    */
  def distinct_state(item: Column, p: Int = 12,
      exactThreshold: Int = 4096): Column =
    Bridge.column(DistinctSketchState(Bridge.expression(item), p, exactThreshold)
      .toAggregateExpression())

  /** Aggregate: merge serialized states into a distinct estimate —
    * the rollup half of [[distinct_state]].
    */
  def distinct_merge(state: Column, p: Int = 12,
      exactThreshold: Int = 4096): Column =
    Bridge.column(DistinctSketchMerge(Bridge.expression(state), p, exactThreshold)
      .toAggregateExpression())

  /** Aggregate: count-min frequency sketch over a string column —
    * depth×width counters, merge-order-independent.
    */
  def count_min(item: Column, depth: Int = 4, width: Int = 1024): Column =
    Bridge.column(CountMinAgg(Bridge.expression(item), depth, width)
      .toAggregateExpression())

  /** Point estimate from a [[count_min]] sketch (never undercounts). */
  def cms_estimate(sketch: Column, item: Column, depth: Int = 4,
      width: Int = 1024): Column =
    Bridge.column(CmsEstimate(Bridge.expression(sketch),
      Bridge.expression(item), depth, width))
}
