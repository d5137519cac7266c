package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst expressions for the sketch hot path (SURVEY.md §2d).
  *
  * Spark's higher-order array functions (`transform`/`aggregate`) are
  * interpreted per element — a 64-permutation MinHash over ~60 shingles
  * costs ~4k boxed lambda evaluations per row. These expressions do the
  * same math as one call per row into a tight primitive loop (JIT'd),
  * keeping signature generation map-only (no explode, no shuffle):
  * the shape that scans a 100 TB corpus embarrassingly parallel.
  *
  * Each expression implements `doGenCode` (NOT CodegenFallback — that
  * would exclude its whole operator from WholeStageCodegen): the
  * generated code calls the expression's `compute` method through a
  * codegen reference, so the surrounding stage stays fused and the
  * per-row cost is one monomorphic call, no row boxing.
  */

/** 64-permutation MinHash signature from an array of 31-bit positive
  * shingle hashes: sig[i] = min over h of (h·a_i + b_i) mod P.
  */
case class MinHashSignature(child: Expression, numPerm: Int, seed: Long)
    extends UnaryExpression {

  private val P = 2147483647L // 2^31 - 1

  // same parameter stream as a seeded Random drawing (a, b) pairs
  @transient private lazy val (as, bs): (Array[Long], Array[Long]) = {
    val r = new scala.util.Random(seed)
    val a = new Array[Long](numPerm)
    val b = new Array[Long](numPerm)
    var i = 0
    while (i < numPerm) {
      a(i) = 1L + r.nextInt(Int.MaxValue - 1).toLong
      b(i) = r.nextInt(Int.MaxValue).toLong
      i += 1
    }
    (a, b)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = Array.fill(numPerm)(P)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < numPerm) {
        val v = (h * as(i) + bs(i)) % P
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash from an array of 64-bit feature hashes: bit i is set
  * iff Σ over hashes of (bit i set ? +1 : −1) is positive.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct hashed word n-gram shingles from a token array — skips
  * materializing shingle strings entirely: each token is XXH64-hashed
  * once, n-gram hashes chain the token hashes, and dedup happens on the
  * hash values. `mod31` folds results into [0, 2^31) for the MinHash
  * permutation family; otherwise full 64-bit (SimHash / set joins).
  * Fewer than n tokens → one shingle over all tokens (matches
  * TextAnalysis.wordNgrams semantics).
  */
case class NgramHashes(child: Expression, n: Int, mod31: Boolean)
    extends UnaryExpression {

  private val P = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(arr: ArrayData): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val numTok = arr.numElements()
    val tokHash = new Array[Long](numTok)
    var i = 0
    while (i < numTok) {
      val s = arr.getUTF8String(i)
      tokHash(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 42L)
      i += 1
    }
    val win = math.min(n, math.max(numTok, 1))
    val m = math.max(numTok - win + 1, if (numTok == 0) 0 else 1)
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var c = 42L
      var j = 0
      while (j < win && i + j < numTok) {
        c = XXH64.hashLong(tokHash(i + j), c)
        j += 1
      }
      out(i) = if (mod31) ((c % P) + P) % P else c
      i += 1
    }
    // distinct by hash value
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngram", this, classOf[NgramHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** First 60 bits of md5 for EVERY string in an array, in one call —
  * the ORACLE-path shingle hash. Bit-identical to the SQL chain
  * `conv(substring(md5(s), 1, 15), 16, 10)` (DuckDB:
  * `('0x'||substr(md5(s),1,15))::BIGINT`) but computed straight from
  * the digest bytes: no hex-string materialization, no decimal parse,
  * ONE MessageDigest instance per row instead of per shingle. With
  * `mod > 0` the value folds into [0, mod) like the `% Prime` the
  * MinHash family needs.
  */
case class Md5Long60Array(child: Expression, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(arr: ArrayData): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // first 15 hex chars = bytes 0..6 (56 bits) + the HIGH nibble
      // of byte 7 (4 bits) — exactly what substring(md5, 1, 15) parses
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v = (v << 4) | ((d(7) >> 4) & 0xfL)
      out(i) = if (mod > 0) v % mod else v
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md560", this, classOf[Md5Long60Array].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature under an EXPLICIT linear permutation family:
  * sig[i] = min over x of (a(i)·x + b(i)) mod prime — the oracle
  * path's family with md5-derived coefficients, evaluated as one
  * primitive loop per row instead of numPerm interpreted `transform`
  * passes. Bit-identical to the HOF formulation (pure long math,
  * products < 2^62 by the family's construction).
  */
case class LinearMinHash(child: Expression, as: Array[Long],
    bs: Array[Long], prime: Long) extends UnaryExpression {

  // containsNull: an EMPTY shingle set minhashes to all-null, exactly
  // like array_min over an empty transform in the HOF formulation
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val p = as.length
    if (n == 0) return new GenericArrayData(new Array[Any](p))
    val out = new Array[Long](p)
    var i = 0
    while (i < p) {
      val a = as(i); val b = bs(i)
      var mn = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * arr.getLong(j) + b) % prime
        if (v < mn) mn = v
        j += 1
      }
      out(i) = mn
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("linmh", this, classOf[LinearMinHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed-feature bucket counts in ONE pass over a token array:
  * out[pmod(xxhash64(t), numBuckets)] += 1 for every non-null token —
  * bit-identical buckets to the SQL chain `pmod(xxhash64(t), m)`
  * (XXH64 over the UTF8 bytes, seed 42, sign-folded modulo) but
  * O(tokens) instead of the m filter passes the HOF formulation
  * costs (`size(filter(toks, pmod(xxhash64(t), m) === j))` per
  * bucket j — the d−1-traversal shape a 100 TB scorer cannot afford).
  * Output is double (feature vectors feed straight into Σ x⊗x).
  *
  * In-JVM A/B (CurationSpec's fixture corpus ×100 = 50k docs, d = 64,
  * local[32]): 63-pass HOF featurizer 5.0–6.0 s vs one-pass
  * 0.21–0.24 s — ~24× on the scoring scan, identical counts
  * (bit-exactness spec'd in CurationSpec).
  */
case class HashBucketCounts(child: Expression, numBuckets: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)

  def compute(arr: ArrayData): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val counts = new Array[Double](numBuckets)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        val m = numBuckets.toLong
        counts((((h % m) + m) % m).toInt) += 1.0
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketcnt", this, classOf[HashBucketCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** xxhash64 of EVERY w-char sliding window of a string, in one pass —
  * the stride-1 gram hasher of the exact-substring dedup tiers.
  * Element i is BIT-IDENTICAL to `xxhash64(substring(text, i+1, w))`
  * (Spark's xxhash64 hashes the UTF-8 bytes with seed 42; substring
  * slices at char boundaries), but where the expression-tree form pays
  * O(i) char scanning per position (UTF8String.substringSQL walks from
  * the string start) plus a string + struct allocation per gram, this
  * walks the char starts ONCE and hashes each byte window in place —
  * O(len·w) total, zero per-gram allocation. Pair with `posexplode`
  * for (position, hash) rows. Strings shorter than w yield an empty
  * array (callers filter `length >= w` anyway).
  */
case class CharGramXxHashes(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, "window must be positive")

  // internal-only expression (no SQL registration), but a typed
  // contract still turns a mis-wired non-string child into an
  // analysis-time error instead of a runtime ClassCastException
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_gram_hashes expects a string child, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val nBytes = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // one forward pass collects char start offsets
    var nChars = 0
    var b = 0
    val starts = new Array[Int](nBytes + 1)
    while (b < nBytes) {
      starts(nChars) = b
      b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + b))
      nChars += 1
    }
    starts(nChars) = nBytes
    val m = nChars - w + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s0 = starts(i)
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + s0, starts(i + w) - s0, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("chargram", this, classOf[CharGramXxHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DISTINCT md5-60-bit hashes of the word n-grams of a token array, in
  * one pass — the fused form of
  * `array_distinct(md5_long60_array(ngramsFromTokens(toks, n), mod))`.
  * Each gram's bytes (tokens joined by a single space) are assembled
  * into one reused buffer and digested directly: no gram STRING array
  * is ever materialized, no per-gram slice/concat_ws allocation, one
  * MessageDigest per row. Hash values are bit-identical to the HOF
  * chain (same join bytes, same substring(md5,1,15) bit extraction,
  * same mod fold); the distinct SET is identical but sorted ascending
  * instead of first-occurrence order — every consumer (linear_minhash
  * min fold, simhash64 votes over the distinct set) is order-
  * insensitive, and the order-insensitivity is part of this
  * expression's contract (spec'd in SqlFunctionsSpec).
  * `numTok < n` mirrors ngramsFromTokens: ONE gram joining all tokens.
  */
case class WordGramMd5Long60(child: Expression, n: Int, mod: Long)
    extends UnaryExpression {

  require(n >= 1, "gram width must be positive")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_gram_md5_long60 expects array<string> tokens, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(arr: ArrayData): ArrayData = {
    val numTok = arr.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    // token bytes once; gram bytes assembled into one growing buffer
    val toks = new Array[Array[Byte]](numTok)
    var i = 0
    while (i < numTok) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
    val win = math.min(n, math.max(numTok, 1))
    val m = math.max(numTok - win + 1, 1) // numTok < n → one join-all gram
    var buf = new Array[Byte](64)
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var len = 0
      var j = 0
      while (j < win && i + j < numTok) {
        val t = toks(i + j)
        if (len + t.length + 1 > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2,
            len + t.length + 1))
        if (j > 0) { buf(len) = ' '; len += 1 }
        System.arraycopy(t, 0, buf, len, t.length)
        len += t.length
        j += 1
      }
      md.reset()
      md.update(buf, 0, len)
      val d = md.digest()
      // first 15 hex chars = bytes 0..6 + high nibble of byte 7 —
      // exactly the Md5Long60Array extraction
      var v = 0L
      j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v = (v << 4) | ((d(7) >> 4) & 0xfL)
      out(i) = if (mod > 0) v % mod else v
      i += 1
    }
    // distinct by value (sorted — consumers are order-insensitive)
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wgmd560", this, classOf[WordGramMd5Long60].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** md5 hex strings of every word n-gram of a token array, IN POSITION
  * ORDER — the winnowing fingerprint gram hasher. Element i is
  * bit-identical to `md5(concat_ws(' ', slice(toks, i + 1, n)))` (the
  * 32-char lowercase hex rendering both engines produce) but assembled
  * from the token bytes in one reused buffer: no per-gram slice array,
  * no concat string, no hex-format interpretation per element. Fewer
  * than n tokens → empty array (callers guard `size >= n`, matching
  * the HOF form's sequence() domain).
  */
case class WordGramMd5Hex(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "gram width must be positive")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_gram_md5_hex expects array<string> tokens, got $other")
    }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  private val HexChars = "0123456789abcdef".getBytes

  def compute(arr: ArrayData): ArrayData = {
    val numTok = arr.numElements()
    val m = numTok - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = new Array[Array[Byte]](numTok)
    var i = 0
    while (i < numTok) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
    var buf = new Array[Byte](64)
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      var len = 0
      var j = 0
      while (j < n) {
        val t = toks(i + j)
        if (len + t.length + 1 > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2,
            len + t.length + 1))
        if (j > 0) { buf(len) = ' '; len += 1 }
        System.arraycopy(t, 0, buf, len, t.length)
        len += t.length
        j += 1
      }
      md.reset()
      md.update(buf, 0, len)
      val d = md.digest()
      val hex = new Array[Byte](32)
      j = 0
      while (j < 16) {
        hex(2 * j) = HexChars((d(j) >> 4) & 0xf)
        hex(2 * j + 1) = HexChars(d(j) & 0xf)
        j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromBytes(hex)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wgmd5hex", this, classOf[WordGramMd5Hex].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  /** Column API for [[MinHashSignature]]; input: array<long> of 31-bit
    * positive shingle hashes.
    */
  def minhash_signature(hashes: Column, numPerm: Int = 64,
      seed: Long = 7L): Column =
    Bridge.column(MinHashSignature(Bridge.expression(hashes), numPerm, seed))

  /** Column API for [[SimHash64]]; input: array<long> of feature hashes. */
  def simhash64(hashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(hashes)))

  /** Column API for [[NgramHashes]]; input: array<string> tokens. */
  def ngram_hashes(tokens: Column, n: Int, mod31: Boolean): Column =
    Bridge.column(NgramHashes(Bridge.expression(tokens), n, mod31))

  /** Column API for [[Md5Long60Array]]; input: array<string>. */
  def md5_long60_array(strs: Column, mod: Long = 0L): Column =
    Bridge.column(Md5Long60Array(Bridge.expression(strs), mod))

  /** Column API for [[HashBucketCounts]]; input: array<string> tokens. */
  def hash_bucket_counts(tokens: Column, numBuckets: Int): Column =
    Bridge.column(HashBucketCounts(Bridge.expression(tokens), numBuckets))

  /** Column API for [[LinearMinHash]]; input: array<long>. */
  def linear_minhash(hashes: Column, as: Array[Long], bs: Array[Long],
      prime: Long): Column =
    Bridge.column(LinearMinHash(Bridge.expression(hashes), as, bs, prime))

  /** Column API for [[CharGramXxHashes]]; input: string. */
  def char_gram_hashes(text: Column, w: Int): Column =
    Bridge.column(CharGramXxHashes(Bridge.expression(text), w))

  /** Column API for [[WordGramMd5Long60]]; input: array<string> tokens. */
  def word_gram_md5_long60(tokens: Column, n: Int, mod: Long = 0L): Column =
    Bridge.column(WordGramMd5Long60(Bridge.expression(tokens), n, mod))

  /** Column API for [[WordGramMd5Hex]]; input: array<string> tokens. */
  def word_gram_md5_hex(tokens: Column, n: Int): Column =
    Bridge.column(WordGramMd5Hex(Bridge.expression(tokens), n))
}
