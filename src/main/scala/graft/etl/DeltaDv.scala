package graft.etl

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.roaringbitmap.RoaringBitmap

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

/** Codec for REAL Delta Lake deletion vectors — the published on-disk
  * format (Delta protocol spec, "Deletion Vectors": a per-add
  * descriptor naming inline bytes or a `.bin` sidecar; positions are
  * row indexes within the data file, exactly `_metadata.row_index`).
  * This is what lets [[DeltaInterop]] ADOPT the tables modern
  * Databricks runtimes produce by default (DVs on), instead of
  * refusing until a source-side OPTIMIZE materializes the deletes —
  * the decoded positions land as [[DeltaLite]]'s own merge-on-read DV
  * sidecars, zero data files copied or rewritten.
  *
  * Three public layers, each refusing loudly on malformed input:
  *  - Z85 (the ZeroMQ base85 alphabet Delta's Base85Codec uses) for
  *    the descriptor's UUID / inline payload encoding;
  *  - the RoaringBitmapArray "portable" serialization (magic
  *    1681511377, little-endian; 64-bit values as (key, 32-bit
  *    roaring bitmap) pairs — decoded through the RoaringBitmap
  *    library Spark already ships);
  *  - the `.bin` file framing (1-byte format version, then per-DV:
  *    big-endian size, payload, big-endian CRC-32).
  *
  * The ENCODER half exists so specs can synthesize byte-faithful
  * DV'd fixtures (and a future DV export has its write path); the
  * decode half is the adoption-critical surface.
  */
object DeltaDv {

  /** The Z85 alphabet (ZeroMQ spec 32) — the charset Delta's
    * Base85Codec encodes DV UUIDs and inline payloads with.
    */
  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Z85-encode `bytes` (length must be a multiple of 4: each 4-byte
    * big-endian group renders as 5 alphabet chars, most significant
    * first — UUIDs are 16 bytes → 20 chars).
    */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"Z85 encodes 4-byte groups; got ${bytes.length} bytes")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div >= 1) {
        sb.append(Z85Alphabet(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.toString
  }

  /** Z85-decode (length must be a multiple of 5). */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0,
      s"Z85 decodes 5-char groups; got ${s.length} chars")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c' in '$s'")
        v = v * 85 + d
        j += 1
      }
      // a 5-char group encodes at most 2^32-1; a larger value is a
      // corrupt encoding — refuse at the boundary instead of silently
      // truncating into a plausible-looking wrong payload
      require(v <= 0xffffffffL,
        s"Z85 group '${s.substring(i, i + 5)}' exceeds 32 bits — " +
          "corrupt encoding")
      var k = 0
      while (k < 4) {
        out(i / 5 * 4 + k) = ((v >>> (8 * (3 - k))) & 0xff).toByte
        k += 1
      }
      i += 5
    }
    out
  }

  /** One add action's deletion-vector descriptor (the Delta protocol's
    * DeletionVectorDescriptor shape). `offset` is present only for
    * on-disk storage ("u"/"p"); `sizeInBytes` is the serialized bitmap
    * length; `cardinality` the number of deleted rows.
    */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long)
    extends Serializable

  /** Magic number of the RoaringBitmapArray "portable" serialization
    * (the only format the Delta spec permits in DV files).
    */
  val PortableMagic = 1681511377

  /** Serialize sorted 64-bit `positions` as a portable
    * RoaringBitmapArray: magic, number of 32-bit bitmaps (LE long),
    * then per bitmap its high-32 `key` (LE int) and the standard
    * little-endian roaring serialization. Keys must appear in
    * ascending order with no gaps per the spec — Delta writes one
    * bitmap per populated 2^32 stripe, so sparse high keys still
    * serialize each populated stripe once.
    */
  def serializeBitmapArray(positions: Array[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "DV positions must be >= 0")
    val byKey = positions.groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
    // spec: the number of bitmaps equals maxKey+1 (dense keys) — empty
    // stripes serialize as empty bitmaps so the reader can index
    val maxKey = byKey.lastOption.map(_._1).getOrElse(-1)
    val bitmaps = (0 to maxKey).map { k =>
      val rb = new RoaringBitmap()
      byKey.find(_._1 == k).foreach { case (_, ps) =>
        ps.foreach(p => rb.add((p & 0xffffffffL).toInt))
      }
      rb.runOptimize()
      rb
    }
    val size = 4 + 8 + bitmaps.map(b => 4 + b.serializedSizeInBytes).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(PortableMagic)
    buf.putLong(bitmaps.size.toLong)
    bitmaps.zipWithIndex.foreach { case (rb, k) =>
      buf.putInt(k)
      rb.serialize(buf)
    }
    require(!buf.hasRemaining, "bitmap serialization size mismatch")
    buf.array()
  }

  /** Decode a portable RoaringBitmapArray into sorted 64-bit
    * positions. Refuses on a wrong magic or torn payload.
    */
  def deserializeBitmapArray(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.remaining >= 12,
      s"DV bitmap payload truncated at ${bytes.length} bytes")
    val magic = buf.getInt
    require(magic == PortableMagic,
      s"DV bitmap magic $magic is not the portable format " +
        s"($PortableMagic) — unsupported serialization")
    val n = buf.getLong
    require(n >= 0 && n <= Int.MaxValue, s"absurd bitmap count $n")
    val out = Array.newBuilder[Long]
    var i = 0L
    while (i < n) {
      require(buf.remaining >= 4, s"bitmap $i truncated")
      val key = buf.getInt
      require(key >= 0, s"negative bitmap key $key")
      val rb = new RoaringBitmap()
      rb.deserialize(buf)
      // deserialize(ByteBuffer) reads from position but does not
      // advance it — step past the consumed bytes explicitly
      buf.position(buf.position() + rb.serializedSizeInBytes)
      val it = rb.getIntIterator
      while (it.hasNext) {
        out += (key.toLong << 32) | (it.next() & 0xffffffffL)
      }
      i += 1
    }
    out.result()
  }

  /** Frame one or more DV payloads into `.bin` file bytes: version
    * byte 1, then per payload [size BE][payload][crc32 BE]. Returns
    * (fileBytes, offsets aligned with `payloads` — each the
    * descriptor `offset` pointing at its size field).
    */
  def frameDvFile(payloads: Seq[Array[Byte]]): (Array[Byte], Seq[Int]) = {
    val total = 1 + payloads.map(p => 4 + p.length + 4).sum
    val buf = ByteBuffer.allocate(total) // big-endian (default)
    buf.put(1.toByte)
    val offsets = payloads.map { p =>
      val off = buf.position()
      buf.putInt(p.length)
      buf.put(p)
      val crc = new CRC32()
      crc.update(p)
      buf.putInt(crc.getValue.toInt)
      off
    }
    (buf.array(), offsets)
  }

  /** Resolve a descriptor to the absolute `.bin` path it names, or
    * None for inline storage. Storage types (Delta spec):
    *  - "u": `pathOrInlineDv` = `<random prefix><z85 uuid (20 ch)>`;
    *    the file is `<table>/<prefix>/deletion_vector_<uuid>.bin`;
    *  - "p": an absolute path/URI, kept verbatim;
    *  - "i": inline — the payload is z85-encoded in the descriptor.
    */
  def resolvePath(tableDir: String, d: Descriptor): Option[Path] =
    d.storageType match {
      case "u" =>
        require(d.pathOrInlineDv.length >= 20,
          s"DV uuid encoding too short: '${d.pathOrInlineDv}'")
        val (prefix, enc) = d.pathOrInlineDv.splitAt(
          d.pathOrInlineDv.length - 20)
        val raw = z85Decode(enc)
        val bb = ByteBuffer.wrap(raw)
        val uuid = new java.util.UUID(bb.getLong, bb.getLong)
        val name = s"deletion_vector_$uuid.bin"
        Some(
          if (prefix.isEmpty) new Path(tableDir, name)
          else new Path(new Path(tableDir, prefix), name))
      case "p" => Some(new Path(d.pathOrInlineDv))
      case "i" => None
      case other =>
        throw new IllegalArgumentException(
          s"unknown DV storageType '$other' — refusing to guess")
    }

  /** The UUID-form `pathOrInlineDv` for writing a "u" descriptor. */
  def encodeUuidPath(uuid: java.util.UUID, prefix: String = ""): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    prefix + z85Encode(bb.array())
  }

  /** Decode one descriptor's deleted-row positions, verifying the
    * file version byte, declared size, CRC-32 and cardinality. Opens
    * the filesystem through `conf` so it runs identically driver-side
    * and inside executors.
    */
  def positions(conf: Configuration, tableDir: String,
      d: Descriptor): Array[Long] = {
    val payload = d.storageType match {
      case "i" =>
        val raw = z85Decode(d.pathOrInlineDv)
        // z85 pads to 4-byte groups; the descriptor carries the true
        // payload length
        require(raw.length >= d.sizeInBytes,
          s"inline DV shorter (${raw.length}) than declared " +
            s"${d.sizeInBytes}")
        raw.take(d.sizeInBytes)
      case _ =>
        val p = resolvePath(tableDir, d).get
        val fs = p.getFileSystem(conf)
        val off = d.offset.getOrElse(
          throw new IllegalArgumentException(
            s"on-disk DV at $p lacks an offset"))
        val in = fs.open(p)
        try {
          val version = in.read()
          require(version == 1,
            s"DV file $p has format version $version (supported: 1)")
          in.seek(off.toLong)
          val head = new Array[Byte](4)
          in.readFully(head)
          val size = ByteBuffer.wrap(head).getInt
          require(size == d.sizeInBytes,
            s"DV at $p+$off declares $size bytes on disk but " +
              s"${d.sizeInBytes} in the descriptor — torn or mismatched")
          val data = new Array[Byte](size)
          in.readFully(data)
          val crcB = new Array[Byte](4)
          in.readFully(crcB)
          val crc = new CRC32()
          crc.update(data)
          require(ByteBuffer.wrap(crcB).getInt == crc.getValue.toInt,
            s"DV at $p+$off fails its CRC-32 — corrupt payload")
          data
        } finally in.close()
    }
    val pos = deserializeBitmapArray(payload)
    require(pos.length.toLong == d.cardinality,
      s"DV decoded ${pos.length} positions but the descriptor " +
        s"declares cardinality ${d.cardinality} — refusing a torn mask")
    pos
  }

  /** Scheme+authority prefix of a path rendering — stripping it yields
    * the CANONICAL data-plane path form shared by the DV join key on
    * both sides (DeltaLite's normFileCol and [[canonPath]]).
    */
  val SchemeAuthorityRe = "^[a-zA-Z][a-zA-Z0-9+.\\-]*:(//[^/]*)?"

  /** Canonical data-plane form of an absolute path/URI string — the
    * `__file` key a synthesized DV row must carry so every read
    * route's normalized `_metadata.file_path` matches it.
    */
  def canonPath(p: String): String = new Path(p).toUri.getPath

  /** DISTRIBUTED decode of adopted DVs into [[DeltaLite]]'s sidecar
    * rows: one task per DV'd file opens/decodes its bitmap
    * executor-side and emits `(__file, __pos)` rows — the driver never
    * holds O(deleted) positions, matching the merge-on-read contract
    * at any cardinality. `files` pairs each file's CANONICAL data-plane
    * path ([[canonPath]] — the DV join key) with its descriptor;
    * `conf` must be the shippable session Hadoop conf
    * ([[org.apache.spark.sql.graftbridge.Bridge.shippableHadoopConf]])
    * so executor-side opens see the session's filesystem credentials.
    */
  def sidecarRows(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, files: Seq[(String, Descriptor)],
      conf: org.apache.spark.util.SerializableConfiguration)
      : org.apache.spark.sql.DataFrame = {
    val slices = math.max(1, math.min(files.size, 256))
    val rdd = spark.sparkContext
      .parallelize(files, slices)
      .mapPartitions { it =>
        val c = conf.value
        it.flatMap { case (canon, d) =>
          positions(c, tableDir, d).iterator
            .map(p => org.apache.spark.sql.Row(canon, p))
        }
      }
    spark.createDataFrame(rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__file",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("__pos",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
