package graft.queries

import graft.Tables
import graft.etl.{DedupAppend, Scd2}
import graft.ops.Expectations
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-surface ETL as oracled queries (SURVEY.md §2b). */
object Etl {

  /** Semi-structured extraction: pull a typed field out of the JSON
    * `props` column — the same shape as the reference's API-response
    * flattening, on the engine's events table. `get_json_object` is a
    * codegen'd path extraction; no UDF.
    */
  def jsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_id",
        get_json_object($"props", "$.k").cast("int").as("k"),
        $"event_type", $"value")
      .filter($"k" >= 50)
      .orderBy($"event_id")
  }

  /** Dedup-on-append through the library operator: the batch is the full
    * documents table, the "existing table" is the already-loaded subset
    * (doc_id ≡ 0 mod 10) — output is exactly the rows an incremental
    * load would append. Mirrors reference loadIntoDeltaTable.
    */
  def dedupAppend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val existing = docs.filter($"doc_id" % 10 === 0)
    DedupAppend.newRows(docs, existing, "doc_id")
      .select($"doc_id", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Zero-copy adoption of a REAL Delta Lake table
    * ([[graft.etl.DeltaLite.convertFromDelta]]): a faithful
    * `_delta_log` is synthesized over three single-file document
    * batches (v0 adds batch A, v1 adds B and C, v2 REMOVES C — the
    * multi-commit + remove shape of a live table), then adopted
    * metadata-only and read back. The live set is exactly the rows
    * with doc_id % 3 < 2, which is what the oracle derives from the
    * flat table — a replay bug (remove not applied, batch dropped,
    * path mis-resolved) hash-mismatches immediately. Fresh dirs each
    * run so the log replay is actually exercised, not cached.
    */
  def convertFromDelta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // per-user path in the shared tmpdir (the mineAnn hardening rule)
    // and a VERIFIED pre-clean: building the fixture over another
    // run's leftovers would adopt a log over mixed batches
    val base = s"${sys.props("java.io.tmpdir")}/graft-delta-adopt-" +
      s"${sys.props.getOrElse("user.name", "anon")}/" +
      s"${dir.hashCode & 0x7fffffff}"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    require(!fs.exists(new org.apache.hadoop.fs.Path(base)),
      s"fixture dir $base could not be cleared — refusing to adopt " +
        "over leftovers")
    val docs = Tables.documents(s, dir)
      .select($"doc_id", $"source", $"n_chars")
    def land(tag: Int): (String, Long) = {
      val stage = s"$base/stage/b$tag"
      docs.filter($"doc_id" % 3 === tag).coalesce(1)
        .write.parquet(stage)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      val dst = new org.apache.hadoop.fs.Path(s"$base/tbl", part.getName)
      org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false,
        s.sparkContext.hadoopConfiguration)
      (part.getName, fs.getFileStatus(dst).getLen)
    }
    val (fa, sa) = land(0); val (fb, sb) = land(1); val (fc, sc) = land(2)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def add(name: String, size: Long): String = {
      val root = mapper.createObjectNode()
      val a = root.putObject("add")
      a.put("path", name); a.putObject("partitionValues")
      a.put("size", size); a.put("modificationTime", 0L)
      a.put("dataChange", true)
      mapper.writeValueAsString(root)
    }
    val meta = {
      val root = mapper.createObjectNode()
      val m = root.putObject("metaData")
      m.put("id", "graft-adopt-fixture")
      m.putObject("format").put("provider", "parquet")
      m.put("schemaString", docs.schema.json)
      m.putArray("partitionColumns"); m.putObject("configuration")
      mapper.writeValueAsString(root)
    }
    def commit(v: Long, lines: Seq[String]): Unit = {
      val p = new org.apache.hadoop.fs.Path(
        s"$base/tbl/_delta_log", f"$v%020d.json")
      val out = fs.create(p, true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
    commit(0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      meta, add(fa, sa)))
    commit(1, Seq(add(fb, sb), add(fc, sc)))
    commit(2, Seq(s"""{"remove":{"path":"$fc","deletionTimestamp":1,"dataChange":true}}"""))
    graft.etl.DeltaLite
      .convertFromDelta(s, s"$base/tbl", s"$base/root")
      .read()
      .orderBy($"doc_id")
  }

  /** Zero-copy adoption of a PARTITIONED Delta table — the layout real
    * migrations start with (a daily/source-partitioned lake, its
    * partition column bytes living only in the `_delta_log`). The
    * fixture is ONE `partitionBy` write of the documents table (Spark
    * drops the partition column from the file bytes — exactly Delta's
    * physical layout), a synthesized log mapping each `source=<v>/`
    * file to its `partitionValues`, and a v1 REMOVE of the src7
    * partition's file. Adoption carries the values as per-file [v,v]
    * ranges + the valuesInLog property; the query then filters a
    * source set THROUGH the injected column — src7 must be gone (the
    * remove applied) and the partition filter plans only the matching
    * files. The oracle derives the same rows from the flat table.
    */
  def convertFromDeltaPartitioned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = s"${sys.props("java.io.tmpdir")}/graft-delta-adopt-part-" +
      s"${sys.props.getOrElse("user.name", "anon")}/" +
      s"${dir.hashCode & 0x7fffffff}"
    val hconf = s.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(hconf)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    require(!fs.exists(new org.apache.hadoop.fs.Path(base)),
      s"fixture dir $base could not be cleared — refusing to adopt " +
        "over leftovers")
    val docs = Tables.documents(s, dir)
      .select($"doc_id", $"source", $"n_chars")
    // ONE hive-partitioned write: file bytes carry (doc_id, n_chars)
    // only — the faithful Delta physical layout, in a single job
    docs.repartition($"source").write.partitionBy("source")
      .parquet(s"$base/tbl")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = {
      val root = mapper.createObjectNode()
      val m = root.putObject("metaData")
      m.put("id", "graft-adopt-part-fixture")
      m.putObject("format").put("provider", "parquet")
      m.put("schemaString", docs.schema.json)
      m.putArray("partitionColumns").add("source")
      m.putObject("configuration")
      mapper.writeValueAsString(root)
    }
    // per-partition files from the write's own layout
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/tbl"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("source="))
      .sortBy(_.getPath.getName)
    def adds(p: org.apache.hadoop.fs.FileStatus): Seq[String] = {
      val src = p.getPath.getName.stripPrefix("source=")
      fs.listStatus(p.getPath)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName)
        .map { f =>
          val root = mapper.createObjectNode()
          val a = root.putObject("add")
          a.put("path", s"${p.getPath.getName}/${f.getPath.getName}")
          a.putObject("partitionValues").put("source", src)
          a.put("size", f.getLen)
          a.put("modificationTime", 0L); a.put("dataChange", true)
          mapper.writeValueAsString(root)
        }.toSeq
    }
    def commit(v: Long, lines: Seq[String]): Unit = {
      val p = new org.apache.hadoop.fs.Path(
        s"$base/tbl/_delta_log", f"$v%020d.json")
      val out = fs.create(p, true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
    commit(0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      meta) ++ parts.flatMap(adds))
    val src7 = parts.find(_.getPath.getName == "source=src7")
      .map(p => fs.listStatus(p.getPath)
        .filter(_.getPath.getName.endsWith(".parquet")).head)
      .getOrElse(sys.error("fixture lacks the src7 partition"))
    commit(1, Seq(
      s"""{"remove":{"path":"source=src7/${src7.getPath.getName}","deletionTimestamp":1,"dataChange":true}}"""))
    graft.etl.DeltaLite
      .convertFromDelta(s, s"$base/tbl", s"$base/root")
      .read()
      // the filter includes the REMOVED partition: its rows must be
      // gone, and the surviving two prune to their files in the scan
      .filter($"source".isin("src3", "src7", "src12"))
      .orderBy($"doc_id")
  }

  /** Zero-copy adoption of a DELETION-VECTOR-bearing Delta table — the
    * default output of modern Databricks runtimes (DVs on). The
    * fixture writes two SORTED single-file document batches (A:
    * doc_id%3=0, B: %3=1) plus an unmasked batch C (%3=2), then masks
    * batch A's row positions idx%7=0 through a `.bin` RoaringBitmap
    * sidecar ("u" storage, Z85 uuid path) and batch B's idx%11=3
    * INLINE ("i" storage) — both real Delta DV forms ([[graft.etl
    * .DeltaDv]]). Adoption decodes them into the engine's own
    * merge-on-read sidecars; the oracle derives the same surviving
    * rows with row_number over each sorted batch — any decode/framing
    * /position bug hash-mismatches immediately.
    */
  def convertFromDeltaDv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = s"${sys.props("java.io.tmpdir")}/graft-delta-adopt-dv-" +
      s"${sys.props.getOrElse("user.name", "anon")}/" +
      s"${dir.hashCode & 0x7fffffff}"
    val hconf = s.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(hconf)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    require(!fs.exists(new org.apache.hadoop.fs.Path(base)),
      s"fixture dir $base could not be cleared — refusing to adopt " +
        "over leftovers")
    val docs = Tables.documents(s, dir)
      .select($"doc_id", $"source", $"n_chars")
    // SORTED single-file batches: the oracle addresses DV positions as
    // row_number() over doc_id, so the file's physical row order must
    // be doc_id-ascending
    def land(tag: Int): (String, Long, Long) = {
      val stage = s"$base/stage/b$tag"
      val b = docs.filter($"doc_id" % 3 === tag)
        .repartition(1).sortWithinPartitions("doc_id")
      b.write.parquet(stage)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      val dst = new org.apache.hadoop.fs.Path(s"$base/tbl", part.getName)
      org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dst, false, hconf)
      (part.getName, fs.getFileStatus(dst).getLen, b.count())
    }
    val (fa, sa, na) = land(0); val (fb, sb, nb) = land(1)
    val (fc, sc, _) = land(2)
    // batch A: positions idx%7=0 masked via a .bin sidecar
    val posA = (0L until na by 7).toArray
    val payloadA = graft.etl.DeltaDv.serializeBitmapArray(posA)
    val (binBytes, offs) = graft.etl.DeltaDv.frameDvFile(Seq(payloadA))
    val uuid = java.util.UUID.randomUUID()
    val binP = new org.apache.hadoop.fs.Path(
      s"$base/tbl", s"deletion_vector_$uuid.bin")
    val os = fs.create(binP, true)
    try os.write(binBytes) finally os.close()
    val dvA = s"""{"storageType":"u","pathOrInlineDv":"${
      graft.etl.DeltaDv.encodeUuidPath(uuid)}","offset":${offs.head},""" +
      s""""sizeInBytes":${payloadA.length},"cardinality":${posA.length}}"""
    // batch B: positions idx%11=3 masked inline
    val posB = (3L until nb by 11).toArray
    val payloadB = graft.etl.DeltaDv.serializeBitmapArray(posB)
    val padB = payloadB ++ new Array[Byte]((4 - payloadB.length % 4) % 4)
    val dvB = s"""{"storageType":"i","pathOrInlineDv":"${
      graft.etl.DeltaDv.z85Encode(padB)}","sizeInBytes":${
      payloadB.length},"cardinality":${posB.length}}"""
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def add(name: String, size: Long, dv: Option[String]): String = {
      val root = mapper.createObjectNode()
      val a = root.putObject("add")
      a.put("path", name); a.putObject("partitionValues")
      a.put("size", size); a.put("modificationTime", 0L)
      a.put("dataChange", true)
      dv.foreach(j => a.set[com.fasterxml.jackson.databind.JsonNode](
        "deletionVector", mapper.readTree(j)))
      mapper.writeValueAsString(root)
    }
    val meta = {
      val root = mapper.createObjectNode()
      val m = root.putObject("metaData")
      m.put("id", "graft-adopt-dv-fixture")
      m.putObject("format").put("provider", "parquet")
      m.put("schemaString", docs.schema.json)
      m.putArray("partitionColumns"); m.putObject("configuration")
      mapper.writeValueAsString(root)
    }
    val p = new org.apache.hadoop.fs.Path(
      s"$base/tbl/_delta_log", f"${0L}%020d.json")
    val out = fs.create(p, true)
    try out.write((Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors"]}}""",
      meta, add(fa, sa, Some(dvA)), add(fb, sb, Some(dvB)),
      add(fc, sc, None)).mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    graft.etl.DeltaLite
      .convertFromDelta(s, s"$base/tbl", s"$base/root")
      .read()
      .orderBy($"doc_id")
  }

  /** Data-quality expectations over the load: per-rule pass/fail
    * counts in ONE aggregate over one scan (`ops.Expectations`) — the
    * quality gate a managed pipeline attaches to every table
    * (violations counted map-side; the shuffle carries #rules rows).
    * Thresholds chosen so some rules are clean and some catch rows.
    */
  def expectations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Expectations.metrics(Tables.lineitem(s, dir), Seq(
      "discount_capped" -> ($"l_discount" <= 0.08),
      "price_floor" -> ($"l_extendedprice" >= 5000.0),
      "qty_positive" -> ($"l_quantity" > 0.0),
      "qty_under_46" -> ($"l_quantity" <= 45.0),
      "tax_under_6pct" -> ($"l_tax" < 0.06)))
  }

  /** SCD2 dimension build from the events change log: each user's
    * event_type stream becomes versioned [valid_from, valid_to)
    * intervals with consecutive-equal compression — one shuffle, two
    * stacked window passes (`etl.Scd2.build`).
    */
  def scd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Scd2.build(Tables.events(s, dir), "user_id", "ts",
      attrs = Seq("event_type"), tieBreak = Seq("event_id"))
      .orderBy($"user_id", $"valid_from")
  }
}
