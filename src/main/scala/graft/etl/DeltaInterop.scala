package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Reader for REAL Delta Lake transaction logs (the open `_delta_log`
  * format: one JSON file of actions per commit plus optional parquet
  * checkpoints — the format published in the Delta protocol spec and
  * the reference project's own table format, README.md:237-248). This
  * is the ZERO-COPY migration path: a user whose data already lives as
  * a Databricks/OSS-Delta table adopts it into a [[DeltaLite]] table
  * via [[DeltaLite.convertFromDelta]] without rewriting a byte — the
  * replayed live set re-references the parquet in place.
  *
  * Scope is deliberate and LOUD at its edges:
  *  - add / remove / metaData / protocol actions replay; commitInfo /
  *    txn are metadata-only and skipped.
  *  - `schemaString` parses directly ([[StructType]] JSON is the
  *    wire format Delta uses).
  *  - Parquet checkpoints (single- and multi-part) splice the replay
  *    exactly like DeltaLite's own checkpoints: base state from the
  *    checkpoint, JSON deltas above it.
  *  - Partitioned tables are REFUSED here (their data files lack the
  *    partition columns' bytes — the values live in
  *    `add.partitionValues` — which DeltaLite's leaf-file reads
  *    require; the refusal names the workaround).
  *  - Reader features beyond the base protocol (column mapping,
  *    deletion vectors, v3 reader features) are REFUSED by name,
  *    never silently misread.
  *
  * Replay is driver-side over O(log) metadata — the same contract as
  * DeltaLite's own commit machinery; the DATA stays distributed and
  * untouched.
  */
object DeltaInterop {

  /** One live file of the replayed snapshot. `path` is absolute;
    * `partitionValues` carries the add entry's values (non-empty only
    * on partitioned tables, which [[DeltaLite.convertFromDelta]]
    * refuses — surfaced so a caller building its own migration can see
    * them); `stats` is the add action's raw per-file stats JSON
    * (minValues/maxValues/numRecords) when the writer recorded one.
    */
  final case class AddFile(path: String,
      partitionValues: Map[String, String], size: Option[Long],
      stats: Option[String] = None)

  /** A replayed Delta snapshot: the live file set as of `version`,
    * with the schema and partitioning declared by the latest metaData
    * action at or below it.
    */
  final case class Snapshot(version: Long, schema: StructType,
      partitionColumns: Seq[String], configuration: Map[String, String],
      files: Seq[AddFile])

  private val LogDir = "_delta_log"

  private def jsonCommitVersion(name: String): Option[Long] =
    if (name.matches("\\d{20}\\.json")) Some(name.stripSuffix(".json").toLong)
    else None

  /** Checkpoint part files for a version: `n.checkpoint.parquet` or
    * `n.checkpoint.<part>.<of>.parquet`.
    */
  private def checkpointVersion(name: String): Option[Long] =
    if (name.matches("\\d{20}\\.checkpoint\\.parquet") ||
      name.matches("\\d{20}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet"))
      Some(name.takeWhile(_.isDigit).toLong)
    else None

  /** Resolve an action's `path` against the table root: Delta writes
    * RELATIVE URI-encoded paths for files under the table and absolute
    * URIs for external files.
    */
  private def resolvePath(tableDir: String, p: String): String = {
    val u = try new java.net.URI(p) catch {
      case _: java.net.URISyntaxException => null
    }
    if (u != null && u.isAbsolute) p // absolute URI (scheme kept)
    else {
      val decoded = if (u != null && u.getPath != null) u.getPath else p
      if (decoded.startsWith("/")) decoded
      else new Path(tableDir, decoded).toString
    }
  }

  private def textMap(n: JsonNode): Map[String, String] =
    if (n == null || !n.isObject) Map.empty
    else {
      val b = Map.newBuilder[String, String]
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
      }
      b.result()
    }

  /** Replay the `_delta_log` under `tableDir` to `versionAsOf` (or the
    * latest commit). Every unsupported input refuses loudly, naming
    * what it saw.
    */
  def snapshot(spark: SparkSession, tableDir: String,
      versionAsOf: Option[Long] = None): Snapshot = {
    val root = new Path(tableDir)
    val log = new Path(root, LogDir)
    val fs = log.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(log),
      s"no $LogDir under $tableDir — not a Delta table (for plain " +
        "parquet directories use DeltaLite.convert)")
    val names = fs.listStatus(log).map(_.getPath.getName).toSeq
    val jsonVersions = names.flatMap(jsonCommitVersion).distinct.sorted
    val ckptVersions = names.flatMap(checkpointVersion).distinct.sorted
    val latest = (jsonVersions ++ ckptVersions).maxOption.getOrElse(
      sys.error(s"empty $LogDir under $tableDir — no commits to adopt"))
    val target = versionAsOf.getOrElse(latest)
    require(target >= 0 && target <= latest,
      s"version $target does not exist in $tableDir (latest: $latest)")

    // splice point: the largest checkpoint at or below the target —
    // its parquet rows are the reconciled state through that version;
    // JSON deltas replay above it. No checkpoint → pure-JSON replay
    // from 0, requiring an unbroken chain (a vacuumed-away commit
    // below the oldest checkpoint is unreadable and must say so).
    val base = ckptVersions.filter(_ <= target).maxOption
    val replayFrom = base.map(_ + 1).getOrElse(0L)
    val needed = (replayFrom to target)
    val missing = needed.filterNot(jsonVersions.contains)
    require(missing.isEmpty,
      s"commit ${missing.head} of $tableDir is missing from $LogDir " +
        base.map(b => s"(checkpoint at $b cannot cover it)")
          .getOrElse("(and no checkpoint covers it)") +
        " — the log chain is broken or was vacuumed past this version")

    val mapper = new ObjectMapper()
    var schemaJson: Option[String] = None
    var partitionCols: Seq[String] = Nil
    var configuration: Map[String, String] = Map.empty
    // first-add order preserved — the adopted commit lists files in
    // the order the source table grew, like DeltaLite's own replay
    val live = new java.util.LinkedHashMap[String, AddFile]()

    def checkProtocol(minReader: Int, readerFeatures: Seq[String]): Unit = {
      val unsupported = readerFeatures.filterNot(_ == "timestampNtz")
      require(minReader <= 2 || unsupported.isEmpty,
        s"$tableDir requires Delta reader features " +
          s"${unsupported.mkString(", ")} (minReaderVersion $minReader) " +
          "— not supported by this adoption path")
    }

    def applyMeta(schemaString: String, parts: Seq[String],
        conf: Map[String, String]): Unit = {
      schemaJson = Some(schemaString)
      partitionCols = parts
      configuration = conf
      val cmMode = conf.getOrElse("delta.columnMapping.mode", "none")
      require(cmMode == "none",
        s"$tableDir uses column mapping mode '$cmMode' — its parquet " +
          "columns carry physical ids this adoption path cannot " +
          "resolve; disable column mapping (or rewrite) before adopting")
    }

    def applyAdd(path: JsonNode, pv: Map[String, String],
        size: Option[Long], dvPresent: Boolean,
        stats: Option[String]): Unit = {
      require(!dvPresent,
        s"$tableDir carries deletion vectors — adopting would " +
          "resurrect deleted rows; run a Delta OPTIMIZE/rewrite to " +
          "materialize the deletes first")
      val abs = resolvePath(tableDir, path.asText())
      live.put(abs, AddFile(abs, pv, size, stats))
    }

    // ---- base state from the checkpoint parquet, if any
    base.foreach { v =>
      val partNames = names.filter(n => checkpointVersion(n).contains(v))
      // multi-part completeness: each part file carries its total in
      // the name (n.checkpoint.<part>.<of>.parquet) — reading whatever
      // parts happen to exist would silently replay from a partial
      // base state and adopt a live set missing files
      val multiRe = "\\d{20}\\.checkpoint\\.(\\d{10})\\.(\\d{10})\\.parquet".r
      val multi = partNames.collect { case multiRe(p, of) => (p.toInt, of.toInt) }
      if (multi.nonEmpty) {
        val of = multi.head._2
        require(multi.map(_._2).distinct == Seq(of) &&
          multi.map(_._1).sorted == (1 to of).toList,
          s"checkpoint $v of $tableDir is incomplete: have parts " +
            s"${multi.map(_._1).sorted.mkString(",")} of $of — " +
            "interrupted checkpoint write or partial copy; replay " +
            "cannot proceed from a torn base")
        require(multi.size == partNames.size,
          s"checkpoint $v of $tableDir mixes single- and multi-part " +
            "files — torn layout")
      }
      val parts = partNames.map(n => new Path(log, n).toString)
      val cp = spark.read.parquet(parts: _*)
      val cols = cp.schema.fieldNames.toSet
      if (cols.contains("protocol")) {
        cp.select("protocol").collect().foreach { r =>
          val p = r.getStruct(0)
          if (p != null) {
            val fi = p.schema.fieldNames
            val mr = if (fi.contains("minReaderVersion") &&
              !p.isNullAt(p.fieldIndex("minReaderVersion")))
              p.getInt(p.fieldIndex("minReaderVersion")) else 1
            val rf = if (fi.contains("readerFeatures") &&
              !p.isNullAt(p.fieldIndex("readerFeatures")))
              p.getSeq[String](p.fieldIndex("readerFeatures")) else Nil
            checkProtocol(mr, rf)
          }
        }
      }
      require(cols.contains("metaData") && cols.contains("add"),
        s"checkpoint $v of $tableDir lacks metaData/add columns — " +
          "not a Delta checkpoint layout")
      cp.select("metaData").collect().foreach { r =>
        val m = r.getStruct(0)
        if (m != null) {
          val fi = m.schema.fieldNames
          val parts =
            if (fi.contains("partitionColumns") &&
              !m.isNullAt(m.fieldIndex("partitionColumns")))
              m.getSeq[String](m.fieldIndex("partitionColumns")) else Nil
          val conf =
            if (fi.contains("configuration") &&
              !m.isNullAt(m.fieldIndex("configuration")))
              m.getMap[String, String](m.fieldIndex("configuration")).toMap
            else Map.empty[String, String]
          applyMeta(m.getString(m.fieldIndex("schemaString")), parts.toSeq,
            conf)
        }
      }
      val addRows = cp.select("add").filter("add is not null").collect()
      addRows.foreach { r =>
        val a = r.getStruct(0)
        val fi = a.schema.fieldNames
        val pv = if (fi.contains("partitionValues") &&
          !a.isNullAt(a.fieldIndex("partitionValues")))
          a.getMap[String, String](a.fieldIndex("partitionValues")).toMap
        else Map.empty[String, String]
        val size = if (fi.contains("size") && !a.isNullAt(a.fieldIndex("size")))
          Some(a.getLong(a.fieldIndex("size"))) else None
        val dv = fi.contains("deletionVector") &&
          !a.isNullAt(a.fieldIndex("deletionVector"))
        val abs = resolvePath(tableDir, a.getString(a.fieldIndex("path")))
        require(!dv,
          s"$tableDir carries deletion vectors — adopting would " +
            "resurrect deleted rows; run a Delta OPTIMIZE/rewrite to " +
            "materialize the deletes first")
        val st = if (fi.contains("stats") && !a.isNullAt(a.fieldIndex("stats")))
          Some(a.getString(a.fieldIndex("stats"))) else None
        live.put(abs, AddFile(abs, pv, size, st))
      }
    }

    // ---- JSON deltas above the splice point, in version order
    needed.foreach { v =>
      val p = new Path(log, f"$v%020d.json")
      val in = fs.open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      lines.filter(_.trim.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        val proto = node.path("protocol")
        if (!proto.isMissingNode) {
          val rf = Option(proto.get("readerFeatures")).toSeq
            .flatMap(a => (0 until a.size()).map(a.get(_).asText()))
          checkProtocol(proto.path("minReaderVersion").asInt(1), rf)
        }
        val meta = node.path("metaData")
        if (!meta.isMissingNode) {
          val parts = Option(meta.get("partitionColumns")).toSeq
            .flatMap(a => (0 until a.size()).map(a.get(_).asText()))
          applyMeta(meta.path("schemaString").asText(), parts,
            textMap(meta.get("configuration")))
        }
        val add = node.path("add")
        if (!add.isMissingNode)
          applyAdd(add.path("path"), textMap(add.get("partitionValues")),
            Option(add.get("size")).map(_.asLong()),
            add.hasNonNull("deletionVector"),
            Option(add.get("stats")).filter(!_.isNull).map(_.asText()))
        val rem = node.path("remove")
        if (!rem.isMissingNode)
          live.remove(resolvePath(tableDir, rem.path("path").asText()))
      }
    }

    val schemaStr = schemaJson.getOrElse(sys.error(
      s"no metaData action found replaying $tableDir to $target — " +
        "cannot determine the schema"))
    val schema = DataType.fromJson(schemaStr).asInstanceOf[StructType]
    val files = {
      val b = Seq.newBuilder[AddFile]
      val it = live.values().iterator()
      while (it.hasNext) b += it.next()
      b.result()
    }
    Snapshot(target, schema, partitionCols, configuration, files)
  }

  /** Per-column (min, max) ranges adoptable from a Delta add action's
    * stats JSON, in the string encoding DeltaLite's range machinery
    * expects (a Spark string cast of the value). Only types whose
    * Delta JSON rendering is compatible with that encoding are
    * carried: integral/floating/decimal columns (the compare is
    * numeric, so any parseable rendering works), strings (Delta's
    * truncated bounds remain valid BOUNDS under lexical compare —
    * wider is conservative, never wrong) and dates (ISO is the cast
    * form). TIMESTAMPS are skipped — Delta renders them ISO-with-Z
    * while the cast form is session-zone "yyyy-MM-dd HH:mm:ss", and a
    * lexically mis-ordered range would silently mis-prune upserts;
    * restats covers them. Malformed stats adopt nothing (conservative).
    */
  private[graft] def adoptableRanges(statsJson: String,
      schema: StructType): Map[String, (String, String)] = {
    import org.apache.spark.sql.types._
    val node =
      try new ObjectMapper().readTree(statsJson)
      catch { case _: Exception => return Map.empty }
    val mins = node.path("minValues")
    val maxs = node.path("maxValues")
    if (!mins.isObject || !maxs.isObject) return Map.empty
    schema.fields.flatMap { f =>
      val safe = f.dataType match {
        case LongType | IntegerType | ShortType | ByteType |
             DoubleType | FloatType | StringType | DateType => true
        case _: DecimalType => true
        case _ => false // timestamp, boolean, binary, nested: restats
      }
      val mn = mins.get(f.name)
      val mx = maxs.get(f.name)
      if (safe && mn != null && !mn.isNull && mn.isValueNode &&
        mx != null && !mx.isNull && mx.isValueNode)
        Some(f.name -> (mn.asText(), mx.asText()))
      else None
    }.toMap
  }

  /** READ-ONLY DataFrame over a Delta table — including PARTITIONED
    * tables, the case [[DeltaLite.convertFromDelta]] refuses to adopt
    * (partition column bytes live only in the log). Files group by
    * their partition-value tuple; each group scans with the partition
    * columns injected as typed literals (cast from the log's string
    * encoding through the declared schema — the same resolution Delta
    * readers perform), and the groups union. Distinct-tuple count
    * bounds the plan (one scan node per tuple — fine for the
    * date/region-partitioned norm; a degenerate million-tuple layout
    * refuses loudly rather than building a million-legged union).
    * Column order and names match the declared schema, so a migrating
    * user's queries run unchanged.
    */
  def readDelta(spark: SparkSession, tableDir: String,
      versionAsOf: Option[Long] = None,
      maxPartitionTuples: Int = 10000): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val snap = snapshot(spark, tableDir, versionAsOf)
    require(snap.files.nonEmpty,
      s"Delta table $tableDir has no live files at version ${snap.version}")
    if (snap.partitionColumns.isEmpty)
      return spark.read.schema(snap.schema)
        .parquet(snap.files.map(_.path): _*)
        .select(snap.schema.fieldNames.map(col).toIndexedSeq: _*)
    // FAST PATH — hive directory layout (what standard Delta writers
    // produce): when every file's path carries a `/<col>=<value>/`
    // segment agreeing with its logged partitionValues, ONE parquet
    // relation with `basePath` serves the whole table — Spark's own
    // partition discovery injects the typed partition columns and
    // partition FILTERS prune natively, no per-tuple union legs.
    // Any disagreement (exotic escaping, log-only values) falls back
    // to the always-correct union-of-literals path below.
    def hiveSeg(path: String, c: String): Option[String] =
      path.split('/').collectFirst {
        case s if s.startsWith(c + "=") =>
          try java.net.URLDecoder.decode(s.substring(c.length + 1), "UTF-8")
          catch { case _: IllegalArgumentException => s.substring(c.length + 1) }
      }
    val hiveLayout = snap.files.forall { f =>
      snap.partitionColumns.forall { c =>
        val v = Option(f.partitionValues.getOrElse(c, null))
          .getOrElse("__HIVE_DEFAULT_PARTITION__")
        hiveSeg(f.path, c).contains(v)
      }
    }
    if (hiveLayout)
      return spark.read.option("basePath", tableDir).schema(snap.schema)
        .parquet(snap.files.map(_.path): _*)
        .select(snap.schema.fieldNames.map(col).toIndexedSeq: _*)
    val dataSchema = StructType(snap.schema.fields.filterNot(f =>
      snap.partitionColumns.contains(f.name)))
    val byTuple = snap.files.groupBy(f =>
      snap.partitionColumns.map(c => f.partitionValues.getOrElse(c, null)))
    require(byTuple.size <= maxPartitionTuples,
      s"$tableDir has ${byTuple.size} distinct partition tuples — " +
        s"above the $maxPartitionTuples-scan-legs bound; raise " +
        "maxPartitionTuples or rewrite through a partition-declared table")
    val parts = byTuple.toSeq.sortBy(_._1.map(String.valueOf).mkString(" "))
    val legs = parts.map { case (tuple, fs) =>
      val base = spark.read.schema(dataSchema).parquet(fs.map(_.path): _*)
      // inject each partition column as a literal cast to its declared
      // type (Delta encodes values as strings; null = the null/default
      // partition — Delta's __HIVE_DEFAULT_PARTITION__ arrives as null
      // in partitionValues)
      snap.partitionColumns.zip(tuple).foldLeft(base) {
        case (df, (c, v)) =>
          val f = snap.schema(c)
          df.withColumn(c,
            (if (v == null) lit(null) else lit(v)).cast(f.dataType))
      }
    }
    legs.reduce(_ unionByName _)
      .select(snap.schema.fieldNames.map(col).toIndexedSeq: _*)
  }
}
