package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

import java.nio.file.Files
import scala.collection.mutable

/** Model-based property test harness: a seeded random walk of table operations
  * (append / upsert / merge-on-read delete / compact /
  * materializeDeletes / restore) runs against BOTH the real DeltaLite
  * and an in-memory reference model (a key→value map with per-version
  * history). After every operation the table's read() must equal the
  * model exactly, and a random time-travel read must equal the model's
  * history at that version. This is the test shape that catches
  * interaction bugs no single-feature spec does — e.g. a delete's DV
  * surviving a restore it shouldn't, or a compaction resurrecting
  * merge-on-read-deleted rows.
  */
trait DeltaLiteModelWalks extends SparkSpec {

  protected def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  protected def runWalk(seed: Int, steps: Int, nOps: Int = 10,
      ckptFormat: String = "parquet", sidecarAt: Int = 10000,
      mustFire: Set[String] = Set.empty): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val t = new DeltaLite(spark, tmp(s"graft-model-$seed"), Some("k"),
      checkpointFormat = ckptFormat) {
      override protected def commitSidecarThreshold: Int = sidecarAt
    }
    var model = Map.empty[Long, String]
    // model state AFTER each committed version
    val history = mutable.Map.empty[Int, Map[Long, String]]
    var nextKey = 0L

    def freshKeys(n: Int): Seq[Long] = {
      val ks = (nextKey until nextKey + n)
      nextKey += n
      ks
    }
    // current logical name of the value column (flipped by the rename
    // op); reads are positional, so the model never needs to know
    var valCol = "v"
    // current logical name of the KEY column (flipped by the alias-
    // swap op, which exchanges the key and value column names — the
    // adversarial rename sequence for stats labels: entries recorded
    // under the old key name suddenly name-match the VALUE column)
    var keyName = "k"
    // key column's CURRENT type: walks with the widen op (nOps >= 18)
    // start narrow (int) and may widen to long mid-walk; every batch
    // casts to the current type so appends match the table schema
    var keyType: DataType = if (nOps >= 18) IntegerType else LongType
    // type as of each version, for restore (a pre-widen snapshot
    // brings the narrow type back, like names)
    val typeHistory = mutable.Map.empty[Int, DataType]
    def kdf(rows: Seq[(Long, String)]) =
      rows.toDF(keyName, valCol)
        .select(col(keyName).cast(keyType).as(keyName), col(valCol))
    // column names as of each version, for time-travel schema checks
    val nameHistory = mutable.Map.empty[Int, String]
    val keyNameHistory = mutable.Map.empty[Int, String]
    // versions below this are no longer time-travelable (cleanLog)
    var travelFloor = 0
    // versions below this may have lost files to vacuum — they leave
    // the recorded/travel-checked set permanently (record() must not
    // resurrect them with current state)
    var vacuumFloor = 0
    // intermediate versions where the value column is dropped — the
    // walk's 2-column invariant doesn't hold there, so time travel and
    // restore skip them (their correctness is pinned by ColumnMappingSpec)
    val skipTravel = mutable.Set.empty[Int]
    def record(): Unit =
      // every version that exists and isn't recorded yet gets the
      // CURRENT model state (multi-commit ops like materializeDeletes
      // publish rewrite+dvclear with identical visible state)
      t.latestVersion.foreach { latest =>
        (math.max(travelFloor, vacuumFloor) to latest).foreach { v =>
          if (!history.contains(v)) {
            history(v) = model; nameHistory(v) = valCol
            keyNameHistory(v) = keyName
            typeHistory(v) = keyType
          }
        }
      }
    def check(step: Int, op: String): Unit = {
      if (t.latestVersion.isEmpty) return // nothing committed yet
      val got = t.read().collect()
        .map(r => r.get(0).asInstanceOf[Number].longValue -> r.getString(1))
        .toMap
      assert(got == model,
        s"seed=$seed step=$step after $op: table/model diverged\n" +
          s"  extra: ${(got.keySet -- model.keySet).toSeq.sorted.take(10)}\n" +
          s"  missing: ${(model.keySet -- got.keySet).toSeq.sorted.take(10)}\n" +
          s"  changed: ${model.keySet.intersect(got.keySet)
            .filter(k => got(k) != model(k)).toSeq.sorted.take(10)}")
      // random time travel against recorded history
      val travelable = history.keys.filterNot(skipTravel).toSeq
      if (travelable.nonEmpty) {
        val v = travelable(rnd.nextInt(travelable.size))
        val tt = t.readAsOf(v)
        val at = tt.collect()
          .map(r => r.get(0).asInstanceOf[Number].longValue -> r.getString(1))
          .toMap
        assert(at == history(v),
          s"seed=$seed step=$step after $op: time travel to v$v diverged")
        // the snapshot must carry ITS OWN column name, not the current
        assert(tt.schema.fieldNames(1) == nameHistory(v),
          s"seed=$seed step=$step after $op: v$v column name " +
            s"${tt.schema.fieldNames(1)} != recorded ${nameHistory(v)}")
        assert(tt.schema.fieldNames(0) == keyNameHistory(v),
          s"seed=$seed step=$step after $op: v$v key column name " +
            s"${tt.schema.fieldNames(0)} != recorded ${keyNameHistory(v)}")
      }
    }

    val fired = mutable.Set.empty[String]
    (0 until steps).foreach { step =>
      val op = rnd.nextInt(nOps) match {
        case 0 | 1 | 2 =>
          val ks = freshKeys(rnd.nextInt(20) + 5)
          t.append(kdf(ks.map(k => (k, s"a$step-$k"))))
          model = model ++ ks.map(k => k -> s"a$step-$k")
          "append"
        case 3 | 4 =>
          // upsert: update a random slice of existing keys + some new
          val existing = rnd.shuffle(model.keys.toSeq)
            .take(rnd.nextInt(model.size + 1) / 3)
          val ks = existing ++ freshKeys(rnd.nextInt(5))
          if (ks.nonEmpty) {
            t.upsert(kdf(ks.map(k => (k, s"u$step-$k"))), keyName)
            model = model ++ ks.map(k => k -> s"u$step-$k")
          }
          "upsert"
        case 5 | 6 if t.latestVersion.nonEmpty =>
          // merge-on-read delete of a random residue class
          val m = rnd.nextInt(5) + 2
          val r = rnd.nextInt(m)
          t.deleteWhere(col(keyName) % m === r)
          model = model.filter { case (k, _) => k % m != r }
          s"deleteWhere(k%$m==$r)"
        case 5 | 6 => "noop"
        case 7 =>
          t.compact(targetBytes = 1 << 20, minFiles = 2)
          "compact"
        case 8 =>
          t.materializeDeletes()
          "materializeDeletes"
        case 9 =>
          // restore to a random recorded version (skipping dropped-
          // column intermediates, where the 2-column invariant breaks)
          val restorable = history.keys.filterNot(skipTravel).toSeq
          if (restorable.nonEmpty) {
            val v = restorable(rnd.nextInt(restorable.size))
            t.restore(v)
            model = history(v)
            valCol = nameHistory(v) // restore brings back the old name too
            keyName = keyNameHistory.getOrElse(v, keyName)
            keyType = typeHistory.getOrElse(v, keyType) // …and the old type
            s"restore($v)"
          } else "noop"
        case 10 if t.latestVersion.nonEmpty =>
          // clause merge: tombstone values delete, others upsert; the
          // tombstone never inserts (insert condition filters it)
          val existing = rnd.shuffle(model.keys.toSeq)
            .take(rnd.nextInt(model.size + 1) / 4)
          val ks = existing ++ freshKeys(rnd.nextInt(4))
          if (ks.nonEmpty) {
            val rows = ks.map(k =>
              (k, if (rnd.nextBoolean()) s"m$step-$k" else s"DEL-$k"))
            t.merge(kdf(rows), keyName,
              deleteWhen = Some(col(s"s.$valCol").startsWith("DEL")),
              insertWhen = Some(!col(s"s.$valCol").startsWith("DEL")))
            rows.foreach { case (k, v) =>
              model = if (v.startsWith("DEL")) model - k else model + (k -> v)
            }
          }
          "merge"
        case 10 => "noop"
        case 11 if t.latestVersion.nonEmpty =>
          // metadata-only re-key of the skipping index: flips the stats
          // column away from (and back to) the upsert key — visible
          // state must never move, and later upserts stay correct
          // whether or not the stats match their key
          t.restats(if (rnd.nextBoolean()) valCol else keyName)
          "restats"
        case 11 => "noop"
        case 12 if t.latestVersion.nonEmpty =>
          // metadata-only RENAME of the value column: zero data moves,
          // every later op speaks the new name, time travel keeps the
          // old one (checked via nameHistory)
          val to = Seq("v", "w", "u")
            .filter(n => n != valCol && n != keyName).head
          t.renameColumn(valCol, to)
          valCol = to
          s"rename($to)"
        case 12 => "noop"
        case 13 if t.latestVersion.nonEmpty =>
          // force a checkpoint: every later read replays through the
          // spliced synthetic base — visible state must never move
          t.checkpointNow()
          "checkpointNow"
        case 13 => "noop"
        case 14 if t.latestVersion.nonEmpty =>
          // checkpoint + log retention: versions below the checkpoint
          // stop being time-travelable and must FAIL explicitly
          val v = t.checkpointNow().get
          t.cleanLog()
          travelFloor = v
          val dropped = history.keys.filter(_ < v).toSeq
          dropped.foreach { dv => history.remove(dv); nameHistory.remove(dv) }
          if (dropped.nonEmpty)
            intercept[IllegalStateException](t.readAsOf(dropped.min).collect())
          s"checkpoint+cleanLog($v)"
        case 14 => "noop"
        case 15 if t.latestVersion.nonEmpty && model.nonEmpty =>
          // metadata-only DROP of the value column, then evolve it
          // back under the SAME logical name: the re-added column gets
          // a fresh physical id, so every pre-drop row reads it as
          // null — old bytes never resurface
          t.dropColumn(valCol)
          skipTravel += t.latestVersion.get
          val ks = freshKeys(rnd.nextInt(4) + 2)
          t.appendEvolve(kdf(ks.map(k => (k, s"d$step-$k"))))
          model = model.map { case (k, _) => k -> (null: String) } ++
            ks.map(k => k -> s"d$step-$k")
          s"drop+readd($valCol)"
        case 15 => "noop"
        case 16 if t.latestVersion.nonEmpty && model.nonEmpty =>
          // UPDATE … WHERE on a random residue class: file-granular
          // copy-on-write must compose with everything else the walk
          // does — DVs (updated files drop their deleted rows), a
          // later restore (pre-update snapshots travel), renames (the
          // assignment speaks the CURRENT name). A null value stays
          // null (concat propagates it), matching SQL UPDATE on a
          // dropped-and-readded column's pre-drop rows.
          val m = rnd.nextInt(5) + 2
          val r = rnd.nextInt(m)
          t.updateWhere(col(keyName) % m === r,
            Seq(valCol -> concat(lit(s"U$step-"), col(valCol))))
          model = model.map { case (k, v) =>
            k -> (if (k % m == r && v != null) s"U$step-$v" else v)
          }
          s"updateWhere(k%$m==$r)"
        case 16 => "noop"
        case 17 if t.latestVersion.nonEmpty && keyType == IntegerType =>
          // metadata-only TYPE WIDENING of the key column: zero data
          // moves, every later batch speaks long, earlier int files
          // widen in the reader, compact rewrites them long, restore /
          // time travel below the widen serve the narrow type again
          t.widenColumn(keyName, LongType)
          keyType = LongType
          "widen(k→long)"
        case 17 => "noop"
        case 18 if t.latestVersion.nonEmpty =>
          // toggle the change-data-feed property: with it ON, every
          // upsert/merge/updateWhere additionally writes CDC sidecars
          // (exercising the sidecar writer against renames, drops,
          // widens and colmapped physical names) — VISIBLE state must
          // never move either way
          if (t.tableProperties.get("enableChangeDataFeed").contains("true"))
            t.unsetTableProperties(Seq("enableChangeDataFeed"))
          else t.setTableProperties(Map("enableChangeDataFeed" -> "true"))
          "toggleCdf"
        case 18 => "noop"
        case 19 if t.latestVersion.nonEmpty =>
          // physical file retention: versions below the retain window
          // may lose their files and leave the travelable set —
          // everything at/above the cutoff must keep reading
          // byte-identically (vacuum must never touch a retained
          // version's files, across DVs, compactions, drops, widens)
          val retain = rnd.nextInt(3) + 1
          val latest = t.latestVersion.get
          t.vacuum(retainVersions = retain)
          val cutoff = math.max(travelFloor, latest - retain + 1)
          vacuumFloor = math.max(vacuumFloor, cutoff)
          history.keys.filter(_ < cutoff).toSeq.foreach { dv =>
            history.remove(dv); nameHistory.remove(dv)
          }
          s"vacuum($retain)"
        case 19 => "noop"
        case 20 if t.latestVersion.nonEmpty =>
          // fsck on an UNDAMAGED table is a strict no-op: nothing
          // reported, no commit published — whatever mix of DVs,
          // compactions, checkpoints and vacuums came before, every
          // live ref must point at a real file (a false positive here
          // means some op left a dangling ref)
          val before = t.latestVersion
          assert(t.fsck().isEmpty,
            s"seed=$seed step=$step: fsck found dangling refs")
          assert(t.latestVersion == before)
          "fsck-noop"
        case 20 => "noop"
        case 21 if t.latestVersion.nonEmpty =>
          // ALIAS SWAP of the key and value column NAMES (three
          // metadata-only renames): entries recorded under the old key
          // name now name-match the VALUE column, and vice versa — the
          // exact sequence that could re-validate stale stats labels.
          // Physical-id stamps must keep every later upsert/delete/
          // update pruning on the RIGHT bytes; visible state never
          // moves. The two intermediate rename versions carry a temp
          // name, so they leave the travel-checked set (like drop).
          t.renameColumn(keyName, "swp")
          skipTravel += t.latestVersion.get
          t.renameColumn(valCol, keyName)
          skipTravel += t.latestVersion.get
          t.renameColumn("swp", valCol)
          val oldKey = keyName; keyName = valCol; valCol = oldKey
          s"aliasSwap($valCol<->$keyName)"
        case 21 => "noop"
        case 22 if model.values.exists(_ != null) =>
          // DELETE by EQUALITY on the value column: post-alias-swap the
          // value column may wear the old key's NAME while the stats
          // labels describe the old key's BYTES — a name-matched prune
          // would compare a string value against numeric ranges and
          // wrongly skip the file, leaving the row undeleted. The model
          // diff catches exactly that.
          val nonNull = model.values.filter(_ != null).toSeq
          val victim = nonNull(rnd.nextInt(nonNull.size))
          t.deleteWhere(col(valCol) === victim)
          model = model.filter { case (_, v) => v != victim }
          s"deleteByValue($victim)"
        case 22 => "noop"
        case 23 if t.latestVersion.nonEmpty && t.liveFiles().nonEmpty =>
          // incremental clustered OPTIMIZE on the CURRENT key name: a
          // layout-only rewrite + a props commit — visible state and
          // every recorded snapshot must never move, across DVs,
          // renames, alias swaps, restores, checkpoints and vacuums;
          // repeated draws exercise the fresh/overlap partition (and
          // the cube-list invalidation after an alias swap moves the
          // clustering NAME onto different bytes)
          t.optimizeClustered(Seq(keyName), targetBytes = 8192)
          "optimizeClustered"
        case 23 => "noop"
      }
      record()
      check(step, op)
      fired += op.takeWhile(_ != '(')
    }
    // seeds added FOR a specific op assert it actually fired — the
    // walks are seed-deterministic, so this can never flake
    mustFire.foreach(m => assert(fired(m),
      s"seed=$seed never drew op '$m' — pick another seed"))
  }

}
