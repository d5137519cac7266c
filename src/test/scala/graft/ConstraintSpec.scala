package graft

import graft.etl.DeltaLite
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Persisted CHECK constraints: ALTER TABLE ADD CONSTRAINT semantics —
  * existing data validated at add time, every later write enforced via
  * observation metrics riding the write's own action (no extra scan),
  * violating batches leave no version behind, constraints survive
  * overwrite and travel with restore/clone.
  */
class ConstraintSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def mkTable(root: String): DeltaLite = {
    import spark.implicits._
    val t = DeltaLite(spark, root, "k")
    t.append((1L to 50L).map(k => (k, k * 10.0)).toDF("k", "amount"))
    t
  }

  test("add + enforce: a violating append leaves no commit and no visible rows") {
    import spark.implicits._
    val t = mkTable(tmp("graft-ck"))
    t.addCheckConstraint("amount_positive", "amount > 0")
    assert(t.checkConstraints == Map("amount_positive" -> "amount > 0"))
    // a good batch passes
    t.append(Seq((51L, 1.5)).toDF("k", "amount"))
    val vBefore = t.latestVersion.get
    val rowsBefore = t.read().count()
    val ex = intercept[IllegalStateException] {
      t.append(Seq((52L, 5.0), (53L, -1.0)).toDF("k", "amount"))
    }
    assert(ex.getMessage.contains("amount_positive"))
    assert(t.latestVersion.get == vBefore, "violating batch must not commit")
    assert(t.read().count() == rowsBefore)
    // the next valid commit takes the vacated version slot cleanly
    t.append(Seq((54L, 2.0)).toDF("k", "amount"))
    assert(t.read().count() == rowsBefore + 1)
  }

  test("adding a constraint existing data violates fails and persists nothing") {
    import spark.implicits._
    val t = mkTable(tmp("graft-ck-exist"))
    t.append(Seq((99L, -5.0)).toDF("k", "amount"))
    intercept[IllegalStateException] {
      t.addCheckConstraint("amount_positive", "amount > 0")
    }
    assert(t.checkConstraints.isEmpty)
  }

  test("merge and upsert enforce; null predicate counts as violation") {
    import spark.implicits._
    val t = mkTable(tmp("graft-ck-merge"))
    t.addCheckConstraint("amount_positive", "amount > 0")
    t.merge(Seq((1L, 11.0), (60L, 6.0)).toDF("k", "amount"), "k")
    assert(t.read().filter(col("k") === 1L).head().getDouble(1) == 11.0)
    intercept[IllegalStateException] {
      t.upsert(Seq((2L, -2.0)).toDF("k", "amount"), "k")
    }
    assert(t.read().filter(col("k") === 2L).head().getDouble(1) == 20.0,
      "failed upsert must not change the row")
    // NULL fails the check (SQL CHECK would pass nulls; the gate is
    // the conservative expectations semantic, documented)
    intercept[IllegalStateException] {
      t.append(Seq((61L, null.asInstanceOf[java.lang.Double]))
        .toDF("k", "amount"))
    }
  }

  test("drop constraint re-opens the gate; constraints survive overwrite") {
    import spark.implicits._
    val t = mkTable(tmp("graft-ck-drop"))
    t.addCheckConstraint("amount_positive", "amount > 0")
    // overwrite with valid data: constraint still enforced after
    t.overwrite(Seq((1L, 1.0)).toDF("k", "amount"))
    assert(t.checkConstraints.nonEmpty, "constraints must survive overwrite")
    intercept[IllegalStateException] {
      t.append(Seq((2L, -1.0)).toDF("k", "amount"))
    }
    t.dropCheckConstraint("amount_positive")
    t.append(Seq((2L, -1.0)).toDF("k", "amount"))
    assert(t.read().count() == 2)
    // a violating OVERWRITE is also gated while active
    val t2 = mkTable(tmp("graft-ck-ow"))
    t2.addCheckConstraint("amount_positive", "amount > 0")
    val v = t2.latestVersion.get
    intercept[IllegalStateException] {
      t2.overwrite(Seq((1L, -1.0)).toDF("k", "amount"))
    }
    assert(t2.latestVersion.get == v)
  }

  test("restore and clone carry the constraint set of the snapshot") {
    import spark.implicits._
    val t = mkTable(tmp("graft-ck-restore"))
    val vClean = t.latestVersion.get
    t.addCheckConstraint("amount_positive", "amount > 0")
    val clone = t.shallowCloneTo(tmp("graft-ck-clone"))
    assert(clone.checkConstraints.contains("amount_positive"))
    intercept[IllegalStateException] {
      clone.append(Seq((999L, -1.0)).toDF("k", "amount"))
    }
    // restore to BEFORE the constraint: the old contract comes back
    t.restore(vClean)
    assert(t.checkConstraints.isEmpty)
    t.append(Seq((999L, -1.0)).toDF("k", "amount"))
    assert(t.read().count() == 51)
  }

  test("renaming a constrained column is blocked until the constraint drops") {
    val t = mkTable(tmp("graft-ck-rename"))
    t.addCheckConstraint("amount_positive", "amount > 0")
    val ex = intercept[IllegalArgumentException] {
      t.renameColumn("amount", "value")
    }
    assert(ex.getMessage.contains("amount_positive"))
    t.dropCheckConstraint("amount_positive")
    t.renameColumn("amount", "value")
    assert(t.schema.get.fieldNames.toSeq == Seq("k", "value"))
  }

  test("sepenc: constraint names/sql with separator bytes and % round-trip") {
    val t = mkTable(tmp("graft-ck-sep"))
    // sql carrying the log's own separator bytes plus literal
    // percent-escape lookalikes must round-trip byte-for-byte
    // (names are identifier-restricted, so only the value side can
    // carry these — escSep guards both anyway)
    val sql = "amount > 0 /* odd: \u001f \u001e %1F %25 \u0000 */"
    t.addCheckConstraint("weird_sql", sql)
    val reopened = DeltaLite(spark, t.root)
    assert(reopened.checkConstraints == Map("weird_sql" -> sql))
  }

  test("sepenc: legacy logs without the marker are not percent-decoded") {
    val root = tmp("graft-ck-legacy")
    val t = mkTable(root)
    // a value that LOOKS like a percent-escape: a legacy writer stored
    // it raw, so a marker-less record must parse it byte-for-byte
    t.addCheckConstraint("pct", "amount > 0 or '' = '100%25ok'")
    val logDir = new java.io.File(root, "_log")
    logDir.listFiles().filter(_.getName.endsWith(".json")).foreach { f =>
      val body = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      // strip the marker AND undo the writer's escaping: a true
      // legacy writer stored the raw bytes
      java.nio.file.Files.write(f.toPath,
        body.replace("\"sepenc\":\"1\",", "")
          .replace("%2525", "%25").getBytes("UTF-8"))
    }
    // drop hadoop's checksum sidecars — we edited behind its back
    logDir.listFiles().filter(_.getName.endsWith(".crc"))
      .foreach(_.delete())
    val reopened = DeltaLite(spark, root)
    assert(reopened.checkConstraints("pct").contains("100%25ok"),
      "legacy %25 must stay literal, not decode to %")
  }

  test("deleteWhere is exempt (DV sidecar commits carry addresses, not rows)") {
    val t = mkTable(tmp("graft-ck-dv"))
    t.addCheckConstraint("amount_positive", "amount > 0")
    t.deleteWhere(col("k") <= 5L)
    assert(t.read().count() == 45)
    // and the DV-folding rewrite (valid rows only) passes the gate
    t.materializeDeletes()
    assert(t.read().count() == 45)
  }
}
