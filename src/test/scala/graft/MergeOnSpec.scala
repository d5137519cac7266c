package graft

import graft.etl.DeltaLite
import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Composite-key MERGE (`mergeOn`), WHEN NOT MATCHED BY SOURCE, the
  * size-gated source broadcast, and the deletion-vector broadcast
  * guard — the round-6 scale-posture items.
  */
class MergeOnSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def seed(root: String): DeltaLite = {
    val t = DeltaLite(spark, root, "d")
    t.append(Seq(
      ("2024-01-01", 1L, "a", 10.0),
      ("2024-01-01", 2L, "b", 20.0),
      ("2024-01-02", 1L, "c", 30.0),
      ("2024-01-02", 2L, "d", 40.0)).toDF("d", "id", "v", "amt"))
    t
  }

  test("composite key: rows match only when ALL key columns equal") {
    val t = seed(tmp("graft-mergeon"))
    // (d, id) is the compound business key — same id on another date
    // must NOT be treated as a match
    val src = Seq(
      ("2024-01-01", 1L, "A", 11.0),  // matches → update
      ("2024-01-03", 1L, "e", 50.0)   // same id, new date → insert
    ).toDF("d", "id", "v", "amt")
    t.mergeOn(src, Seq("d", "id"))
    val got = t.read().orderBy("d", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 1L, "A"), ("2024-01-01", 2L, "b"),
      ("2024-01-02", 1L, "c"), ("2024-01-02", 2L, "d"),
      ("2024-01-03", 1L, "e")))
  }

  test("composite key: duplicate (k1,k2) pairs rejected, same k1 alone fine") {
    val t = seed(tmp("graft-mergeon-dup"))
    // two rows share d but differ in id — legal for the compound key
    t.mergeOn(Seq(("2024-01-05", 1L, "x", 1.0), ("2024-01-05", 2L, "y", 2.0))
      .toDF("d", "id", "v", "amt"), Seq("d", "id"))
    assert(t.read().count() == 6)
    val ex = intercept[IllegalArgumentException] {
      t.mergeOn(Seq(("2024-01-06", 1L, "x", 1.0), ("2024-01-06", 1L, "y", 2.0))
        .toDF("d", "id", "v", "amt"), Seq("d", "id"))
    }
    assert(ex.getMessage.contains("duplicate"))
  }

  test("composite-key upsertOn + clause conditions with two-column scope") {
    val t = seed(tmp("graft-upserton"))
    t.upsertOn(Seq(("2024-01-01", 2L, "B2", 21.0), ("2024-01-04", 9L, "n", 1.0))
      .toDF("d", "id", "v", "amt"), Seq("d", "id"))
    assert(t.read().count() == 5)
    assert(t.read().filter(col("d") === "2024-01-01" && col("id") === 2L)
      .head().getString(2) == "B2")
    // conditional delete via the merge clause family over both keys
    t.mergeOn(Seq(("2024-01-04", 9L, "n", 1.0)).toDF("d", "id", "v", "amt"),
      Seq("d", "id"), deleteWhen = Some(lit(true)), insertWhen = Some(lit(false)))
    assert(t.read().filter(col("d") === "2024-01-04").count() == 0)
  }

  test("composite-key pruning: disjoint range on EITHER key skips the file") {
    val root = tmp("graft-mergeon-prune")
    val t = new DeltaLite(spark, root, statsKey = Some("d"),
      statsColumns = Seq("id"))
    // two files with disjoint (d, id) ranges
    t.append(Seq(("2024-01-01", 1L, "a", 1.0), ("2024-01-01", 2L, "b", 2.0))
      .toDF("d", "id", "v", "amt"))
    t.append(Seq(("2024-06-01", 100L, "x", 3.0), ("2024-06-01", 200L, "y", 4.0))
      .toDF("d", "id", "v", "amt"))
    val vBefore = t.latestVersion.get
    // batch overlaps file 1 on d but ONLY file 2 on id → d prunes
    // file 2, id prunes file 1 → nothing to rewrite → pure append
    t.mergeOn(Seq(("2024-01-01", 150L, "z", 9.0)).toDF("d", "id", "v", "amt"),
      Seq("d", "id"))
    assert(t.latestVersion.get == vBefore + 1)
    assert(t.history().head().getString(2) == "append",
      "conjunctive pruning must turn the rewrite into a pure append")
    assert(t.read().count() == 5)
  }

  test("WHEN NOT MATCHED BY SOURCE DELETE: mirror-sync drops drifted rows") {
    val t = seed(tmp("graft-bysource-del"))
    // full-snapshot source: one update, one insert; the two
    // 2024-01-02 rows are absent from the source → deleted
    val snapshot = Seq(
      ("2024-01-01", 1L, "A", 11.0),
      ("2024-01-01", 2L, "b", 20.0),
      ("2024-01-09", 7L, "new", 70.0)).toDF("d", "id", "v", "amt")
    t.mergeOn(snapshot, Seq("d", "id"),
      bySourceDeleteWhen = Some(lit(true)))
    val got = t.read().orderBy("d", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 1L, "A"), ("2024-01-01", 2L, "b"),
      ("2024-01-09", 7L, "new")))
  }

  test("NOT MATCHED BY SOURCE UPDATE: conditional in-place flag, t-scope") {
    val t = seed(tmp("graft-bysource-upd"))
    // unmatched rows older than the snapshot date get amt zeroed; the
    // condition and assignments see only t.*
    t.mergeOn(Seq(("2024-01-02", 1L, "c2", 31.0)).toDF("d", "id", "v", "amt"),
      Seq("d", "id"),
      insertWhen = Some(lit(false)),
      bySourceUpdateWhen = Some(col("t.d") === "2024-01-01"),
      bySourceUpdateSet = Some(Seq("amt" -> lit(0.0))))
    val got = t.read().orderBy("d", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 1L, "a", 0.0), ("2024-01-01", 2L, "b", 0.0),
      ("2024-01-02", 1L, "c2", 31.0), ("2024-01-02", 2L, "d", 40.0)))
  }

  test("empty source + BY SOURCE DELETE empties the table (not a no-op)") {
    val t = seed(tmp("graft-bysource-empty"))
    val empty = Seq.empty[(String, Long, String, Double)]
      .toDF("d", "id", "v", "amt")
    t.mergeOn(empty, Seq("d", "id"), bySourceDeleteWhen = Some(lit(true)))
    assert(t.read().count() == 0)
    // without the clause an empty source stays a version-less no-op
    val v = t.latestVersion.get
    t.mergeOn(empty, Seq("d", "id"))
    assert(t.latestVersion.get == v)
  }

  test("MERGE WITH SCHEMA EVOLUTION: new source columns widen the table") {
    val t = seed(tmp("graft-merge-evolve"))
    // the source carries an extra 'src' column the table lacks
    val src = Seq(("2024-01-01", 1L, "A", 11.0, "api"),
      ("2024-01-08", 5L, "e", 50.0, "batch"))
      .toDF("d", "id", "v", "amt", "src")
    // without the flag the star form writes only table columns (the
    // extra column stays clause-only)
    intercept[Exception] { // star check: table column set must match
      t.mergeOn(src.drop("amt"), Seq("d", "id"))
    }
    t.mergeOn(src, Seq("d", "id"), schemaEvolution = true)
    val got = t.read().orderBy("d", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.getAs[String]("src")))).toSeq
    assert(got == Seq(
      ("2024-01-01", 1L, "A", Some("api")),   // updated row carries it
      ("2024-01-01", 2L, "b", None),          // untouched rows read null
      ("2024-01-02", 1L, "c", None),
      ("2024-01-02", 2L, "d", None),
      ("2024-01-08", 5L, "e", Some("batch")))) // insert carries it
    assert(t.schema.get.fieldNames.toSeq == Seq("d", "id", "v", "amt", "src"))
  }

  test("bySourceUpdateWhen without a SET is rejected") {
    val t = seed(tmp("graft-bysource-req"))
    val ex = intercept[IllegalArgumentException] {
      t.mergeOn(Seq(("2024-01-01", 1L, "a", 1.0)).toDF("d", "id", "v", "amt"),
        Seq("d", "id"), bySourceUpdateWhen = Some(lit(true)))
    }
    assert(ex.getMessage.contains("bySourceUpdateSet"))
  }

  test("merge SET naming an unknown column fails loudly") {
    val t = seed(tmp("graft-set-unknown"))
    val ex = intercept[IllegalArgumentException] {
      t.mergeOn(Seq(("2024-01-01", 1L, "a", 1.0)).toDF("d", "id", "v", "amt"),
        Seq("d", "id"), updateSet = Some(Seq("nope" -> lit(1))))
    }
    assert(ex.getMessage.contains("nope"))
  }

  /** Capture every SQL execution's physical-plan description during
    * `body` (the merge runs several internal jobs; the join plans are
    * among them). */
  private def capturePlans(body: => Unit): Seq[String] = {
    val plans = new scala.collection.mutable.ArrayBuffer[String]()
    val l = new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit =
        event match {
          case e: SparkListenerSQLExecutionStart =>
            plans.synchronized { plans += e.physicalPlanDescription; () }
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      // listener delivery is async — give the bus a moment to drain
      val deadline = System.currentTimeMillis() + 10000
      while (plans.synchronized(plans.isEmpty) &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      Thread.sleep(500)
    } finally spark.sparkContext.removeSparkListener(l)
    plans.synchronized(plans.toSeq)
  }

  test("source above the broadcast threshold merges WITHOUT BroadcastExchange") {
    val t = seed(tmp("graft-merge-nobc"))
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
      // ~2k rows × (string+long+string+double) ≫ 1KB → no hint, and
      // Catalyst's own estimate is above threshold too
      // d values overlap the seeded files' range so pruning keeps
      // them and the rewrite join actually runs
      val big = spark.range(2000).select(
        concat(lit("2024-01-"), lpad((col("id") % 28 + 1).cast("string"), 2, "0")).as("d"),
        (col("id") + 1000L).as("id"),
        lit("bulk").as("v"), lit(1.0).as("amt"))
      val plans = capturePlans { t.mergeOn(big, Seq("d", "id")); () }
      val joinPlans = plans.filter(p => p.contains("Join"))
      assert(joinPlans.nonEmpty,
        s"expected the merge join plans to be captured; got ${plans.size} " +
          s"plans:\n${plans.map(_.linesIterator.take(3).mkString("|")).mkString("\n---\n")}")
      assert(!joinPlans.exists(_.contains("BroadcastExchange")),
        "an over-threshold source must NOT be broadcast:\n" +
          joinPlans.find(_.contains("BroadcastExchange")).getOrElse(""))
      assert(t.read().count() >= 2000, "backfill merge landed")
      // and a small batch DOES take the broadcast fast path
      val small = Seq(("2024-01-01", 1L, "zz", 0.5)).toDF("d", "id", "v", "amt")
      val plans2 = capturePlans { t.mergeOn(small, Seq("d", "id")); () }
      assert(plans2.exists(_.contains("BroadcastExchange")),
        "an under-threshold batch should keep the broadcast fast path")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("DV broadcast guard fails loudly with materializeDeletes guidance") {
    val t = seed(tmp("graft-dv-guard"))
    t.deleteWhere(col("id") === 1L)
    // normal read under the default budget is fine
    assert(t.read().count() == 2)
    try {
      spark.conf.set("spark.graft.dv.broadcastLimit", "1b")
      val ex = intercept[IllegalStateException](t.read().count())
      assert(ex.getMessage.contains("materializeDeletes"))
    } finally spark.conf.unset("spark.graft.dv.broadcastLimit")
    // folding the DVs clears the guard
    t.materializeDeletes()
    try {
      spark.conf.set("spark.graft.dv.broadcastLimit", "1b")
      assert(t.read().count() == 2)
    } finally spark.conf.unset("spark.graft.dv.broadcastLimit")
  }
}
