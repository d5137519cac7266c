package graft.tools

import org.apache.spark.sql.SparkSession

import graft.etl.DeltaLite

/** Standalone writer process for the cross-process OCC proof: appends
  * `n` one-row batches to the DeltaLite table at `root`, each tagged
  * with this writer's id, relying ONLY on the commit protocol
  * (CommitStore conditional put + append retry) for safety — no
  * coordination with the sibling process racing the same versions.
  * [[graft.CrossProcessOccSpec]] launches two of these in SEPARATE
  * JVMs and then proves every version has exactly one winner and no
  * append was lost. Exit 0 = all n appends committed.
  *
  * `mode=mixed` additionally attempts a COMPACTION after every 5th
  * append with the documented user retry pattern for
  * snapshot-dependent ops — catch `ConcurrentModificationException`,
  * re-read, retry — proving row-preserving maintenance racing a
  * foreign appender never loses or duplicates rows across PROCESSES.
  */
object OccWriter {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val writerId = args(1)
    val n = args(2).toInt
    val mode = if (args.length > 3) args(3) else "append"
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-occ-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = new DeltaLite(spark, root)
    if (mode == "txn") {
      // exactly-once replay race: BOTH processes offer every batch id
      // under ONE app id — the txn high-water mark plus CME-retry must
      // land each batch exactly once, whichever process wins it (the
      // cross-process form of the streaming sink's epoch protocol)
      var landed = 0
      (0 until n).foreach { i =>
        var done = false
        var attempts = 0
        while (!done && attempts < 30) {
          attempts += 1
          try {
            // txnAppend is a no-op (None) once the mark covers i —
            // including when the SIBLING process landed it
            if (t.txnAppend(Seq((writerId, i)).toDF("writer", "seq"),
                appId = "occ-xp", txnId = i.toLong).isDefined) landed += 1
            done = true
          }
          catch { case _: java.util.ConcurrentModificationException => () }
        }
        if (!done) sys.exit(3) // starved — surface loudly
      }
      println("LANDED=" + landed)
      spark.stop()
      sys.exit(0)
    }
    var compactions = 0
    val committed = (0 until n).map { i =>
      val v = t.append(Seq((writerId, i)).toDF("writer", "seq"))
      if (mode == "mixed" && i % 5 == 4) {
        // snapshot-dependent op racing a foreign appender: the loser
        // must retry from a FRESH snapshot (appends don't commute
        // with a rewrite computed against a stale live set)
        var attempts = 0
        var done = false
        while (!done && attempts < 20) {
          attempts += 1
          try { t.compact(minFiles = 2); done = true; compactions += 1 }
          catch { case _: java.util.ConcurrentModificationException => () }
        }
      }
      v
    }
    // the committed versions prove this writer's appends landed at n
    // DISTINCT versions (append retry re-targets, never double-lands)
    println("COMMITTED=" + committed.mkString(","))
    println("COMPACTIONS=" + compactions)
    spark.stop()
    sys.exit(if (committed.distinct.size == n) 0 else 2)
  }
}
