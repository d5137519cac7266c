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
  */
object OccWriter {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val writerId = args(1)
    val n = args(2).toInt
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
    val committed = (0 until n).map { i =>
      t.append(Seq((writerId, i)).toDF("writer", "seq"))
    }
    // the committed versions prove this writer's appends landed at n
    // DISTINCT versions (append retry re-targets, never double-lands)
    println("COMMITTED=" + committed.mkString(","))
    spark.stop()
    sys.exit(if (committed.distinct.size == n) 0 else 2)
  }
}
