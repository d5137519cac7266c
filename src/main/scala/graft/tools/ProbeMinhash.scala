package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only A/B for the minhash pair tail: dedup-then-score (old) vs
  * score-then-filter-then-dedup (new), on BOTH hash families,
  * alternating reps in one JVM.
  */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.ops.Dedup.releaseCaches()
    }

    // old xxhash-family tail, inlined (the shipped one is the new tail)
    def oldXx(threshold: Double): DataFrame = {
      val docs = Tables.documents(spark, dir)
      val numPerm = 64; val bands = 16; val rowsPerBand = numPerm / bands
      val sigs = graft.ops.Dedup.tracked(
        graft.ops.Dedup.minhashSignatures(docs, "text", "doc_id")
          .persist(StorageLevel.MEMORY_AND_DISK))
      val bandKeys = (0 until bands).map { b =>
        xxhash64(concat_ws(",",
          (0 until rowsPerBand).map(r => col("signature")(b * rowsPerBand + r)): _*))
      }
      val banded = graft.ops.Dedup.tracked(
        sigs.select(col("doc_id").as("id"), col("signature"),
          posexplode(array(bandKeys: _*)).as(Seq("band", "bandkey")))
          .persist(StorageLevel.MEMORY_AND_DISK))
      val a = banded.select(col("band"), col("bandkey"),
        col("id").as("id_a"), col("signature").as("sig_a"))
      val b = banded.select(col("band"), col("bandkey"),
        col("id").as("id_b"), col("signature").as("sig_b"))
      val cand = a.join(b, Seq("band", "bandkey"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates("id_a", "id_b")
      cand.withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numPerm)
        .filter(col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    }
    def newXx(threshold: Double): DataFrame =
      graft.ops.Dedup.minhashPairs(Tables.documents(spark, dir),
        "text", "doc_id", threshold = threshold)

    // warmups
    noop(oldXx(0.3)); graft.ops.Dedup.releaseCaches()
    noop(newXx(0.3)); graft.ops.Dedup.releaseCaches()
    (1 to 3).foreach { rep =>
      time(s"rep$rep xx t=0.3 OLD(dedup-first)")(noop(oldXx(0.3)))
      time(s"rep$rep xx t=0.3 NEW(score-first)")(noop(newXx(0.3)))
      time(s"rep$rep xx t=0.5 OLD(dedup-first)")(noop(oldXx(0.5)))
      time(s"rep$rep xx t=0.5 NEW(score-first)")(noop(newXx(0.5)))
    }
    // candidate-volume facts for the writeup
    val banded = graft.ops.Dedup.minhashSignatures(
      Tables.documents(spark, dir), "text", "doc_id")
    println("[probe] sig rows: " + banded.count())
    spark.stop()
  }
}
