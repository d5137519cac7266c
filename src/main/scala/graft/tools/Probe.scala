package graft.tools

import graft.{GraftSession, Tables}
import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only stage profiler for the LSH dedup path. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    val sigs = time("signatures")(
      Dedup.minhashSignatures(docs, "text", "doc_id")
        .persist(StorageLevel.MEMORY_AND_DISK))
    println("sig rows: " + time("sig count")(sigs.count()))
    val bandKeys = (0 until 16).map { b =>
      xxhash64(concat_ws(",", (0 until 4).map(r => col("signature")(b * 4 + r)): _*))
    }
    val banded = time("banded")(
      sigs.select(col("doc_id").as("id"), col("signature"),
        posexplode(array(bandKeys: _*)).as(Seq("band", "bandkey")))
        .persist(StorageLevel.MEMORY_AND_DISK))
    println("banded rows: " + banded.count())
    val a = banded.select(col("band"), col("bandkey"), col("id").as("id_a"), col("signature").as("sig_a"))
    val b = banded.select(col("band"), col("bandkey"), col("id").as("id_b"), col("signature").as("sig_b"))
    val joined = a.join(b, Seq("band", "bandkey")).filter(col("id_a") < col("id_b"))
    println("joined rows: " + time("join count")(joined.count()))
    println("joined rows2: " + time("join count 2")(joined.count()))
    println(joined.queryExecution.executedPlan.toString().take(4000))
    val cand = joined.select("id_a", "id_b", "sig_a", "sig_b").dropDuplicates("id_a", "id_b")
    println("cand rows: " + time("cand count")(cand.count()))
    val scored = cand.withColumn("est_jaccard",
      aggregate(zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
        .cast("double") / 64)
      .filter(col("est_jaccard") >= 0.5)
    println("pairs: " + time("score count")(scored.count()))
    spark.stop()
  }
}
