package graft.tools

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: where does exactDupSpans spend, and does the h-window
  * dup-detection beat a groupBy+semi-join formulation? Alternating
  * reps in one JVM.
  */
object ProbeSpans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val w = 40
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    def hashed = docs.where(length($"text") >= w).select($"doc_id",
      explode(expr(
        s"transform(sequence(0, length(text) - $w), " +
          s"i -> named_struct('s', i, 'h', xxhash64(substring(text, i + 1, $w))))"))
        .as("g"))
      .select($"doc_id", $"g.s".as("s"), $"g.h".as("h"))

    def flWindow = {
      val wh = Window.partitionBy($"h")
      hashed
        .withColumn("dmin", min($"doc_id").over(wh))
        .withColumn("dmax", max($"doc_id").over(wh))
        .where($"dmin" =!= $"dmax")
        .select($"doc_id", $"s", ($"s" + w).as("e"))
    }
    def flJoin = {
      val dup = hashed.groupBy($"h")
        .agg(min($"doc_id").as("dmin"), max($"doc_id").as("dmax"))
        .where($"dmin" =!= $"dmax")
        .select($"h")
      hashed.join(dup.hint("merge"), "h")
        .select($"doc_id", $"s", ($"s" + w).as("e"))
    }
    def tail(fl: DataFrame) = {
      val byDoc = Window.partitionBy($"doc_id").orderBy($"s")
      fl.withColumn("pmax",
          max($"e").over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("ng", when($"s" <= coalesce($"pmax", lit(-1)), 0).otherwise(1))
        .withColumn("grp", sum($"ng").over(byDoc))
        .groupBy($"doc_id", $"grp").agg(min($"s").as("gs"), max($"e").as("ge"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum($"ge" - $"gs").cast("long").as("dup_chars"))
        .orderBy($"doc_id")
    }
    println("[probe] gram rows: " + hashed.count())
    noop(tail(flWindow)); noop(tail(flJoin)) // warm
    (1 to 3).foreach { rep =>
      time(s"rep$rep grams only")(noop(hashed))
      time(s"rep$rep WINDOW full")(noop(tail(flWindow)))
      time(s"rep$rep JOIN full")(noop(tail(flJoin)))
    }
    val a = tail(flWindow).collect().map(_.toSeq).toSet
    val b = tail(flJoin).collect().map(_.toSeq).toSet
    println(s"[probe] identical: ${a == b} (${a.size} rows)")
    spark.stop()
  }
}
