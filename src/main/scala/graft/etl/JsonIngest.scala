package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-JSON ingestion: the reference's transform step, generalized.
  *
  * The reference flattens one hard-coded shape (multiline API response →
  * explode `items` → dot-path select with aliases → timestamp cast); see
  * /root/reference/ETL_pipeline_countries.py:75-113. Here the flatten is
  * recursive over ANY schema: structs unnest to `parent_child` columns,
  * arrays of structs explode to rows. Everything stays declarative —
  * `explode`/`col("a.b")` projections — so Catalyst prunes unread
  * branches of the JSON schema from the scan.
  */
object JsonIngest {

  /** Multiline (pretty-printed) JSON file(s) → DataFrame. */
  def readMultiline(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiline", "true").json(path)

  /** Tag every row with a constant provenance column (reference: the
    * search keyword).
    */
  def tag(df: DataFrame, name: String, value: String): DataFrame =
    df.withColumn(name, lit(value).cast(StringType))

  /** Recursively flatten: structs → `prefix<sep>field` columns; arrays of
    * structs → `explode_outer` (one row per element, null-safe). Arrays
    * of scalars are left as-is. NOTE: multiple sibling struct-arrays
    * explode sequentially → cross product, as in any SQL UNNEST chain.
    *
    * A generated name that collides with an existing column (JSON like
    * `{"a": {"b": 1}, "a_b": 2}`) gets `<sep>` suffixes appended until
    * unique — duplicate column names would make the frame unusable by
    * name (AMBIGUOUS_REFERENCE) and a later pass would drop both.
    */
  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    var cur = df
    var done = false
    while (!done) {
      val fields = cur.schema.fields
      val structCol = fields.collectFirst {
        case f if f.dataType.isInstanceOf[StructType] => f
      }
      val arrayCol = fields.collectFirst {
        case f @ StructField(_, ArrayType(_: StructType, _), _, _) => f
      }
      (structCol, arrayCol) match {
        case (Some(f), _) =>
          val st = f.dataType.asInstanceOf[StructType]
          val others = fields.filterNot(_.name == f.name)
            .map(o => col(s"`${o.name}`"))
          val taken = scala.collection.mutable.Set(
            fields.filterNot(_.name == f.name).map(_.name): _*)
          val unnested = st.fields.map { c =>
            var name = s"${f.name}$sep${c.name}"
            while (taken(name)) name += sep
            taken += name
            col(s"`${f.name}`.`${c.name}`").as(name)
          }
          cur = cur.select(others ++ unnested: _*)
        case (None, Some(f)) =>
          cur = cur.withColumn(f.name, explode_outer(col(s"`${f.name}`")))
        case _ => done = true
      }
    }
    cur
  }

  /** Cast the named columns to timestamp (reference: `publishedAt`). */
  def castTimestamps(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
}
