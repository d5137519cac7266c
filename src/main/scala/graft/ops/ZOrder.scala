package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional clustering — the layout
  * trick behind "OPTIMIZE ZORDER BY": interleave the bits of two sort
  * dimensions so that range-partitioning on the ONE interleaved key
  * gives every file a tight min/max bounding box on BOTH dimensions.
  * A linear sort on (a, b) makes files selective on `a` only — a
  * predicate on `b` alone (or a 2-D box) overlaps every file; the
  * Z-layout keeps either predicate's overlap near the selectivity
  * fraction, so parquet row-group stats (and DeltaLite file stats)
  * skip most of a 100 TB table instead of scanning it.
  *
  * The curve math is a plain codegen'd expression tree (shifts/masks,
  * no UDF); the write is one `repartitionByRange` shuffle on the
  * Morton key — the same cost as any global sort.
  */
object ZOrder {

  /** Morton-interleave two non-negative int columns (low `bits` bits
    * each; values are clamped into [0, 2^bits) so out-of-range rows
    * still land in the nearest curve cell rather than folding back to
    * an arbitrary one). Bit i of `a` lands at position 2i, of `b` at
    * 2i+1.
    */
  def interleave(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    interleaveN(Seq(a, b), bits)
  }

  /** N-column Morton interleave: bit i of column j lands at position
    * i·n + j — for n = 2 that is exactly [[interleave]]'s placement
    * (bit-for-bit identical keys, so the 2-column API simply
    * delegates here). Total bits must fit a long: n·bits ≤ 63.
    */
  def interleaveN(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 2, s"need at least 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63, s"$n cols × $bits bits exceeds a long")
    val cap = (1L << bits) - 1
    val clamped = cols.map(c =>
      least(greatest(c.cast("long"), lit(0L)), lit(cap)))
    clamped.zipWithIndex.foldLeft(lit(0L)) { case (acc, (c, j)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        a.bitwiseOR(shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
      }
    }
  }

  /** Write `df` as parquet Z-clustered on (`colA`, `colB`): global
    * range partition on the Morton key into `numFiles` files, rows
    * sorted by the key within each file (tight row-group stats for
    * both dimensions). The helper column never reaches the files.
    */
  def clusterWrite(df: DataFrame, path: String, colA: Column, colB: Column,
      numFiles: Int, bits: Int = 16): Unit = {
    df.withColumn("_zorder", interleave(colA, colB, bits))
      .repartitionByRange(numFiles, col("_zorder"))
      .sortWithinPartitions(col("_zorder"))
      .drop("_zorder")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file (min, max) of a column in a written dataset — the stats a
    * file-skipping reader consults; exposed for layout audits.
    */
  def fileStats(df: DataFrame, c: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
}
