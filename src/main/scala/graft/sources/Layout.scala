package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-layout utilities for the 100 TB operational story: compaction
  * (the small-file problem) and Z-order clustering (multi-column
  * min/max data skipping).
  */
object Layout {

  /** Compact a dataset into ~`targetFileBytes` parquet files. File count
    * derives from Catalyst's size estimate (exact for file sources), so
    * a day's worth of thousand-row micro-files lands as a handful of
    * full-size files — the #1 recurring maintenance job on a large lake.
    * `maxRecordsPerFile` caps stragglers if the estimate is off. */
  def writeCompacted(df: DataFrame, path: String,
                     targetFileBytes: Long = 128L << 20): Unit = {
    val estBytes =
      df.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    val nFiles = math.max(1L,
      (estBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val estRows = df.queryExecution.optimizedPlan.stats.rowCount
      .map(_.toLong)
    val writer = df.repartition(nFiles).write.mode("overwrite")
    estRows.map(r => writer.option("maxRecordsPerFile",
        math.max(1L, 2L * r / nFiles)))
      .getOrElse(writer)
      .parquet(path)
  }

  /** Z-order (Morton) interleave of two non-negative int columns,
    * `bits` bits each → one Long sort key. Rows close in BOTH dimensions
    * get close keys, so sorting by it clusters parquet row-groups for
    * min/max skipping on EITHER column — the standard multi-dimensional
    * layout trick. Pure expressions (column-valued shifts via the SQL
    * functions). */
  def zorder2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    def shr(v: Column, n: Column) = call_function("shiftright", v, n)
    def shl(v: Column, n: Column) = call_function("shiftleft", v, n)
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, i) => acc
        .bitwiseOR(shl(shr(a.cast("long"), i).bitwiseAND(1L), i * 2))
        .bitwiseOR(shl(shr(b.cast("long"), i).bitwiseAND(1L), i * 2 + 1)))
  }

  /** Write sorted by the Z-order key of (c1, c2): range-partition on the
    * key then sort within partitions — each output file covers a compact
    * Z-curve segment, i.e. a tight rectangle in (c1, c2) space. */
  def writeZOrdered(df: DataFrame, path: String,
                    c1: String, c2: String, numFiles: Int,
                    bits: Int = 16): Unit =
    df.withColumn("_z", zorder2(col(c1), col(c2), bits))
      // explicit partition count: with the default, AQE coalesces small
      // range partitions back into one file, undoing the clustering
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
