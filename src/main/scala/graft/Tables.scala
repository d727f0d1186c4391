package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the harness fixture tables (TESTDATA.md / FIXTURES.md).
  *
  * All declared queries read through here so every scan is a plain
  * `spark.read.parquet` — Catalyst's vectorized parquet reader, column
  * pruning and filter pushdown apply unmodified. At 100 TB the same code
  * path works: the `dir` simply points at a partitioned table root.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) (FIXTURES.md §3), which
      // Spark 4 rejects by default. Read the raw int64 nanos and convert
      // with integer division (the values carry no sub-microsecond
      // component, so this is lossless and matches DuckDB's own ns→us
      // read of the same file). Plain double division would be WRONG
      // here: ~1.7e18 ns exceeds double's 2^53 integer range.
      //
      // The conf is DELIBERATELY left set for the session rather than
      // save/restored around the read: the parquet scan consults it again
      // at physical-planning/execution time (it is copied into the scan's
      // hadoopConf when the action runs), so restoring it here — before
      // the returned lazy frame is ever executed — would make the read
      // fail at action time. Its only effect is on NANOS-typed columns,
      // which no other fixture table has; a caller who needs strict
      // NANOS rejection for other data can unset it after materializing
      // every events-derived result.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
