package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed table layout — the co-located-join strategy for repeated
  * large joins (SURVEY.md §4.2 "shuffle/partitioning"; the brief's
  * "bucketing for co-located joins").
  *
  * Two tables bucketed (and sorted) by their join key with the same
  * bucket count join with NO exchange on either side: each task
  * sort-merges bucket i of A against bucket i of B directly off the
  * scan. At 100 TB this converts every recurring fact⋈fact join from a
  * full-data shuffle into a local merge — the single biggest recurring
  * cost in a pipeline that joins the same keys daily.
  *
  * `bucketBy` requires the table catalog (`saveAsTable`); Spark's
  * in-memory catalog works — no Hive metastore needed.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, tableName: String, key: String,
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(tableName)
}
