package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{IncrementalView, VersionedCorpus}

/** Scratch profiler for the incremental-MV refresh: rebuilds the
  * MergeProbe phase-3 scenario and times each constituent job of a
  * 3-dirty-group refresh by hand, so the fusion work targets the jobs
  * that actually cost. Not part of the bench. */
object MvProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft-mvprof")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val mvRoot = s"$tmp/mvcorpus"; val viewRoot = s"$tmp/view"
    val viewCursor = s"$tmp/viewcursor.txt"
    val aggs = Seq(count(lit(1)).as("n"),
      sum(length(col("payload")).cast("long")).as("chars"))
    def gslice(lo: Long, hi: Long, tag: String) =
      spark.range(lo, hi).select(col("id").as("k"),
        (col("id") % 200).as("grp"),
        concat(lit(tag), col("id")).as("payload"))
    VersionedCorpus.append(gslice(0L, 1000000L, "v1 "), mvRoot)
    VersionedCorpus.pinKey(mvRoot, "k")
    IncrementalView.refresh(spark, mvRoot, viewRoot, viewCursor, "k", "grp", aggs)
    VersionedCorpus.upsert(
      gslice(0L, 1000000L, "v2 ").filter(col("grp").isin(7L, 63L, 150L))
        .limit(15000), mvRoot, "k")
    // hand-unrolled refresh, fused shape, per-job timing
    val from = VersionedCorpus.readCursor(viewCursor)
    val (feed, to) = time("changesSince (driver)") {
      VersionedCorpus.changesSince(spark, mvRoot, from)
    }
    val slice = time("feed slice collect") {
      feed.select(col("grp"), col("k"), col("_change_type"))
        .limit(50001).collect()
    }
    println(s"  slice rows: ${slice.length}")
    val direct = slice.iterator.filter(_.getString(2) != "delete")
      .map(_.get(0)).toArray.distinct
    val mutated = slice.iterator.filter(_.getString(2) != "insert")
      .map(_.get(1)).toArray.distinct
    println(s"  direct groups: ${direct.length}, mutated keys: ${mutated.length}")
    val preGroups = time("preimage groups (pruned range read + IN filter)") {
      val nums = mutated.map(_.asInstanceOf[java.lang.Number].longValue())
      VersionedCorpus.lookupKeyRange(spark, mvRoot, nums.min, nums.max, asOf = from)
        .filter(col("k").isin(mutated.toSeq: _*))
        .select(col("grp")).distinct().collect().map(_.get(0))
    }
    val dirtyKeys = (direct ++ preGroups).distinct
    println(s"  dirty groups: ${dirtyKeys.length}")
    val refreshed = VersionedCorpus.snapshot(spark, mvRoot, to)
      .filter(col("grp").isin(dirtyKeys.toSeq: _*))
      .groupBy(col("grp")).agg(aggs.head, aggs.tail: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val alive = time("refreshed compute + alive collect") {
      refreshed.select(col("grp")).collect().map(_.get(0)).toSet
    }
    time("view upsert commit") {
      VersionedCorpus.upsert(refreshed, viewRoot, "grp")
    }
    println(s"  vanished: ${dirtyKeys.count(!alive(_))}")
    refreshed.unpersist()
    time("cursor write") { VersionedCorpus.writeCursor(viewCursor, to) }
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    spark.stop()
  }
}
