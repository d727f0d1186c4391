package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual declared queries by name — the dev-loop complement to
  * the full `graft.Bench` run (which times everything). Args: query
  * names; env `SPARK_GRAFT_SF_DIR` picks the fixture (default sf0.1),
  * `SPARK_GRAFT_TQ_REPS` the rep count (default 3, min reported).
  * Shared builds warm up first so a row's line prices its steady-state
  * consumption exactly as the bench does. Not part of the declared
  * surface; a measurement tool. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQuery <queryName> [more names...]")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_TQ_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .appName("graft-time-query")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // one unmeasured warm pass (codegen + shared builds), then reps
      fn(spark, dir).count()
      var best = Double.MaxValue
      for (_ <- 0 until reps) {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"TIME $name%-28s $best%8.3f s (min of $reps)")
    }
    spark.stop()
  }
}
