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
    // SPARK_GRAFT_TQ_JOBS=1 adds a per-query job/stage/task-time profile
    // (the round-12 playbook's "per-rep SparkListener job counts", now a
    // standing tool): jobs = scheduler-floor multiplier, taskTime = real
    // distributed work — a row whose wall time is mostly (jobs × floor)
    // needs fusion, one whose taskTime dominates needs a faster kernel
    val profile = sys.env.get("SPARK_GRAFT_TQ_JOBS").contains("1")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    if (profile) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        }
      })
    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // one unmeasured warm pass (codegen + shared builds), then reps
      fn(spark, dir).count()
      var best = Double.MaxValue
      var bestJobs = 0
      var bestStages = 0
      var bestTaskMs = 0L
      for (_ <- 0 until reps) {
        jobs.set(0); stages.set(0); taskMs.set(0)
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a beat to drain (the
        // public API has no flush — 150 ms is far above its latency)
        if (profile) Thread.sleep(150)
        if (dt < best) {
          best = dt; bestJobs = jobs.get(); bestStages = stages.get()
          bestTaskMs = taskMs.get()
        }
      }
      if (profile)
        println(f"TIME $name%-28s $best%8.3f s (min of $reps)  " +
          f"jobs=$bestJobs%3d stages=$bestStages%3d taskTime=${bestTaskMs / 1000.0}%7.2f s")
      else println(f"TIME $name%-28s $best%8.3f s (min of $reps)")
    }
    spark.stop()
  }
}
