package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query profiling harness: run ONE declared query `reps` times and
  * print per-repetition wall time plus a per-job breakdown (job id,
  * seconds, first-stage name) from a listener — the tool the bench's
  * aggregate numbers can't replace when one row regresses and the
  * question is WHICH job inside it grew.
  *
  *   runMain graft.tools.TimeQuery <queryName> [sfDir] [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty || !graft.SparkEntry.queries.contains(args(0))) {
      System.err.println(
        "usage: runMain graft.tools.TimeQuery <queryName> [sfDir] [reps]\n" +
          "valid query names:\n  " +
          graft.SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobTimes = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobStarts.put(js.jobId, System.nanoTime())
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(js.stageInfos.headOption.map(_.name).getOrElse(""))
        jobTimes.put(js.jobId, (0L, desc.take(100)))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStarts.getOrDefault(je.jobId, System.nanoTime())
        val prev = jobTimes.getOrDefault(je.jobId, (0L, ""))
        jobTimes.put(je.jobId, (System.nanoTime() - t0, prev._2))
      }
    })

    val fn = graft.SparkEntry.queries(name)
    // warm once on the smallest sibling fixture (JIT/codegen), like Bench
    val warmDir = {
      val p = java.nio.file.Paths.get(sfDir)
      Option(p.getParent).map(_.resolve("sf0.001"))
        .filter(java.nio.file.Files.isDirectory(_)).map(_.toString)
        .getOrElse(sfDir)
    }
    // NonFatal only: a fatal JVM error (OOM, linkage) must propagate, not
    // be absorbed into a misleading "warm failed" line
    try fn(spark, warmDir).count()
    catch { case scala.util.control.NonFatal(t) =>
      println(s"[timequery] warm failed: $t") }

    for (r <- 1 to reps) {
      jobTimes.clear(); jobStarts.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[timequery] $name rep $r: $dt%.3f s ($n rows)")
      import scala.jdk.CollectionConverters._
      jobTimes.asScala.toSeq.sortBy(_._1).foreach { case (jid, (ns, desc)) =>
        println(f"[timequery]   job $jid%3d ${ns / 1e9}%7.3f s  $desc")
      }
    }
    spark.stop()
  }
}
