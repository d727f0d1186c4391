package graft.tools

import org.apache.spark.sql.SparkSession

/** Print ONE declared query's result rows — the companion to
  * [[TimeQuery]] (which times but never shows): the tool for eyeballing
  * a rows-only query's VALUES (e.g. `ivf_recall`'s recall column) while
  * tuning, without a full Verify pass.
  *
  *   runMain graft.tools.ShowQuery <queryName> [sfDir] [maxRows]
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty || !graft.SparkEntry.queries.contains(args(0))) {
      System.err.println(
        "usage: runMain graft.tools.ShowQuery <queryName> [sfDir] [maxRows]\n" +
          "valid query names:\n  " +
          graft.SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val maxRows = if (args.length > 2) args(2).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir).show(maxRows, truncate = false)
    spark.stop()
  }
}
