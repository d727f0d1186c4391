package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for named declared queries into
  * plans/r19/<name>_<suffix>.txt — the optimization round's
  * before/after plan evidence (the DumpPlans discipline, parameterized
  * by query list so a round can snapshot exactly the rows it touched).
  *
  *   runMain graft.tools.PlanDumpR19 <suffix> <query> [query...]
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.001 — plan shapes are
  * scale-independent), SPARK_GRAFT_PLANS_DIR (default plans/r19). */
object PlanDumpR19 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDumpR19 <suffix> <query>...")
    val suffix = args(0)
    val names = args.drop(1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val outDir = Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r19"))
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // mirror Bench's split policy so the dumped plans are the
      // executed ones (see Bench.scala)
      .config("spark.sql.files.minPartitionNum", "1")
      .config("spark.sql.leafNodeDefaultParallelism", "1")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val out = outDir.resolve(s"${name}_$suffix.txt")
      try {
        val df = graft.Queries.all(name).planFrame(spark, dir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          .replaceAll("@[0-9a-f]{6,10}", "@...")
        Files.writeString(out, formatted)
        println(s"[plandump] wrote $out")
      } catch {
        case t: Throwable =>
          System.err.println(s"[plandump] $name failed: $t")
      }
    }
    spark.stop()
  }
}
