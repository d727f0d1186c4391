package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary r19 optimization diagnostic (not part of the declared
  * surface): prints the PlanGate leaf-stats the small-plan gates see
  * for the indexed clean-admission chain's intermediate frames, plus
  * cached-partition counts — attribution for the width-32 stages the
  * r19 profile found in incr_clean_admit_indexed. */
object DiagR19 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.files.minPartitionNum", "1")
      .config("spark.sql.leafNodeDefaultParallelism", "1")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, NearDup, SpanDedup}

    def lb(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val v = graft.PlanGate.leafBytes(df)
      val small = v <= BigInt(graft.PlanGate.smallPlanBytes)
      println(f"LEAFBYTES $name%-28s $v%-24s small=$small")
      val leaves = df.queryExecution.optimizedPlan.collectLeaves()
      leaves.foreach(l => println(
        s"   leaf ${l.getClass.getSimpleName} size=${l.stats.sizeInBytes}"))
    }

    val docs = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 2000)
    val corpus = docs.filter(col("doc_id") < 250)
    val idxPath = graft.Queries.sharedGramIndexPath(spark, dir)
    Dedup.withAdmissionScope {
      val cleaned = SpanDedup.crossStripSpansIndexed(
          docs.filter(col("doc_id") >= 250), "doc_id", "text", idxPath, k = 8)
        .filter(col("kept_tokens") >= 1)
        .select(col("_id").as("doc_id"), col("cleaned_text").as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        lb("cleaned (pre-mat)", cleaned)
        val exactKept = Dedup.incrementalExact(cleaned,
          Dedup.tokenFingerprint(col("text")),
          corpus, Dedup.tokenFingerprint(col("text")))
        lb("exactKept", exactKept)
        val rel = corpus.select(col("doc_id"), col("text"))
          .union(cleaned.select(col("doc_id"), col("text")))
        val banded = NearDup.minHashPolyBanded(rel, "doc_id", "text")
        lb("banded", banded)
        val pairs = NearDup.minHashPolyCrossPairs(
          banded.join(exactKept.select(col("doc_id").as("_id")),
            Seq("_id"), "left_semi"),
          banded.filter(col("_id") < 250))
          .select(col("id_new").as("id_a"), col("id_old").as("id_b"))
        lb("pairs (the first gated collect)", pairs)
        val n = cleaned.count()
        println(s"cleaned rows=$n rdd partitions=${cleaned.rdd.getNumPartitions}")
        lb("cleaned (post-mat)", cleaned)
        lb("pairs (post-mat)", pairs)
      } finally cleaned.unpersist()
    }
    spark.stop()
  }
}
