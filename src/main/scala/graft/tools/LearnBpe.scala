package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.BpeTokenizer

/** One-shot generator for the checked-in BPE merges table
  * (`src/main/resources/graft/bpe_merges.txt`): corpus word frequencies
  * come from a DataFrame aggregation (the at-scale part), the merge
  * learning loop itself runs driver-side over the (small) word-frequency
  * dictionary — exactly the public BPE training recipe, deterministic
  * (ties broken lexicographically).
  *
  *   runMain graft.tools.LearnBpe <sfDir> <outFile> [numMerges]
  */
object LearnBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = args(1)
    val numMerges = if (args.length > 2) args(2).toInt else 200
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-learn-bpe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val freqs = graft.operators.TextAnalysis
        .wordFreq(graft.Tables.load(spark, sfDir, "documents"), "text")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val merges = BpeTokenizer.learn(freqs, numMerges)
      val w = new java.io.PrintWriter(out, "UTF-8")
      try {
        w.println(s"# BPE merges learned from $sfDir documents " +
          s"(graft.tools.LearnBpe, ${merges.length} merges, deterministic)")
        merges.foreach { case (a, b) => w.println(s"$a $b") }
      } finally w.close()
      println(s"[learn-bpe] wrote ${merges.length} merges to $out")
    } finally spark.stop()
  }
}
