package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parquetFiles(path: String): Int =
    new java.io.File(path).listFiles.count(_.getName.endsWith(".parquet"))

  test("compaction: big target -> one file; small target -> several") {
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val one = Files.createTempDirectory("graft-compact1").toString + "/t"
    Layout.writeCompacted(li, one, targetFileBytes = 1L << 30)
    assert(parquetFiles(one) === 1)

    val many = Files.createTempDirectory("graft-compact2").toString + "/t"
    Layout.writeCompacted(li, many, targetFileBytes = 64L << 10)
    assert(parquetFiles(many) > 1)
    // round-trips losslessly
    assert(spark.read.parquet(many).count() === li.count())
  }

  test("zorder2 matches a reference Morton interleave") {
    def morton(a: Int, b: Int, bits: Int): Long = {
      var out = 0L
      for (i <- 0 until bits) {
        out |= ((a.toLong >> i) & 1L) << (2 * i)
        out |= ((b.toLong >> i) & 1L) << (2 * i + 1)
      }
      out
    }
    val samples = Seq((0, 0), (1, 0), (0, 1), (3, 5), (255, 1), (12345, 54321))
    val df = samples.toDF("a", "b")
    val got = df.select($"a", $"b", Layout.zorder2($"a", $"b", 16).as("z"))
      .as[(Int, Int, Long)].collect.toSeq
    got.foreach { case (a, b, z) => assert(z === morton(a, b, 16), s"($a,$b)") }
  }

  test("z-ordered layout clusters both dimensions (adjacent rows are close in a AND b)") {
    val n = 1024
    val df = spark.range(n.toLong)
      .select((col("id") % 32).cast("int").as("x"),
        (col("id") / 32).cast("int").as("y"))
    val path = Files.createTempDirectory("graft-z").toString + "/t"
    Layout.writeZOrdered(df, path, "x", "y", numFiles = 16, bits = 8)
    val back = spark.read.parquet(path)
    assert(back.count() === n.toLong)
    // each file's bounding box must be far smaller than the full domain —
    // that's exactly what row-group min/max skipping exploits
    val spans = back.withColumn("_f", input_file_name())
      .groupBy("_f")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .as[(String, Int, Int)].collect
    assert(spans.length > 1)
    // individual files may straddle a quad boundary (inherent Z-curve
    // discontinuity), but the AVERAGE bounding box must be far smaller
    // than the 31×31 domain — that's the skipping win
    val avgArea = spans.map { case (_, dx, dy) =>
      (dx + 1).toDouble * (dy + 1) }.sum / spans.length
    assert(avgArea < 32.0 * 32 / 3,
      f"avg file box area $avgArea%.0f too close to the 1024 domain")
  }
}
