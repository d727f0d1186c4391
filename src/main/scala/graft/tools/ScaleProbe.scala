package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val big = (0 until 50).map(i => emb.select((col("vec_id") + i * 100000).as("vec_id"),
      col("embedding"))).reduce(_ union _).repartition(16).cache()
    println("corpus=" + big.count())
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.operators.Search.topK(big, "embedding", "vec_id", graft.QueryVectors.q1, 10).collect()
      println(f"topk10 run$i: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    }
    val q = emb.filter(col("vec_id") < 8)
    val t0 = System.nanoTime()
    val n = graft.operators.Search.knnJoinAgg(q, "vec_id", "embedding", big, "vec_id", "embedding", 5).count()
    println(s"knnJoinAgg 8q x 100k: ${(System.nanoTime()-t0)/1e9}s rows=$n")
    spark.stop()
  }
}
