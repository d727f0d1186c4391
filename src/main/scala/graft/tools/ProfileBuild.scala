package graft.tools

import org.apache.spark.sql.SparkSession

/** Wall-clock profile of the shared index builds (the bench's `_*_build`
  * infra lines) with per-phase breakdown — run against a fixture dir to
  * see WHERE a build's seconds go before optimizing it. Not part of the
  * declared surface; a measurement tool. */
object ProfileBuild {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-profile-build")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROFILE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    t("warmup_count") { graft.Tables.load(spark, dir, "embeddings").count() }
    // phase-by-phase replica of sharedIvfIndex
    if (sys.env.contains("PROFILE_IVF_PHASES")) {
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val n = emb.count()
      val (k, _) = graft.Queries.ivfSizing(n)
      var built: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = null
      t("ivf_kmeans") {
        built = graft.operators.IvfIndex.build(emb, "vec_id", "embedding", k = k, iters = 3)
      }
      val tmp = java.nio.file.Files.createTempDirectory("graft-prof").toString + "/ivf"
      t("ivf_write_part") {
        graft.operators.IvfIndex.writePartitioned(emb, "vec_id", built._1, tmp)
      }
      t("ivf_calibrate") {
        val centRows = built._2.collect().toSeq
        val centsSeq = centRows.map(r =>
          (r.getInt(0), r.getSeq[Double](1).toIndexedSeq)).toIndexedSeq
        graft.operators.IvfIndex.calibrationTopK(spark, tmp, "vec_id",
          "embedding", centsSeq,
          Seq((1L, graft.QueryVectors.q1), (2L, graft.QueryVectors.q2)), k = 10)
      }
      built._1.unpersist(); built._2.unpersist()
    }
    t("ivf_build") { graft.Queries.sharedIvfIndex(spark, dir) }
    t("pq_build") { graft.Queries.sharedPqIndex(spark, dir) }
    t("sq_build") { graft.Queries.sharedSqIndex(spark, dir) }
    t("ivfpq_build") { graft.Queries.sharedIvfPqIndex(spark, dir) }
    t("minhash_build") { graft.Queries.sharedMinhashVerified(spark, dir).count() }
    t("dedup_edges_build") { graft.Queries.sharedDedupEdges(spark, dir).count() }
    spark.stop()
  }
}
