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
    // phase-by-phase replica of the incr_embed_index declared row — the
    // heaviest non-lifecycle bench line; shows whether the seconds go to
    // the transformer forward, the SQ stages, or job overheads
    if (sys.env.contains("PROFILE_EMBED_PHASES")) {
      import org.apache.spark.sql.functions._
      val e = new graft.functions.TransformerEmbedder(
        graft.Queries.transformerArtifactPath, dim = 64)
      val docs = graft.Tables.load(spark, dir, "documents")
        .filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"), col("text"))
      var embedded: org.apache.spark.sql.DataFrame = null
      t("embed_slice") {
        embedded = graft.functions.Embedder
          .embedPartitions(docs, "text", "emb", e, batchSize = 32)
          .select(col("doc_id"), col("emb"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        embedded.count()
      }
      val day1 = embedded.filter(col("doc_id") % 40 =!= 0)
      val day2 = embedded.filter(col("doc_id") % 40 === 0)
      var params: graft.operators.SqIndex.SqParams = null
      t("sq_train") {
        params = graft.operators.SqIndex.trainParams(day1, "doc_id", "emb")
      }
      var codes: org.apache.spark.sql.DataFrame = null
      t("sq_encode") {
        codes = graft.operators.SqIndex.encode(day1, "doc_id", "emb", params)
          .unionByName(
            graft.operators.SqIndex.encode(day2, "doc_id", "emb", params))
        codes.count()
      }
      var q: Seq[Double] = null
      t("qtext_head_embed") {
        val qtext = docs.filter(col("doc_id") === 40)
          .select(col("text")).head().getString(0)
        q = e.embed(qtext).map(_.toDouble).toSeq
      }
      t("embedded_recount") { embedded.count() }
      t("embedded_recount2") { embedded.count() }
      t("codes_recount") { codes.count() }
      t("cands_only") {
        codes.select(col("doc_id"),
            round(graft.operators.SqIndex.sqScore(col("codes"), q, params), 4)
              .as("_sq"))
          .orderBy(desc("_sq"), asc("doc_id")).limit(50).collect()
      }
      t("search_rerank") {
        graft.operators.SqIndex.searchRerank(codes, embedded, "doc_id",
          "emb", q, params, k = 10, r = 50).collect()
      }
      t("search_rerank_warm") {
        graft.operators.SqIndex.searchRerank(codes, embedded, "doc_id",
          "emb", q, params, k = 10, r = 50).collect()
      }
      t("codes_materialize") {
        codes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // a max over the codes column defeats column pruning, forcing the
        // cache to materialize the projected array
        codes.select(max(element_at(col("codes"), 1))).head()
      }
      t("search_rerank_codes_cached") {
        graft.operators.SqIndex.searchRerank(codes, embedded, "doc_id",
          "emb", q, params, k = 10, r = 50).collect()
      }
      t("embed_repart") {
        graft.functions.Embedder
          .embedPartitions(docs.repartition(32), "text", "emb", e,
            batchSize = 32)
          .select(col("doc_id"), col("emb")).count()
      }
      codes.unpersist()
      embedded.unpersist()
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
