package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Batch IVF (inverted-file) index build + probe as pure DataFrame ops
  * (SURVEY.md §2 B5/B6; mandated "batch index build via DataFrame ops").
  *
  * Build = Lloyd's k-means, each iteration two shuffles:
  *   assign: corpus ⋈ broadcast(centroids) → argmin distance, expressed as
  *           `min(struct(dist, cluster))` — an ordinary partial-aggregatable
  *           hash aggregate, NO window (a window over the whole corpus
  *           would shuffle 100 TB by a handful of keys);
  *   update: posexplode the assigned vectors → per-(cluster, dim) mean →
  *           re-assemble per-cluster arrays. Both phases are map-side
  *           combinable, so the shuffle carries one partial sum per
  *           (cluster, dim) per task, never vectors.
  *
  * Probe = nearest `nprobe` centroids for the query (tiny, broadcast), then
  * an exact re-rank restricted to those clusters. At scale the assignment
  * table is written partitioned/bucketed BY cluster_id so the semi-join
  * becomes partition pruning — only nprobe/k of the corpus is read.
  *
  * Determinism: centroid init is the k smallest-id vectors (fixed, seedless);
  * float means vary in last-ulp across partitionings, so IVF results are
  * validated by invariant/recall tests, not the byte-exact oracle
  * (SURVEY.md §7.3 "Iterative algorithms").
  */
object IvfIndex {

  /** (assignments: idCol, cluster_id; centroids: cluster_id, centroid) */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1, "k-means needs at least one assign/update iteration")
    // each Lloyd iteration reads the vectors twice (assign + update);
    // persist once instead of re-scanning the source 2·iters times.
    // At cluster scale this is the standard iterate-over-cached-working-set
    // pattern (MEMORY_AND_DISK spills gracefully if the corpus outgrows
    // executor memory). Released before returning — the results are
    // materialized first so the lineage never re-reads the cache.
    val vecs = corpus.select(col(idCol).as("_id"),
      transform(col(vecCol), _.cast("double")).as("_v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // deterministic init: the k smallest-id vectors, ids assigned
    // DRIVER-SIDE over the k collected rows — a row_number() over a
    // partition-less window here would (a) warn "No Partition Defined"
    // and (b) funnel the frame through one task; k rows are driver work.
    // The collect doubles as the first materialization of the cached
    // working set.
    val spark = corpus.sparkSession
    val initRows = vecs.orderBy("_id").limit(k).collect()
    val centSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cluster_id",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("centroid",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = false)))
    var centroids = spark.createDataFrame(
      java.util.Arrays.asList(initRows.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(i, r.getSeq[Double](1)): org.apache.spark.sql.Row
      }: _*), centSchema)

    var assignments: DataFrame = null
    for (_ <- 0 until iters) {
      assignments = assign(vecs, centroids)
      centroids = update(vecs, assignments, centroids)
    }
    // materialize the (small) results as ordinary persisted datasets,
    // then release the big working set. persist (not localCheckpoint):
    // the caller can free the returned frames with unpersist(), and the
    // lineage stays recomputable if an executor is lost.
    val outAssign = assignments.select(col("_id").as(idCol), col("cluster_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outCents = centroids
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE fused materialization job: the union plan contains both
    // InMemoryRelations, so computing it populates both caches without
    // paying two sequential job latencies (round-1 bench-tail fix)
    outAssign.select(lit(1).as("_one"))
      .union(outCents.select(lit(1).as("_one"))).count()
    vecs.unpersist()
    (outAssign, outCents)
  }

  /** Nearest-centroid assignment via min(struct(dist, cluster)). */
  private def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .groupBy(col("_id"))
      .agg(min(struct(
        l2Dist(col("_v"), col("centroid")).as("dist"),
        col("cluster_id"))).as("best"))
      .select(col("_id"), col("best.cluster_id").as("cluster_id"))

  /** Recompute centroids as per-dimension means. A cluster that received
    * zero assignments produces no mean row; it keeps its PREVIOUS centroid
    * (left join + coalesce) so the centroid set never silently shrinks
    * below k — probes assume `nprobe <= k` surviving clusters. */
  private def update(vecs: DataFrame, assignments: DataFrame,
                     prev: DataFrame): DataFrame = {
    val means = vecs.join(assignments, "_id")
      .select(col("cluster_id"), posexplode(col("_v")).as(Seq("dim", "x")))
      .groupBy(col("cluster_id"), col("dim"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .groupBy(col("cluster_id"))
      .agg(array_sort(collect_list(struct(col("dim"), (col("sx") / col("n")).as("m"))))
        .as("dims"))
      .select(col("cluster_id"),
        transform(col("dims"), d => d.getField("m")).as("centroid"))
    prev.select(col("cluster_id"), col("centroid").as("_prev"))
      .join(means.select(col("cluster_id"), col("centroid").as("_new")),
        Seq("cluster_id"), "left")
      .select(col("cluster_id"),
        coalesce(col("_new"), col("_prev")).as("centroid"))
  }

  /** Materialize the indexed corpus as a parquet table PARTITIONED BY
    * cluster_id — the at-scale layout: a probe that touches `nprobe` of
    * `k` clusters reads `nprobe/k` of the data via partition pruning,
    * no index structure beyond the directory layout. */
  def writePartitioned(corpus: DataFrame, idCol: String,
                       assignments: DataFrame, path: String): Unit =
    corpus.join(assignments, idCol)
      .write.partitionBy("cluster_id").mode("overwrite").parquet(path)

  /** Probe against a [[writePartitioned]] layout: the `cluster_id IN (…)`
    * filter prunes partitions at planning time, so only the probed
    * clusters' files are ever opened. */
  def probePartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
                       idCol: String, vecCol: String, centroids: DataFrame,
                       q: Seq[Double], k: Int, nprobe: Int,
                       score: (Column, Column) => Column = dot): DataFrame = {
    val qlit = vecLit(q)
    // centroids are tiny (k rows) — resolving the probe set locally is a
    // driver-side O(k·d) computation, not a distributed job worth running
    val near = centroids
      .orderBy(l2Dist(col("centroid"), qlit).asc, col("cluster_id").asc)
      .limit(nprobe).select("cluster_id")
      .collect().map(_.getInt(0))
    spark.read.parquet(path)
      .filter(col("cluster_id").isin(near.toIndexedSeq: _*))
      .withColumn("sim", round(score(col(vecCol), qlit), 4))
      .orderBy(desc("sim"), asc(idCol))
      .limit(k)
  }

  /** Index-accelerated top-k: probe `nprobe` nearest clusters, exact
    * re-rank inside them (B6). `assignments`/`centroids` come from
    * [[build]] (or are read back from a bucketed table at scale). */
  def probe(corpus: DataFrame, idCol: String, vecCol: String,
            assignments: DataFrame, centroids: DataFrame,
            q: Seq[Double], k: Int, nprobe: Int,
            score: (Column, Column) => Column = dot): DataFrame = {
    val qlit = vecLit(q)
    val nearClusters = centroids
      .orderBy(l2Dist(col("centroid"), qlit).asc, col("cluster_id").asc)
      .limit(nprobe)
      .select("cluster_id")
    val candidateIds = assignments
      .join(broadcast(nearClusters), "cluster_id")
      .select(col(idCol))
    corpus.join(candidateIds, idCol)
      .withColumn("sim", round(score(col(vecCol), qlit), 4))
      .orderBy(desc("sim"), asc(idCol))
      .limit(k)
  }
}
