package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling operators beyond plain stratification (the q_sample_split /
  * q_stratified / q_temperature_mix family lives as declared queries;
  * what needs an operator is the shape that wants a bounded aggregator).
  */
object Sampling {

  /** Cluster-balanced (diversity-aware) sampling: take up to `m` rows
    * from EVERY cluster — the embedding-space twin of per-source
    * stratification, used to keep a training subset spread across
    * semantic regions instead of mirroring the corpus's cluster-size
    * skew (the public cluster-based data-selection recipe; pairs with
    * [[IvfIndex]]'s assignment relation).
    *
    * Selection is deterministic: rows rank within their cluster by the
    * engine-wide Knuth multiplicative hash of the id (retry-safe,
    * partition-independent, engine-portable — no rand()), ties by
    * smallest id. Per-cluster top-m runs on the map-side bounded
    * [[graft.functions.TopKAggregator]], so the shuffle carries at most
    * m rows per task×cluster — never the corpus (the window-rank
    * formulation would shuffle every row to its cluster's partition).
    * Ids must be integral (the aggregator carries (score, long-id)
    * pairs); ≤ 2^52 ids keep the negated-hash score exact in double. */
  def clusterBalanced(assign: DataFrame, idCol: String,
                      clusterCol: String, m: Int): DataFrame = {
    require(m >= 1, s"per-cluster budget m=$m must be >= 1")
    val hash = pmod(pmod(col(idCol).cast("long"), lit(1000003L))
      * lit(2654435761L), lit(1000000L))
    val topm = udaf(new graft.functions.TopKAggregator(m))
    assign
      .select(col(clusterCol).as("cluster"),
        col(idCol).cast("long").as("_id"),
        // TopKAggregator keeps the LARGEST scores; smallest hash wins,
        // so the score is the negated hash (exact in double)
        (-hash.cast("double")).as("_score"))
      .groupBy(col("cluster"))
      .agg(topm(col("_score"), col("_id")).as("_top"))
      .select(col("cluster"), posexplode(col("_top")).as(Seq("_pos", "_hit")))
      .select(col("cluster"), col("_hit._2").as(idCol),
        (col("_pos") + 1).as("pos"))
  }

  /** Deterministic SHARD assignment for training-mix output — the last
    * step of the pipeline: every example lands in exactly one of
    * `nShards` shards via the engine-wide Knuth multiplicative hash of
    * its id (retry-safe, partition-independent, engine-portable — the
    * properties a resumable writer needs, which `rand()`-routing and
    * `repartition(n)` round-robin both lack: re-running the job, or
    * running it at different parallelism, must route every example to
    * the SAME shard). Hash sharding balances shard sizes in
    * expectation (law of large numbers per shard — the imbalance a
    * shard-stats row should watch is the max/mean token ratio);
    * at write time `df.repartition(col("shard")).write.partitionBy
    * ("shard")` lands each shard as its own partition directory, the
    * [[graft.operators.IvfIndex.writePartitioned]] layout discipline. */
  def hashShard(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    df.withColumn("shard",
      pmod(pmod(col(idCol).cast("long"), lit(1000003L)) * lit(2654435761L),
        lit(nShards.toLong)))
  }
}
