package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search — the reference's flagship path re-expressed
  * Spark-first (reference `app.py:40-48`: embed → brute-force scan with a
  * per-row Python dot product → full sort → head(k)).
  *
  * Here the scan is a columnar parquet read, the dot product is a
  * codegen'd higher-order expression, and `orderBy(...).limit(k)` is
  * planned by Catalyst as `TakeOrderedAndProject`: per-partition bounded
  * heaps + a driver merge of k·numPartitions rows — no global sort, no
  * full shuffle. That plan shape is exactly what survives a 100 TB corpus
  * on 1000 executors (each task returns only k rows).
  */
object Search {

  /** Score every row against a fixed query vector (A4). Pure projection —
    * unlike the reference, the source relation is never mutated
    * (`app.py:45` writes the similarity column back into the stored table;
    * SURVEY.md §1.4 documents this as an artifact we deliberately fix).
    *
    * Scores are rounded to 4 decimals (mirroring the reference's own
    * display contract, `app.py:91`) so downstream ordering is
    * engine-deterministic. */
  def scored(corpus: DataFrame, vecCol: String, q: Seq[Double],
             score: (Column, Column) => Column = dot): DataFrame =
    corpus.withColumn("sim", round(score(col(vecCol), vecLit(q)), 4))

  /** Global top-k by similarity with a unique tie-break key (A5 + fix for
    * the reference's unspecified tie order, SURVEY.md §7.5). */
  def topK(corpus: DataFrame, vecCol: String, idCol: String, q: Seq[Double],
           k: Int, score: (Column, Column) => Column = dot): DataFrame =
    scored(corpus, vecCol, q, score)
      .orderBy(desc("sim"), asc(idCol))
      .limit(k)

  /** Threshold search (B9): all rows at least `minSim` similar. The
    * threshold is compared against the rounded score so both engines of
    * the oracle gate agree at the boundary. */
  def aboveThreshold(corpus: DataFrame, vecCol: String, q: Seq[Double],
                     minSim: Double,
                     score: (Column, Column) => Column = dot): DataFrame =
    scored(corpus, vecCol, q, score).filter(col("sim") >= minSim)

  /** Reciprocal-rank fusion of two (id, rank) relations — the standard
    * public recipe (Cormack et al. 2009) for HYBRID search: a keyword
    * ranking (e.g. [[TextAnalysis.bm25]]) and a vector ranking (e.g.
    * [[topK]]) are combined by rank position alone,
    * `rrf = Σ_lists 1/(kRrf + rank)`, so the two scores never need a
    * common scale. Inputs carry (`idCol`, `rankCol`) with rank 1-based;
    * ids present in only one list contribute just that list's term
    * (full-outer semantics). Returns (idCol, rrf) — ranks are integers,
    * so the fused score is engine-exact rational arithmetic, rounded to
    * the 4-decimal display contract.
    *
    * Scale shape: both inputs are ALREADY top-k-bounded rankings (that
    * is what a rank column means), so the fusion join is k-sized — at
    * 100 TB the heavy lifting happened in the rankers; fusing is
    * driver-trivial but kept distributed so it composes with
    * k-per-query multi-query fans. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
              rankCol: String = "rank", kRrf: Int = 60): DataFrame = {
    // union + one hash aggregation instead of a full-outer join: each
    // ranker contributes its reciprocal-rank term as a row and the agg
    // sums per id — same ≤2 IEEE addends per id as the join form
    // (identical in either order; an absent side contributed exactly 0
    // there and contributes no row here), but the whole fusion now
    // rides ONE shuffle in the SAME job as both ranker subtrees, where
    // the join paid two exchanges or a broadcast-build job (the r17
    // kernel-deficit profile put hybrid_rrf's excess exactly there).
    // rank is cast to DOUBLE, not long: integer ranks are exact either
    // way (≤2^53), but a fractional ranker rank must not silently
    // truncate, and a null rank's term nulls out and is skipped by the
    // sum — the same 0-contribution the old coalesce form gave it.
    val terms = a.select(col(idCol), col(rankCol).cast("double").as("_r"))
      .unionByName(b.select(col(idCol), col(rankCol).cast("double").as("_r")))
    terms.groupBy(col(idCol))
      .agg(round(sum(lit(1.0) / (lit(kRrf) + col("_r"))), 4).as("rrf"))
  }

  /** [[rrfFuse]] for BATCHED rankings — fuses two (qid, id, rank)
    * relations per query id, completing the multi-query triad
    * (`bm25_topk_many` keyword, `probeMany`/`searchMany` vector, this
    * fusion): full-outer join on (qid, id), each side contributing its
    * reciprocal-rank term, absentees contributing zero. Both inputs are
    * per-query top-k-bounded, so the join is (queries × k)-sized. */
  def rrfFuseMany(a: DataFrame, b: DataFrame, qidCol: String, idCol: String,
                  rankCol: String = "rank", kRrf: Int = 60): DataFrame = {
    // union + hash agg, same rationale (and same bit-identity argument)
    // as [[rrfFuse]], keyed per (query, id)
    val terms = a.select(col(qidCol), col(idCol),
        col(rankCol).cast("double").as("_r"))
      .unionByName(b.select(col(qidCol), col(idCol),
        col(rankCol).cast("double").as("_r")))
    terms.groupBy(col(qidCol), col(idCol))
      .agg(round(sum(lit(1.0) / (lit(kRrf) + col("_r"))), 4).as("rrf"))
  }

  /** Collect several BOUNDED single-column id rankings in ONE Spark
    * action — the multi-query batching the recall instruments need
    * (each previously paid one collect job per query vector per side,
    * so a 2-query × (approx, exact) evaluation paid the scheduler
    * floor 4×). Every frame must already be a top-k-bounded ranking
    * projected to its id column; each is tagged with its position, the
    * tagged frames union, and one collect returns every list.
    *
    * Result identity: each branch keeps its EXACT original subtree
    * (same TakeOrderedAndProject, same tie-breaks), so the returned
    * lists are element-for-element what the sequential collects
    * returned. Per-branch row order is preserved because a union
    * concatenates its children's partitions in child order and each
    * bounded ranking is a single sorted partition
    * (TakeOrderedAndProject's internal single-partition shuffle is not
    * a planner Exchange, so neither AQE query stages nor extra jobs
    * appear — the whole union is one job at any scale).
    *
    * Scale shape: the branches' scans execute within one job exactly
    * as they did across jobs — same bytes read, same per-branch top-k
    * bound on what reaches the driver; only the per-action scheduling
    * overhead collapses. */
  def collectIdLists(frames: Seq[DataFrame]): IndexedSeq[IndexedSeq[Long]] = {
    require(frames.nonEmpty, "collectIdLists needs at least one frame")
    val tagged = frames.zipWithIndex.map { case (f, i) =>
      f.select(lit(i).as("_q"), col(f.columns.head).cast("long").as("_id"))
    }
    val rows = tagged.reduce(_ unionAll _).collect()
    val out = IndexedSeq.fill(frames.length)(
      scala.collection.mutable.ArrayBuffer.empty[Long])
    rows.foreach(r => out(r.getInt(0)) += r.getLong(1))
    out.map(_.toIndexedSeq)
  }

  /** Default ceiling on how much of the query side one broadcast may
    * carry — sized to fit comfortably in executor memory alongside the
    * scan (the historical contract was "callers hold it"; now the
    * engine enforces it, see [[queryChunks]]). */
  val DefaultMaxBroadcastBytes: Long = 256L << 20

  /** Broadcast guard for the k-NN joins: Catalyst's size estimate of the
    * optimized query-side plan is compared against `maxBroadcastBytes`;
    * an oversized query side is split into deterministic hash chunks of
    * the query-id column, each broadcast separately and the per-chunk
    * results unioned. Per-query top-k is independent across queries, so
    * chunking cannot change any result row.
    *
    * Purely plan-driven (no count job, frames stay lazy). Each chunk
    * re-evaluates the query-side lineage once — callers with an
    * expensive query-side pipeline should persist it first.
    *
    * `sizeInBytes` is a heuristic UPPER bound, so the guard never
    * hard-fails on it: a stat-less leaf (RDD/Dataset-backed frame)
    * defaults to `spark.sql.defaultSizeInBytes` (Long.MaxValue) and
    * inner-join estimates are multiplicative. An UNKNOWN estimate
    * (>= defaultSizeInBytes) keeps the historical single-broadcast
    * behavior — the caller holds the size contract, exactly as before the
    * guard existed. A genuinely huge estimate that would need more than
    * 1024 chunks (≳256 GB of query side) is not a broadcast-join
    * workload at all: the guard returns the un-chunked frame with
    * `broadcastable = false` and the join runs without the broadcast
    * hint. CAVEAT (deliberate, documented degradation): the k-NN join
    * condition is non-equi (`=!=` / `lit(true)`), so Catalyst cannot
    * plan a shuffled hash/merge join here — the un-hinted fallback is a
    * `BroadcastNestedLoopJoin` (broadcasting whichever side estimates
    * smaller, possibly the corpus) or a cartesian product, i.e. a
    * potential OOM/perf cliff rather than a loud failure. A >256 GB
    * query side is a block-matrix workload — chunk BOTH sides — not a
    * broadcast k-NN; callers in that regime must pre-chunk the query
    * side themselves (each chunk re-enters this guard and broadcasts
    * normally). */
  private def queryChunks(queries: DataFrame, qIdCol: String,
                          maxBroadcastBytes: Long): (Seq[DataFrame], Boolean) = {
    require(maxBroadcastBytes > 0, "maxBroadcastBytes must be positive")
    val est = queries.queryExecution.optimizedPlan.stats.sizeInBytes
    val unknown = est >= BigInt(
      org.apache.spark.sql.internal.SQLConf.get.defaultSizeInBytes)
    if (unknown || est <= maxBroadcastBytes) (Seq(queries), true)
    else {
      val want = (est + maxBroadcastBytes - 1) / maxBroadcastBytes
      if (want > 1024) (Seq(queries), false)
      else {
        val n = want.toInt
        ((0 until n).map(i =>
          queries.where(pmod(xxhash64(col(qIdCol)), lit(n)) === i)), true)
      }
    }
  }

  /** k-NN join (B4): for each row of `queries`, the k nearest `corpus`
    * rows by `score`.
    *
    * Plan shape: the queries side is explicitly `broadcast()` — the
    * corpus (the 100 TB side) is never shuffled for the join itself; each
    * corpus partition scores all queries locally. The per-query top-k is
    * then a window `row_number` over rows pre-filtered per-partition, so
    * the shuffle input is already bounded.
    *
    * A query side whose plan-estimated size exceeds `maxBroadcastBytes`
    * is automatically hash-chunked and unioned ([[queryChunks]]) — no
    * single broadcast ever exceeds the ceiling.
    */
  def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
              corpus: DataFrame, cIdCol: String, cVecCol: String,
              k: Int, score: (Column, Column) => Column = cosine,
              excludeSelf: Boolean = true,
              maxBroadcastBytes: Long = DefaultMaxBroadcastBytes): DataFrame = {
    val (chunks, broadcastable) = queryChunks(queries, qIdCol, maxBroadcastBytes)
    chunks.map { qchunk =>
      val q = qchunk.select(col(qIdCol).as("qid"), col(qVecCol).as("qvec"))
      val qSide = if (broadcastable) broadcast(q) else q
      val pairs = corpus.join(qSide,
        if (excludeSelf) col(cIdCol) =!= col("qid") else lit(true))
      val scoredPairs = pairs.select(
        col("qid"), col(cIdCol),
        round(score(col(cVecCol), col("qvec")), 4).as("sim"))
        // undefined similarity (zero-norm vector → null score) is not a
        // neighbor; same rule in knnJoinAgg keeps the two shapes identical
        .filter(col("sim").isNotNull)
      val w = Window.partitionBy(col("qid"))
        .orderBy(desc("sim"), asc(cIdCol))
      scoredPairs
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
    }.reduce(_ unionAll _)
  }

  /** k-NN join via the bounded [[graft.functions.TopKAggregator]] instead
    * of a window — the 100 TB-preferred shape: partial aggregation reduces
    * every map task to ≤k rows per query BEFORE the shuffle, so the
    * exchange carries k·tasks rows per query instead of the whole scored
    * corpus (a window's `row_number` must see every row of a key in one
    * partition — with few query keys that is catastrophic skew at scale).
    * Results are identical to [[knnJoin]] (same ordering + tie-break). */
  def knnJoinAgg(queries: DataFrame, qIdCol: String, qVecCol: String,
                 corpus: DataFrame, cIdCol: String, cVecCol: String,
                 k: Int, metric: String = "cosine",
                 excludeSelf: Boolean = true,
                 maxBroadcastBytes: Long = DefaultMaxBroadcastBytes): DataFrame = {
    val simOf: (Column, Column, Column, Column) => Column = metric match {
      // nullif guards zero-norm vectors: null score instead of a
      // divide-by-zero, filtered below (same rule as knnJoin)
      case "cosine" => (cvec, qvec, cn, qn) =>
        dot(cvec, qvec) / nullif(cn * qn, lit(0.0))
      case "dot"    => (cvec, qvec, _, _) => dot(cvec, qvec)
      case m        => throw new IllegalArgumentException(s"unknown metric $m")
    }
    // norms are projected ONCE PER ROW on each side before the join —
    // an inline cosine would recompute both self-dots for every
    // (corpus × query) pair
    val c = corpus.select(col(cIdCol).as("cid"), col(cVecCol).as("cvec"),
      l2Norm(col(cVecCol)).as("cn"))
    val (chunks, broadcastable) = queryChunks(queries, qIdCol, maxBroadcastBytes)
    chunks.map { qchunk =>
      val q = qchunk.select(col(qIdCol).as("qid"), col(qVecCol).as("qvec"),
        l2Norm(col(qVecCol)).as("qn"))
      val qSide = if (broadcastable) broadcast(q) else q
      val pairs = c.join(qSide,
        if (excludeSelf) col("cid") =!= col("qid") else lit(true))
      val scoredPairs = pairs.select(
        col("qid"), col("cid"),
        round(simOf(col("cvec"), col("qvec"), col("cn"), col("qn")), 4)
          .as("sim"))
        .filter(col("sim").isNotNull)
      val topk = udaf(new graft.functions.TopKAggregator(k))
      scoredPairs
        .groupBy(col("qid"))
        .agg(topk(col("sim"), col("cid")).as("top"))
        .select(col("qid"), posexplode(col("top")).as(Seq("pos", "hit")))
        .select(col("qid"), col("hit._2").as("cid"),
          col("hit._1").as("sim"), (col("pos") + 1).as("rank"))
    }.reduce(_ unionAll _)
  }
}
