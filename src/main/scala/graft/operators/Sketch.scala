package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch corpus statistics — the incremental-analytics tier
  * of `corpus_stats`: distinct counts (vocabulary size, unique
  * fingerprints) tracked across an EVOLVING corpus without ever
  * rescanning it. Each ingestion batch folds its rows into a
  * fixed-size HLL sketch (Apache DataSketches via Spark's built-in
  * `hll_sketch_agg`); the per-batch sketches are the persisted state,
  * and corpus-wide statistics are answered by `hll_union_agg` over
  * them — an associative, order-independent register-wise max, so ANY
  * grouping of the history (per day, per compaction epoch, re-merged
  * after repartitioning) yields the identical estimate.
  *
  * 100 TB shape: the only thing that ever shuffles is (group key,
  * 2^lgK-register sketch) — kilobytes per group — never the corpus
  * itself; the per-batch sketch build is a two-phase hash aggregate
  * (map-side partial sketches, one reduce per group), and history
  * merges touch one tiny sketch row per retired batch. This is the
  * standard public lambda/kappa pattern for distinct-count maintenance
  * (Agarwal et al., DataSketches).
  *
  * Estimator caveat (why specs assert merge-INVARIANCE, not byte
  * equality with a direct sketch): a sketch built in one pass answers
  * with the HIP estimator, a union answers with the composite
  * estimator, so `direct ≈ merged` only within sketch error — but
  * merged-any-grouping == merged-other-grouping EXACTLY.
  */
object Sketch {

  /** Per-(group, batch) HLL sketches of distinct `valueCol` — the
    * persisted increment a batch contributes to corpus stats. */
  def distinctSketches(df: DataFrame, valueCol: Column, batchCol: Column,
                       groupCols: Seq[Column], lgK: Int = 12): DataFrame =
    df.groupBy(groupCols :+ batchCol.as("batch"): _*)
      .agg(hll_sketch_agg(valueCol, lgK).as("sketch"))

  /** Collapse per-batch sketches to one sketch per group (register-wise
    * max — associative and order-independent). */
  def mergeSketches(perBatch: DataFrame, groupCols: Seq[Column]): DataFrame =
    perBatch.groupBy(groupCols: _*)
      .agg(hll_union_agg(col("sketch"), allowDifferentLgConfigK = false)
        .as("sketch"))

  /** Distinct-count estimate of a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Per-language vocabulary sketches from document batches: one row
    * per (lang, batch) with the batch's distinct-token sketch. */
  def vocabSketches(docs: DataFrame, langCol: String, textCol: String,
                    batchCol: Column, lgK: Int = 12): DataFrame =
    distinctSketches(
      docs.select(col(langCol), batchCol.as("__batch"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok")),
      col("tok"), col("__batch"), Seq(col(langCol)), lgK)
}
