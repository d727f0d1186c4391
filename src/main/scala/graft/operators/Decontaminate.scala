package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag every training
  * document that shares at least one token n-gram with an evaluation
  * set (the standard guard against test-set leakage into training
  * data).
  *
  * Scale shape: the eval set is small by definition — its DISTINCT
  * shingle set is broadcast (`broadcastEval = true`, the default) — so
  * the training corpus is scanned once, shingled row-locally
  * ([[graft.expressions.Shingles]], codegen'd), and joined against the
  * broadcast set. The training side is never shuffled and only
  * (doc_id, hit-count) rows leave the scan stage; at 100 TB this is a
  * single map-side pass. For eval sets too large to broadcast, pass
  * `broadcastEval = false`: the same relation joins by shuffle on the
  * shingle key — still bucket-shaped, never corpus×corpus.
  */
object Decontaminate {

  /** Training docs sharing ≥1 token `n`-gram with `eval`:
    * (train id, n_hits = how many DISTINCT eval shingles it echoes).
    * Comparison is on DISTINCT shingles per side, so repeated phrases
    * inside one document count once.
    *
    * Recall contract: an eval doc with fewer than `n` tokens yields one
    * WHOLE-DOCUMENT shingle, which only matches a training doc equal to
    * it verbatim — its appearance INSIDE a longer training doc is not
    * flagged. Pick `n` no larger than the shortest meaningful eval item
    * (QA benchmarks with terse answers want a small `n` or an extra
    * pass at the answer length). */
  def contaminated(train: DataFrame, trainId: String, trainText: String,
                   eval: DataFrame, evalText: String,
                   n: Int = 5, broadcastEval: Boolean = true): DataFrame = {
    val evalShingles = eval
      .select(explode(array_distinct(NearDup.shingles(col(evalText), n)))
        .as("_sh"))
      .distinct()
    val evalSide = if (broadcastEval) broadcast(evalShingles) else evalShingles
    train
      .select(col(trainId).as("_tid"),
        explode(array_distinct(NearDup.shingles(col(trainText), n))).as("_sh"))
      .join(evalSide, "_sh")
      .groupBy(col("_tid"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("_tid").as(trainId), col("n_hits"))
  }
}
