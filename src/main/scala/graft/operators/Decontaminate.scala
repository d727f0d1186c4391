package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag every training
  * document that shares at least one token n-gram with an evaluation
  * set (the standard guard against test-set leakage into training
  * data).
  *
  * Scale shape: the eval set is small by definition — its DISTINCT
  * shingle set is broadcast — so the training corpus is scanned once,
  * shingled row-locally ([[graft.expressions.Shingles]], codegen'd),
  * and semi-joined against the broadcast set. The training side is
  * never shuffled and only (doc_id, hit-count) rows leave the scan
  * stage; at 100 TB this is a single map-side pass. For eval sets too
  * large to broadcast, the same join degenerates gracefully to a
  * shuffle join on the shingle key — still bucket-shaped, never
  * corpus×corpus.
  */
object Decontaminate {

  /** Training docs sharing ≥1 token `n`-gram with `eval`:
    * (train id, n_hits = how many DISTINCT eval shingles it echoes).
    * Comparison is on DISTINCT shingles per side, so repeated phrases
    * inside one document count once. */
  def contaminated(train: DataFrame, trainId: String, trainText: String,
                   eval: DataFrame, evalText: String,
                   n: Int = 5): DataFrame = {
    val evalShingles = eval
      .select(explode(array_distinct(NearDup.shingles(col(evalText), n)))
        .as("_sh"))
      .distinct()
    train
      .select(col(trainId).as("_tid"),
        explode(array_distinct(NearDup.shingles(col(trainText), n))).as("_sh"))
      .join(broadcast(evalShingles), "_sh")
      .groupBy(col("_tid"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("_tid").as(trainId), col("n_hits"))
  }
}
