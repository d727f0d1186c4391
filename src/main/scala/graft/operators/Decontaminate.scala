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
    * Short-eval-item recall: an eval doc with L < `n` tokens yields one
    * WHOLE-DOCUMENT shingle, which only matches an n-gram-shingled
    * training doc equal to it verbatim. With `shortEvalPass = true` (the
    * default) a second containment pass runs AT THE ITEM'S OWN LENGTH:
    * training docs are additionally shingled at each short length L
    * present in the eval set, so a 2-token eval answer buried inside a
    * longer training doc is flagged. The extra pass stays lazy and
    * scale-safe — the distinct short lengths are a ≤ n-1-row broadcast
    * frame cross-joined onto the training scan, so the corpus is
    * re-shingled only for lengths that actually occur (no short eval
    * items ⇒ the pass joins an empty set and adds no hits). */
  def contaminated(train: DataFrame, trainId: String, trainText: String,
                   eval: DataFrame, evalText: String,
                   n: Int = 5, broadcastEval: Boolean = true,
                   shortEvalPass: Boolean = true): DataFrame = {
    def maybeBcast(df: DataFrame) = if (broadcastEval) broadcast(df) else df
    val evalShingles = eval
      .select(explode(array_distinct(NearDup.shingles(col(evalText), n)))
        .as("_sh"))
      .distinct()
    val baseHits = train
      .select(col(trainId).as("_tid"),
        explode(array_distinct(NearDup.shingles(col(trainText), n))).as("_sh"))
      .join(maybeBcast(evalShingles), "_sh")
      .select(col("_tid"), col("_sh"))
    val hits = if (!shortEvalPass) baseHits else {
      val shortSet = eval
        .select(TextAnalysis.tokens(col(evalText)).as("_tk"))
        .where(size(col("_tk")).between(1, n - 1))
        .select(concat_ws(" ", col("_tk")).as("_sh"),
          size(col("_tk")).as("_len"))
        .distinct()
      val shortLens = shortSet.select(col("_len")).distinct()
      // training docs with exactly _len tokens are excluded (>): their
      // single _len-gram IS the whole document, which the base pass's
      // whole-doc-vs-whole-doc match already covers — including them
      // would double-count that hit after the union
      val shortHits = train
        .select(col(trainId).as("_tid"),
          TextAnalysis.tokens(col(trainText)).as("_tk"))
        .crossJoin(broadcast(shortLens))
        .where(size(col("_tk")) > col("_len"))
        .select(col("_tid"),
          explode(array_distinct(transform(
            sequence(lit(1), size(col("_tk")) - col("_len") + 1),
            s => concat_ws(" ", slice(col("_tk"), s, col("_len")))))).as("_sh"))
        .join(maybeBcast(shortSet.select(col("_sh"))), "_sh")
        .select(col("_tid"), col("_sh"))
      // no dedup needed across the union: short-pass shingles have < n
      // tokens while base-pass matches are n-grams or whole short docs of
      // a DIFFERENT length than any short-pass candidate from the same
      // training doc (the > filter above) — token counts differ, so the
      // shingle strings can never collide
      baseHits.unionAll(shortHits)
    }
    hits
      .groupBy(col("_tid"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("_tid").as(trainId), col("n_hits"))
  }
}
