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

  // ------------- count-min FREQUENCY sketches (heavy hitters) -----------

  /** Per-(group, batch) count-min sketches of `valueCol` occurrences —
    * the FREQUENCY twin of [[distinctSketches]] (Cormode & Muthukrishnan
    * 2005; Spark's built-in `count_min_sketch` aggregate). Same state
    * shape: one `ceil(2/eps) × ceil(ln(1/(1-confidence)))` counter grid
    * per (group, batch) — kilobytes — is all that persists or shuffles.
    *
    * Unlike HLL, CMS merging is counter-wise ADDITION, which is exact:
    * the merged sketch is BYTE-IDENTICAL to a one-pass sketch of the
    * union (same eps/confidence/seed), so estimates are invariant under
    * ANY batching of history — asserted as byte equality in SketchSpec,
    * where the HLL twin can only assert merge-grouping invariance. */
  def freqSketches(df: DataFrame, valueCol: Column, batchCol: Column,
                   groupCols: Seq[Column], eps: Double = 0.001,
                   confidence: Double = 0.99, seed: Int = 42): DataFrame =
    df.groupBy(groupCols :+ batchCol.as("batch"): _*)
      .agg(count_min_sketch(valueCol, lit(eps), lit(confidence), lit(seed))
        .as("cms"))

  /** Counter-wise CMS union as a typed Aggregator over the serialized
    * sketch column — partial-aggregatable, so history merges reduce
    * map-side and the shuffle carries one grid per (task × group). */
  private class CmsMerge extends org.apache.spark.sql.expressions
      .Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def mergeBytes(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      val s = org.apache.spark.util.sketch.CountMinSketch.readFrom(x)
      s.mergeInPlace(org.apache.spark.util.sketch.CountMinSketch.readFrom(y))
      val bos = new java.io.ByteArrayOutputStream()
      s.writeTo(bos)
      bos.toByteArray
    }
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] =
      if (b.isEmpty) a else if (a == null || a.isEmpty) b else mergeBytes(b, a)
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
      if (b1.isEmpty) b2 else if (b2.isEmpty) b1 else mergeBytes(b1, b2)
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  private lazy val cmsUnionAgg =
    org.apache.spark.sql.functions.udaf(new CmsMerge)

  /** Collapse per-batch CMS rows to one sketch per group. Exact —
    * counter addition, order-independent, bit-reproducible. */
  def mergeFreqSketches(perBatch: DataFrame,
                        groupCols: Seq[Column]): DataFrame =
    perBatch.groupBy(groupCols: _*)
      .agg(cmsUnionAgg(col("cms")).as("cms"))

  /** Estimated occurrence count of string `item` in a CMS column.
    * One-sided error: `est >= true` always, `est <= true + eps·N` with
    * prob ≥ confidence. Row-local lookup (deserialize + d hashes); at
    * heavy lookup fan-out cache the deserialized grid per partition. */
  def freqEstimate(cms: Column, item: Column): Column = {
    val f = udf { (bytes: Array[Byte], s: String) =>
      if (bytes == null || bytes.isEmpty || s == null) 0L
      else org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
        .estimateCount(s)
    }
    f(cms, item)
  }

  /** Per-language token-frequency sketches from document batches. */
  def tokenFreqSketches(docs: DataFrame, langCol: String, textCol: String,
                        batchCol: Column, eps: Double = 0.001,
                        confidence: Double = 0.99,
                        seed: Int = 42): DataFrame =
    freqSketches(
      docs.select(col(langCol), batchCol.as("__batch"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok")),
      col("tok"), col("__batch"), Seq(col(langCol)), eps, confidence, seed)

  /** CANDIDATE-TRACKED heavy hitters over an incrementally-sketched
    * corpus — the complete pattern, because a CMS answers point lookups
    * but cannot enumerate: frequencies come from the merged sketch,
    * candidates from each batch's local top-`candidatesPerBatch` tokens
    * (any corpus-wide top-`k` token is a top-N token of at least one
    * batch for N sized generously vs. k — the standard sketch+candidate
    * recipe). Only aggregated (group, batch, token, count) rows and
    * kilobyte sketch rows ever shuffle; document text is consumed by
    * the row-local explode.
    *
    * Returns (langCol, rank, tok, est) — per-language top-`k` by
    * estimated count, rank pinned by (est DESC, tok ASC). */
  def heavyHitters(docs: DataFrame, langCol: String, textCol: String,
                   batchCol: Column, k: Int = 10,
                   candidatesPerBatch: Int = 30, eps: Double = 0.001,
                   confidence: Double = 0.99, seed: Int = 42): DataFrame =
    heavyHittersTok(
      docs.select(col(langCol), batchCol.as("__batch"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok")),
      langCol, "tok", col("__batch"), k, candidatesPerBatch,
      eps, confidence, seed)

  /** [[heavyHitters]] over a PRE-TOKENIZED (group, token) frame — the
    * entry point for callers that already hold the exploded token
    * stream (e.g. persisted once and shared with other sketch builds,
    * so the corpus is tokenized a single time instead of once per
    * consumer). `batchCol` must be derivable from `toks`' columns. */
  def heavyHittersTok(toksIn: DataFrame, langCol: String, tokCol: String,
                      batchCol: Column, k: Int = 10,
                      candidatesPerBatch: Int = 30, eps: Double = 0.001,
                      confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val toks = toksIn.select(col(langCol), batchCol.as("__batch"),
      col(tokCol).as("tok"))
    val merged = mergeFreqSketches(
      freqSketches(toks, col("tok"), col("__batch"), Seq(col(langCol)),
        eps, confidence, seed),
      Seq(col(langCol)))
    val perBatch = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol), col("__batch"))
      .orderBy(col("c").desc, col("tok").asc)
    val candidates = toks
      .groupBy(col(langCol), col("__batch"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .withColumn("__rn", row_number().over(perBatch))
      .filter(col("__rn") <= candidatesPerBatch)
      .select(col(langCol), col("tok")).distinct()
    val perLang = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol))
      .orderBy(col("est").desc, col("tok").asc)
    candidates
      .join(broadcast(merged), langCol) // one kilobyte row per language
      .withColumn("est", freqEstimate(col("cms"), col("tok")))
      .withColumn("rank", row_number().over(perLang).cast("long"))
      .filter(col("rank") <= k)
      .select(col(langCol), col("rank"), col("tok"), col("est"))
  }

  /** [[freqSketches]] over a PRE-COUNTED (value, count) relation — so one
    * tokenize/explode pass, aggregated once to a vocabulary-sized counted
    * relation, can feed EVERY batching scheme (the per-batch sketch is
    * grid-identical because CMS addition is linear; byte-equality with
    * the unweighted built-in pinned in SketchSpec). At 100 TB the counted
    * relation is the (group, batch, token, n) artifact a corpus pipeline
    * maintains incrementally anyway. */
  def freqSketchesWeighted(counted: DataFrame, valueCol: Column,
                           cntCol: Column, batchCol: Column,
                           groupCols: Seq[Column], eps: Double = 0.001,
                           confidence: Double = 0.99,
                           seed: Int = 42): DataFrame =
    counted.groupBy(groupCols :+ batchCol.as("batch"): _*)
      .agg(graft.GraftExtensions.cmsWeightedCol(valueCol, cntCol,
        eps, confidence, seed).as("cms"))

  /** [[heavyHittersTok]] from a pre-counted (lang, batch, tok, cnt)
    * relation — identical candidate rule (per-batch local top by count,
    * same tie-break) and identical merged-sketch estimates, minus the
    * per-invocation tokenize. */
  def heavyHittersCounted(counted: DataFrame, langCol: String,
                          tokCol: String, batchCol: String, cntCol: String,
                          k: Int = 10, candidatesPerBatch: Int = 30,
                          eps: Double = 0.001, confidence: Double = 0.99,
                          seed: Int = 42): DataFrame = {
    val merged = mergeFreqSketches(
      freqSketchesWeighted(counted, col(tokCol), col(cntCol),
        col(batchCol), Seq(col(langCol)), eps, confidence, seed),
      Seq(col(langCol)))
    val perBatch = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol), col(batchCol))
      .orderBy(col("__c").desc, col(tokCol).asc)
    val candidates = counted
      .groupBy(col(langCol), col(batchCol), col(tokCol))
      .agg(sum(col(cntCol)).as("__c"))
      .withColumn("__rn", row_number().over(perBatch))
      .filter(col("__rn") <= candidatesPerBatch)
      .select(col(langCol), col(tokCol)).distinct()
    val perLang = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol))
      .orderBy(col("est").desc, col(tokCol).asc)
    candidates
      .join(broadcast(merged), langCol)
      .withColumn("est", freqEstimate(col("cms"), col(tokCol)))
      .withColumn("rank", row_number().over(perLang).cast("long"))
      .filter(col("rank") <= k)
      .select(col(langCol), col("rank"), col(tokCol), col("est"))
  }
}
