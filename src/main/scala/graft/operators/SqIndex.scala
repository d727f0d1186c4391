package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Scalar quantization (SQ8) — the LOW-LOSS vector-compression scale
  * path, complementing [[PqIndex]] on the other end of the
  * compression/fidelity dial (the classic FAISS `SQ8` layout, public):
  * each dimension is quantized INDEPENDENTLY to an 8-bit code against a
  * per-dimension affine grid `x̂ = vmin + code·Δ`, `Δ = (vmax−vmin)/127`.
  * A 64-dim float32 vector (256 B) becomes 64 bytes — 4× compression
  * with a per-dimension error bound of Δ/2, which on realistic ranges
  * keeps the quantized ordering nearly exact (certified live by the
  * `sq_recall` row), where PQ's 32× compression trades real recall.
  * At 10^11 rows the point is scan bandwidth: the codes table reads 4×
  * fewer bytes than the raw vectors for the same candidate sweep.
  *
  * Spark-first shape, same discipline as [[PqIndex]]:
  *   - TRAIN: per-dimension (min, max) — ONE partial-aggregated exchange
  *     (posexplode → groupBy(dim)), d tiny rows to the driver, never
  *     vectors; the same job detects ragged corpora (a dimension seen in
  *     fewer rows than another) and fails loudly;
  *   - ENCODE: pure projection → (id, array<tinyint> of length d);
  *   - SEARCH: approximate dot from codes alone —
  *     dot(q, x̂) = Σᵢ qᵢ·vminᵢ (one driver constant) +
  *     Σᵢ (qᵢ·Δᵢ)·codeᵢ (a lookup-fold over one d-length plan literal) —
  *     then global top-k (`TakeOrderedAndProject`); optional exact
  *     re-rank of the bounded top `r` via the shared broadcast-join
  *     kernel ([[PqIndex.exactRerank]]).
  *
  * Codes are SIGNED bytes spanning 0..127 (128 levels) — the
  * [[PqIndex]] rule: not worth the +128 offset arithmetic for one more
  * bit. Quantization is float-deterministic but grid placement depends
  * on float min/max, so SQ rows are validated by invariant/recall tests,
  * not the byte-exact oracle (SURVEY.md §7.3).
  */
object SqIndex {

  /** Quantization levels − 1: codes span 0..127 in a signed byte. */
  val Levels = 127

  /** Per-dimension affine grid: `x̂ᵢ = vmin(i) + code·delta(i)`;
    * `delta(i) = 0` marks a constant dimension (code always 0,
    * reconstruction exact). */
  final case class SqParams(vmin: IndexedSeq[Double],
                            delta: IndexedSeq[Double]) {
    def dim: Int = vmin.length
  }

  /** Train the per-dimension grid with ONE map-side-combinable exchange:
    * posexplode to (dim, x), groupBy(dim) → (min, max, count). The count
    * doubles as the ragged-corpus detector — every dimension must appear
    * exactly once per row, so unequal per-dim counts mean non-uniform
    * vector lengths and the grid would silently mis-shape: fail loudly
    * (the [[IvfIndex.build]] rule). */
  def trainParams(corpus: DataFrame, idCol: String, vecCol: String): SqParams = {
    val stats = corpus
      .select(posexplode(transform(col(vecCol), _.cast("double")))
        .as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"),
        count(lit(1)).as("n"))
      .collect()
    require(stats.nonEmpty, "cannot train SQ on an empty corpus")
    require(stats.map(_.getLong(3)).distinct.length == 1,
      "ragged corpus: vector lengths must be uniform (a dimension was " +
        "seen in fewer rows than another)")
    val d = stats.length
    val vmin = new Array[Double](d)
    val delta = new Array[Double](d)
    stats.foreach { r =>
      val i = r.getInt(0)
      vmin(i) = r.getDouble(1)
      delta(i) = (r.getDouble(2) - r.getDouble(1)) / Levels
    }
    SqParams(vmin.toIndexedSeq, delta.toIndexedSeq)
  }

  /** Per-row quantization as a pure projection:
    * code = clip(round((x − vmin)/Δ), 0, 127); constant dimensions
    * (Δ = 0) always code 0. The whole grid rides as two d-length
    * typedlit arrays — one expression node each. */
  private def codesExpr(v: Column, p: SqParams): Column = {
    val vminL = typedlit(p.vmin)
    val deltaL = typedlit(p.delta)
    transform(sequence(lit(0), lit(p.dim - 1)), i => {
      val dlt = element_at(deltaL, i + 1)
      when(dlt === 0.0, lit(0)).otherwise(
        least(lit(Levels), greatest(lit(0),
          round((element_at(v, i + 1).cast("double")
            - element_at(vminL, i + 1)) / dlt).cast("int"))))
    })
  }

  /** Encode the corpus: (idCol, codes array<tinyint> of length d) — the
    * compressed table a cluster persists. Pure projection,
    * embarrassingly parallel. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             p: SqParams): DataFrame =
    corpus.select(col(idCol), col(vecCol).as("_v"))
      .select(col(idCol),
        codesExpr(col("_v"), p).cast("array<tinyint>").as("codes"))

  /** Approximate dot(q, row) from the codes column alone:
    * Σᵢ qᵢ·vminᵢ folds to one driver-side constant, leaving a lookup
    * fold over the d-length (qᵢ·Δᵢ) plan literal — no raw vector read.
    * Error is bounded by Σᵢ |qᵢ|·Δᵢ/2 (each dimension reconstructs
    * within half a grid step; SqIndexSpec asserts the bound row-wise). */
  def sqScore(codes: Column, q: Seq[Double], p: SqParams): Column = {
    require(q.length == p.dim,
      s"query dim ${q.length} != trained dim ${p.dim}")
    val base = q.iterator.zip(p.vmin.iterator).map { case (a, b) => a * b }.sum
    val qd = q.iterator.zip(p.delta.iterator)
      .map { case (a, b) => a * b }.toIndexedSeq
    // native codegen'd kernel — bit-identical fold to [[sqScoreHof]]
    // (SqIndexSpec pins equality); the scan over the codes table is THE
    // hot path of a compressed index, so it must not run through
    // interpreted per-element lambda plumbing
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(graft.expressions.SqScoreExpr(
      Bridge.expression(codes), base, qd))
  }

  /** The higher-order-function twin of [[sqScore]] — retained as the
    * readable specification of the fold (and the parity oracle
    * SqIndexSpec asserts the native kernel against); not on any hot
    * path. */
  private[graft] def sqScoreHof(codes: Column, q: Seq[Double],
                                p: SqParams): Column = {
    require(q.length == p.dim,
      s"query dim ${q.length} != trained dim ${p.dim}")
    val base = q.iterator.zip(p.vmin.iterator).map { case (a, b) => a * b }.sum
    val qd = typedlit(q.iterator.zip(p.delta.iterator)
      .map { case (a, b) => a * b }.toIndexedSeq)
    aggregate(sequence(lit(0), lit(p.dim - 1)), lit(base),
      (acc, i) => acc
        + element_at(qd, i + 1) * element_at(codes, i + 1).cast("int"))
  }

  /** Quantized top-k over the codes table: (idCol, sim, rank) where sim
    * is the round(·,4) APPROXIMATE dot. Global top-k is
    * `TakeOrderedAndProject` — each partition ships k rows. */
  def search(encoded: DataFrame, idCol: String, q: Seq[Double],
             p: SqParams, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    encoded
      .select(col(idCol), round(sqScore(col("codes"), q, p), 4).as("sim"))
      .filter(col("sim").isNotNull)
      .orderBy(desc("sim"), asc(idCol))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("sim"), asc(idCol))))
  }

  /** Quantized candidates + EXACT re-rank: top `r` rows by quantized
    * score, raw vectors fetched by an `r`-bounded broadcast join (the
    * corpus side never shuffles), exact top-k kept. `r = corpus size`
    * degenerates to exact brute force (SqIndexSpec asserts); the
    * practical dial is certified by the `sq_recall` row. */
  def searchRerank(encoded: DataFrame, corpus: DataFrame, idCol: String,
                   vecCol: String, q: Seq[Double], p: SqParams,
                   k: Int, r: Int,
                   score: (Column, Column) => Column = dot): DataFrame = {
    require(r >= k, s"rerank depth r=$r must be >= k=$k")
    val cands = encoded
      .select(col(idCol), round(sqScore(col("codes"), q, p), 4).as("_sq"))
      .filter(col("_sq").isNotNull)
      .orderBy(desc("_sq"), asc(idCol))
      .limit(r)
      .select(col(idCol))
    PqIndex.exactRerank(cands, corpus, idCol, vecCol, q, k, score)
  }

  /** Batched multi-query quantized search — the production serving
    * shape: ONE scan of the codes table answers EVERY query (the
    * [[IvfIndex.probeMany]] amortization, here over the compressed
    * relation). The query batch rides in by broadcast carrying its
    * precomputed (qᵢ·Δᵢ) array and Σᵢ qᵢ·vminᵢ base term; per-row cost
    * per query is the same lookup fold as [[sqScore]] with the table as
    * a broadcast COLUMN instead of a plan literal. Per-query top-r is
    * the map-side bounded [[graft.functions.TopKAggregator]] (each task
    * ships ≤ r rows per query — the shuffle never carries the corpus),
    * then the r-bounded candidate set re-ranks exactly through a
    * broadcast join back to the raw vectors, per-query top-k by the
    * same aggregator. Ids must be integral (the aggregator carries
    * (sim, long-id) pairs — the probeMany contract). */
  def searchManyRerank(encoded: DataFrame, corpus: DataFrame,
                       idCol: String, vecCol: String,
                       queries: DataFrame, qIdCol: String, qVecCol: String,
                       p: SqParams, k: Int, r: Int): DataFrame = {
    require(r >= k, s"rerank depth r=$r must be >= k=$k")
    val vminL = typedlit(p.vmin)
    val deltaL = typedlit(p.delta)
    // two projections (the probeMany lateral-alias rule): normalize
    // first, derive the ADC terms from the alias in a second select
    val base = queries.select(col(qIdCol).as("qid"),
      transform(col(qVecCol), _.cast("double")).as("qvec"))
    val qs = base.select(col("qid"), col("qvec"),
      zip_with(col("qvec"), deltaL, (a, b) => a * b).as("_qd"),
      aggregate(zip_with(col("qvec"), vminL, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x).as("_qbase"))
    val scored = encoded
      .crossJoin(broadcast(qs.select(col("qid"), col("_qd"), col("_qbase"))))
      .select(col("qid"), col(idCol).cast("long").as(idCol),
        round(col("_qbase")
          + aggregate(sequence(lit(0), lit(p.dim - 1)), lit(0.0),
            (acc, i) => acc + element_at(col("_qd"), i + 1)
              * element_at(col("codes"), i + 1).cast("int")), 4).as("_sq"))
      .filter(col("_sq").isNotNull)
    val topr = udaf(new graft.functions.TopKAggregator(r))
    val cands = scored.groupBy(col("qid"))
      .agg(topr(col("_sq"), col(idCol)).as("_top"))
      .select(col("qid"), explode(col("_top")).as("_hit"))
      .select(col("qid"), col("_hit._2").as(idCol))
    val exact = corpus
      .select(col(idCol).cast("long").as(idCol), col(vecCol))
      .join(broadcast(cands), idCol)
      .join(broadcast(base), "qid")
      .select(col("qid"), col(idCol),
        round(dot(col(vecCol), col("qvec")), 4).as("sim"))
      .filter(col("sim").isNotNull)
    val topk = udaf(new graft.functions.TopKAggregator(k))
    exact.groupBy(col("qid"))
      .agg(topk(col("sim"), col(idCol)).as("_top"))
      .select(col("qid"), posexplode(col("_top")).as(Seq("_pos", "_hit")))
      .select(col("qid"), col("_hit._2").as(idCol),
        col("_hit._1").as("sim"), (col("_pos") + 1).as("rank"))
  }
}
