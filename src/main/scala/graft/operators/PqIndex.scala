package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Product quantization (PQ) — the memory-compressed ANN scale path
  * (Jégou/Douze/Schmid 2011, "Product Quantization for Nearest Neighbor
  * Search", public): split each d-dim vector into `m` contiguous
  * subvectors, k-means each subspace into `ks` cells, and store every
  * vector as `m` small codes instead of d floats. A 64-dim float vector
  * (256 B) becomes 8 bytes at m=8 — a 32× compression that keeps the
  * WHOLE corpus's codes resident where raw vectors would spill, which is
  * the difference between scanning RAM and scanning disk at 10^11 rows.
  * Search is asymmetric distance computation (ADC): the query is NOT
  * quantized — a per-query m×ks table of subspace dot products is
  * computed driver-side (tiny) and each row's approximate similarity is
  * `m` table lookups, no float math per dimension.
  *
  * Spark-first shape, same discipline as [[IvfIndex]]:
  *   - TRAIN: joint Lloyd iterations over ALL subspaces in ONE
  *     distributed job each — assignment is a zero-shuffle projection
  *     (the whole m×ks codebook is a single `typedlit` constant; each
  *     row folds each subvector over its subspace's cells keeping the
  *     (dist, code) lexicographic min), update is one partial-aggregated
  *     exchange of (subspace, code, subdim) sums — m·ks·(d/m) = ks·d
  *     tiny rows to the driver, never vectors;
  *   - ENCODE: pure projection → (id, array<tinyint> of length m);
  *   - SEARCH: ADC lookup fold (projection) → global top-k
  *     (`TakeOrderedAndProject`); optional exact re-rank of the top `r`
  *     ADC candidates via a broadcast join back to the raw vectors —
  *     r is k-bounded, so the corpus-sized side never shuffles.
  *
  * Codes are SIGNED bytes, so `ks <= 127` (the classic 8-bit/256-cell
  * PQ would store code-128; not worth the offset arithmetic here).
  * Determinism: init is the ks smallest-id vectors' subvectors (fixed,
  * seedless, mirroring [[IvfIndex.build]]); float-iterative means PQ
  * rows are validated by invariant/recall tests, not the byte-exact
  * oracle (SURVEY.md §7.3).
  */
object PqIndex {

  /** Per-subspace codebooks: `codebooks(mi)` lists (code, subcentroid)
    * for subspace `mi`, subcentroid length = d/m. */
  type Codebooks = IndexedSeq[IndexedSeq[(Int, IndexedSeq[Double])]]

  /** Train per-subspace codebooks with joint Lloyd iterations — one
    * distributed job per iteration regardless of `m`. */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int, ks: Int, iters: Int): Codebooks = {
    require(m >= 1 && ks >= 1 && iters >= 1, "need m, ks, iters >= 1")
    require(ks <= 127, s"ks=$ks: codes are signed bytes, so ks <= 127")
    val vecs = corpus.select(col(idCol).as("_id"),
      transform(col(vecCol), _.cast("double")).as("_v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // deterministic init (the IvfIndex discipline): subvectors of the
      // ks smallest-id vectors; doubles as the working set's first
      // materialization. A corpus smaller than ks just gets fewer cells.
      val initRows = vecs.orderBy("_id").limit(ks).collect()
      require(initRows.nonEmpty, "cannot train PQ on an empty corpus")
      val d = initRows.head.getSeq[Double](1).length
      require(d % m == 0, s"vector dim $d not divisible by m=$m")
      val dsub = d / m
      var cb: Codebooks = IndexedSeq.tabulate(m) { mi =>
        initRows.toIndexedSeq.zipWithIndex.map { case (r, c) =>
          (c, r.getSeq[Double](1).slice(mi * dsub, (mi + 1) * dsub)
            .toIndexedSeq)
        }
      }
      for (_ <- 0 until iters) {
        // ONE exchange: (subspace, code, subdim) partial sums — map-side
        // combinable, ks·d rows total back to the driver
        val sums = vecs.withColumn("_codes", codesExpr(cb, dsub))
          .select(col("_codes"), posexplode(col("_v")).as(Seq("dim", "x")))
          .select((col("dim") / lit(dsub)).cast("int").as("mi"),
            element_at(col("_codes"),
              (col("dim") / lit(dsub)).cast("int") + 1).as("code"),
            (col("dim") % lit(dsub)).as("sd"), col("x"))
          .groupBy(col("mi"), col("code"), col("sd"))
          .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
          .collect()
        // a dimension beyond the seed vectors' length means a RAGGED
        // corpus: its subspace index lands past the codebook and its
        // code lookup is null — fail loudly (the IvfIndex.build rule)
        // rather than silently train on garbage cells
        sums.foreach { r =>
          require(!r.isNullAt(1) && r.getInt(0) < m,
            "ragged corpus: saw a dimension beyond the seed vectors' " +
              "length — vector lengths must be uniform across the corpus")
        }
        val byCell = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
        cb = cb.zipWithIndex.map { case (cells, mi) =>
          cells.map { case (c, prev) =>
            byCell.get((mi, c)) match {
              case Some(rows) =>
                val mvec = new Array[Double](dsub)
                rows.foreach { r =>
                  mvec(r.getInt(2)) = r.getDouble(3) / r.getLong(4)
                }
                (c, mvec.toIndexedSeq)
              // empty cell keeps its previous subcentroid (cell count
              // never silently shrinks — same rule as IvfIndex.build)
              case None => (c, prev)
            }
          }
        }
      }
      cb
    } finally { vecs.unpersist(); () }
  }

  /** The whole codebook as ONE Catalyst literal
    * (array<array<struct<_1:int,_2:array<double>>>>) — the typedlit
    * discipline: one expression node regardless of m·ks·d. */
  private def cbLit(cb: Codebooks): Column =
    typedlit(cb.map(_.map { case (c, v) => (c, v.toSeq) }.toSeq).toSeq)

  /** Per-row code assignment as a pure projection: for each subspace,
    * fold its cells keeping the lexicographic (dist, code) min — the
    * [[IvfIndex.withCluster]] argmin shape, once per subspace. */
  private def codesExpr(cb: Codebooks, dsub: Int): Column =
    transform(sequence(lit(0), lit(cb.length - 1)), mi => {
      val sub = slice(col("_v"), mi * dsub + 1, lit(dsub))
      aggregate(element_at(cbLit(cb), mi + 1),
        struct(lit(Double.PositiveInfinity).as("dist"),
          lit(Int.MaxValue).as("cid")),
        (acc, e) => least(acc,
          struct(l2Dist(sub, e.getField("_2")).as("dist"),
            e.getField("_1").as("cid"))))
        .getField("cid")
    })

  /** Encode the corpus: (idCol, codes array<tinyint> of length m) — the
    * compressed representation a cluster persists as the PQ table. Pure
    * projection, embarrassingly parallel. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             cb: Codebooks): DataFrame = {
    val dsub = cb.head.head._2.length
    corpus.select(col(idCol),
      transform(col(vecCol), _.cast("double")).as("_v"))
      .select(col(idCol),
        codesExpr(cb, dsub).cast("array<tinyint>").as("codes"))
  }

  /** The per-query ADC lookup table, flattened driver-side:
    * entry mi·ks + c = dot(q's subvector mi, codebook cell (mi, c)).
    * m·ks doubles — constant-foldable plan literal. */
  private def adcTable(q: Seq[Double], cb: Codebooks): IndexedSeq[Double] = {
    val dsub = cb.head.head._2.length
    val ks = cb.head.length
    val flat = new Array[Double](cb.length * ks)
    cb.zipWithIndex.foreach { case (cells, mi) =>
      val qsub = q.slice(mi * dsub, (mi + 1) * dsub)
      cells.foreach { case (c, cent) =>
        var s = 0.0
        var i = 0
        while (i < dsub) { s += qsub(i) * cent(i); i += 1 }
        flat(mi * ks + c) = s
      }
    }
    flat.toIndexedSeq
  }

  /** Approximate dot(q, row) from the codes column alone: `m` table
    * lookups folded in sequence — no per-dimension float math, no raw
    * vector read. Backed by the native codegen'd
    * [[graft.expressions.PqAdcScoreExpr]] — bit-identical fold to
    * [[adcScoreHof]] on valid codes (PqIndexSpec pins equality): the
    * ADC scan over the compressed table is THE hot path of the index,
    * so it must not run through interpreted per-element lambdas. */
  def adcScore(codes: Column, q: Seq[Double], cb: Codebooks): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(graft.expressions.PqAdcScoreExpr(
      Bridge.expression(codes), adcTable(q, cb), cb.head.length))
  }

  /** The higher-order-function twin of [[adcScore]] — retained as the
    * readable fold specification and the parity oracle PqIndexSpec
    * asserts the native kernel against; not on any hot path. */
  private[graft] def adcScoreHof(codes: Column, q: Seq[Double],
                                 cb: Codebooks): Column = {
    val ks = cb.head.length
    val tab = typedlit(adcTable(q, cb))
    aggregate(sequence(lit(0), lit(cb.length - 1)), lit(0.0),
      (acc, mi) => acc +
        element_at(tab, mi * ks + element_at(codes, mi + 1).cast("int") + 1))
  }

  /** ADC top-k over the encoded table: (idCol, sim, rank) where sim is
    * the round(·,4) APPROXIMATE dot. Global top-k is
    * `TakeOrderedAndProject` — each partition ships k rows. */
  def search(encoded: DataFrame, idCol: String, q: Seq[Double],
             cb: Codebooks, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = encoded
      .select(col(idCol), round(adcScore(col("codes"), q, cb), 4).as("sim"))
      .filter(col("sim").isNotNull)
      .orderBy(desc("sim"), asc(idCol))
      .limit(k)
    scored.withColumn("rank",
      row_number().over(Window.orderBy(desc("sim"), asc(idCol))))
  }

  /** ADC candidates + EXACT re-rank: take the top `r` rows by
    * approximate score, fetch their raw vectors (an `r`-bounded
    * broadcast join — the corpus side never shuffles), score exactly,
    * keep the top k. `r = corpus size` degenerates to exact brute force
    * (the completeness self-check PqIndexSpec asserts); the practical
    * dial is r = 3-10× k, certified by the `pq_recall` row. */
  def searchRerank(encoded: DataFrame, corpus: DataFrame, idCol: String,
                   vecCol: String, q: Seq[Double], cb: Codebooks,
                   k: Int, r: Int,
                   score: (Column, Column) => Column = dot): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(r >= k, s"rerank depth r=$r must be >= k=$k")
    val cands = encoded
      .select(col(idCol), round(adcScore(col("codes"), q, cb), 4).as("_adc"))
      .filter(col("_adc").isNotNull)
      .orderBy(desc("_adc"), asc(idCol))
      .limit(r)
      .select(col(idCol))
    exactRerank(cands, corpus, idCol, vecCol, q, k, score)
  }

  /** Shared candidate re-rank kernel (also used by [[SqIndex]]): fetch
    * the bounded candidate set's raw vectors via broadcast join, score
    * exactly, keep the top k. */
  private[operators] def exactRerank(cands: DataFrame, corpus: DataFrame,
                          idCol: String, vecCol: String, q: Seq[Double],
                          k: Int,
                          score: (Column, Column) => Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    corpus.join(broadcast(cands), idCol)
      .select(col(idCol),
        round(score(col(vecCol), vecLit(q)), 4).as("sim"))
      .filter(col("sim").isNotNull)
      .orderBy(desc("sim"), asc(idCol))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("sim"), asc(idCol))))
  }

  // --------------------------------------------------------------------
  // Residual IVF-PQ — the composed index (Jégou et al. 2011 §IV): IVF
  // supplies PARTITION PRUNING (probe nprobe of k cluster partitions),
  // PQ supplies the COMPRESSED SCAN inside them, and quantizing the
  // RESIDUAL (vec − its cluster centroid) instead of the raw vector
  // spends the code budget on the within-cell offset, which is where
  // the remaining variance lives once IVF has already explained the
  // coarse position. dot(q, x) = dot(q, c) + dot(q, x−c): the first
  // term is one per-probed-cluster driver constant, the second is the
  // standard ADC fold over the residual codebook — so probe cost is
  // (nprobe/k of the corpus) × m lookups per row, reading 1-byte codes.
  // --------------------------------------------------------------------

  /** (idCol, cluster_id, res) — each vector's residual against its
    * assigned cluster's centroid. The centroid set rides as one map
    * literal (cluster_id → centroid), so this is a pure projection over
    * `corpus ⋈ assignments` (one equi-join, no second pass). */
  def residuals(corpus: DataFrame, idCol: String, vecCol: String,
                assignments: DataFrame, centroids: DataFrame): DataFrame = {
    val centMap = typedlit(centroids.select(col("cluster_id"), col("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap)
    corpus.join(assignments, idCol)
      .select(col(idCol), col("cluster_id"),
        zip_with(col(vecCol), element_at(centMap, col("cluster_id")),
          (x, c) => x.cast("double") - c).as("res"))
  }

  /** Residual-encoded corpus: (idCol, cluster_id, codes). Write it
    * `partitionBy("cluster_id")` (after `repartition(cluster_id)` — the
    * IvfIndex.writePartitioned rule) and probes prune to the probed
    * cells' files. */
  def encodeResidual(corpus: DataFrame, idCol: String, vecCol: String,
                     assignments: DataFrame, centroids: DataFrame,
                     cb: Codebooks): DataFrame = {
    val res = residuals(corpus, idCol, vecCol, assignments, centroids)
    val dsub = cb.head.head._2.length
    res.select(col(idCol), col("cluster_id"), col("res").as("_v"))
      .select(col(idCol), col("cluster_id"),
        codesExpr(cb, dsub).cast("array<tinyint>").as("codes"))
  }

  /** IVF-PQ probe over a cluster-partitioned residual-codes table:
    * `cluster_id IN (nearest nprobe)` prunes partitions at planning
    * time; sim = dot(q, centroid) (a per-cluster map-literal lookup) +
    * residual ADC fold; global top-k. Optional exact re-rank of the top
    * `r` via [[exactRerank]] when `corpus` is given — rows-only
    * approximate otherwise. */
  def probeIvfPq(spark: org.apache.spark.sql.SparkSession, codesPath: String,
                 idCol: String, centroids: DataFrame, q: Seq[Double],
                 cb: Codebooks, k: Int, nprobe: Int,
                 rerank: Option[(DataFrame, String, Int)] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qlit = vecLit(q)
    // nearest-centroid resolution is k tiny driver rows — the
    // probePartitioned contract (same (dist, cid) ordering)
    val cents = centroids.select(col("cluster_id"), col("centroid")).collect()
      .toIndexedSeq.map(r => (r.getInt(0), r.getSeq[Double](1).toIndexedSeq))
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val near = cents.sortBy { case (cid, c) => (l2(c, q), cid) }
      .take(nprobe).map(_._1)
    // dot(q, centroid) per probed cluster — the coarse term, nprobe
    // driver-side doubles as one map literal
    val qcMap = typedlit(near.map { cid =>
      val c = cents.find(_._1 == cid).get._2
      cid -> c.zip(q).map { case (ci, qi) => ci * qi }.sum
    }.toMap)
    val scored = spark.read.parquet(codesPath)
      .filter(col("cluster_id").isin(near: _*))
      .select(col(idCol),
        round(element_at(qcMap, col("cluster_id"))
          + adcScore(col("codes"), q, cb), 4).as("sim"))
      .filter(col("sim").isNotNull)
    rerank match {
      case None =>
        scored.orderBy(desc("sim"), asc(idCol)).limit(k)
          .withColumn("rank",
            row_number().over(Window.orderBy(desc("sim"), asc(idCol))))
      case Some((corpus, vecCol, r)) =>
        require(r >= k, s"rerank depth r=$r must be >= k=$k")
        val cands = scored.orderBy(desc("sim"), asc(idCol)).limit(r)
          .select(col(idCol))
        exactRerank(cands, corpus, idCol, vecCol, q, k, dot)
    }
  }
}
