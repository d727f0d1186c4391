package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Embedder, TransformerEmbedder, VectorFunctions}
import graft.functions.VectorFunctions._
import graft.operators.{Decontaminate, Dedup, Expectations, Forget, IvfIndex, LangId, Multimodal, NearDup, PdfText, PqIndex, Sampling, Search, Sketch, SpanDedup, SqIndex, TextAnalysis, TextIndex}
import graft.sources.{IncrementalView, VersionedCorpus}
import graft.streaming.Streams

/** One declared query: the Spark build plus (when SQL-expressible) the
  * DuckDB oracle that must hash-match it on the same parquet fixtures. */
final case class DeclaredQuery(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

/** The engine's declared query set — one entry per implemented operator
  * from SURVEY.md §2, wired into `SparkEntry.queries` / `oracleSql`.
  *
  * Determinism contract (SURVEY.md §7.5) for every query:
  *   - every output row order is pinned by a unique key suffix;
  *   - float outputs are `round(x, 4)` (mirroring the reference's 4-decimal
  *     display contract, reference `app.py:91`);
  *   - large double sums go through an exact DECIMAL(18,4) per-row cast so
  *     partial-aggregation order (Spark) vs single-threaded order (DuckDB)
  *     cannot change the result;
  *   - aggregates over BIGINT are cast to BIGINT on the DuckDB side
  *     (DuckDB widens integer sums to HUGEINT, Spark keeps LongType).
  */
object Queries {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Exact decimal sum of a double column — deterministic under any
    * partitioning; see class doc. */
  private def decSum(c: Column): Column = sum(c.cast(DecimalType(18, 4)))

  private def dbl(c: Column): Column = c.cast("double")
  private def r4(c: Column): Column = round(c, 4)

  /** Deterministic-seeded transformer weight artifact, written once per
    * driver JVM (a cluster run distributes the same file via addFile /
    * shared store — executors only ever READ it through the session
    * cache). Lazy so sessions that never touch the model row never pay
    * the write. */
  private lazy val transformerArtifactPath: String = {
    val p = java.nio.file.Files.createTempFile("graft-gtfe", ".bin")
    p.toFile.deleteOnExit()
    TransformerEmbedder.writeRandom(p.toString)
    p.toString
  }

  private val q1Sql = QueryVectors.sql(QueryVectors.q1)
  private val q2Sql = QueryVectors.sql(QueryVectors.q2)

  /** DuckDB double-precision dot product matching `VectorFunctions.dot`. */
  private def duckDot(a: String, b: String) =
    s"list_dot_product(CAST($a AS DOUBLE[]), $b)"

  /** media_ann's query vector: the REAL decoded features of fixture
    * image 6 (w 38, h 30, rgb (102, 174, 2)) — computed once at init by
    * the same codec the query runs, so the Spark side and the SQL
    * literal below can only agree if the decode is deterministic. */
  private val mediaAnnQuery: Array[Float] =
    graft.operators.JvmCodec.decodeImage(graft.operators.JvmCodec.encodePng(
      graft.operators.JvmCodec.solidImage(38, 30, 102, 174, 2))).get.features
  private val mediaAnnQuerySql: String =
    mediaAnnQuery.map(f => f.toDouble.toString).mkString("[", ", ", "]")

  /** the expectation rules of the q_expect_* pair, in declaration order
    * (the quarantine lists preserve it). */
  private def docRules: Seq[graft.operators.Expectations.Rule] = {
    import graft.operators.Expectations.Rule
    Seq(
      Rule("len_max", col("n_chars") <= 400),
      Rule("lang_known", col("lang").isin("en", "de", "fr")),
      Rule("text_nonempty", length(col("text")) > 0),
      Rule("len_consistent", length(col("text")) === col("n_chars")))
  }

  /** The `ann_lsh` oracle, GENERATED from the same deterministic
    * exact-decimal hyperplanes the operator uses
    * ([[graft.operators.HyperplaneLsh.planes]]): per-row bucket =
    * Σ 2^b over planes with dot(v, p_b) > 0, restricted to the
    * driver-computed multi-probe set, exact dot re-rank. The 6-decimal
    * plane components parse to bit-identical doubles in both engines
    * (the QueryVectors discipline). */
  private lazy val annLshOracleSql: String = {
    val nBits = 6
    val ps = graft.operators.HyperplaneLsh.planes(QueryVectors.dim, nBits)
    def planeSql(p: IndexedSeq[Double]): String =
      p.map(d => "%.6f".formatLocal(java.util.Locale.ROOT, d))
        .mkString("[", ",", "]") + "::DOUBLE[]"
    val bucket = ps.zipWithIndex.map { case (p, b) =>
      s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), " +
        s"${planeSql(p)}) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    val probes = graft.operators.HyperplaneLsh
      .probeSet(QueryVectors.q1, ps).mkString(", ")
    s"""WITH b AS (
       |  SELECT vec_id, embedding, $bucket AS bucket FROM embeddings)
       |SELECT vec_id,
       |  round(${duckDot("embedding", q1Sql)}, 4) AS sim
       |FROM b WHERE bucket IN ($probes)
       |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
  }

  /** The JL query family's shared literals: the 16×64 Rademacher ±0.25
    * projection matrix ([[VectorFunctions.jlMatrix]] — entries are
    * exact binary fractions) and the pre-projected query vector, used
    * by BOTH the Spark plans and the GENERATED DuckDB SQL so the two
    * engines compute from bit-identical doubles (the QueryVectors
    * discipline applied to a whole matrix). */
  private lazy val jlM: Seq[IndexedSeq[Double]] =
    VectorFunctions.jlMatrix(16, QueryVectors.dim)
  private lazy val jlQ1: IndexedSeq[Double] = jlM
    .map(r => r.zip(QueryVectors.q1).map { case (a, b) => a * b }.sum)
    .toIndexedSeq
  private def jlListSql(v: Seq[Double]): String =
    v.map(_.toString).mkString("[", ",", "]") + "::DOUBLE[]"
  /** `[dot(e,row_0), …, dot(e,row_15)]` — the projected vector in SQL. */
  private lazy val jlProjSql: String =
    jlM.map(r => duckDot("embedding", jlListSql(r))).mkString("[", ", ", "]")
  private lazy val jlPsimSql: String =
    s"round(list_dot_product(${jlListSql(jlQ1)}, $jlProjSql), 4)"

  /** The `near_dup_embed_lsh` oracle — the whole SCALE-path LSH chain
    * replayed by DuckDB, including the occupancy-constant banding
    * formula: nbits = max(6, ⌈log2(n/4)⌉) computed FROM THE TABLE (so
    * the oracle tracks the corpus size exactly as the operator does),
    * 16 statically-generated exact-decimal plane literals of which the
    * first nbits are active (plane components depend only on (dim,
    * plane) — never on nbits), and the 1-bit multiprobe candidate rule
    * expressed as hamming(bucket_a, bucket_b) ≤ 1 (equivalent to the
    * probe-set formulation since buckets only set active bits). The
    * replay join is deliberately quadratic in candidate GENERATION
    * (n² bucket comparisons — fine at fixture scale); the operator's
    * claim is that its bucket join yields the SAME pairs without ever
    * forming n². */
  /** The sign-LSH bucket fold as SQL: 16 statically-generated
    * exact-decimal plane literals, of which the first `nbits` (a column
    * from a CROSS JOINed meta CTE) are active. Plane components depend
    * only on (dim, plane) — never on nbits — so one literal set serves
    * every corpus size. */
  private lazy val lshBucketCaseSql: String = {
    val ps = graft.operators.HyperplaneLsh.planes(QueryVectors.dim, 16)
    def planeSql(p: IndexedSeq[Double]): String =
      p.map(d => "%.6f".formatLocal(java.util.Locale.ROOT, d))
        .mkString("[", ",", "]") + "::DOUBLE[]"
    ps.zipWithIndex.map { case (p, b) =>
      s"(CASE WHEN $b < nbits AND list_dot_product(" +
        s"CAST(embedding AS DOUBLE[]), ${planeSql(p)}) > 0 " +
        s"THEN ${1L << b} ELSE 0 END)"
    }.mkString("\n      + ")
  }

  private lazy val nearDupEmbedLshOracleSql: String = {
    val bucket = lshBucketCaseSql
    s"""WITH meta AS (
       |  SELECT greatest(6, CAST(ceil(log2(count(*) / 4.0)) AS INT))
       |    AS nbits
       |  FROM embeddings),
       |bkt AS (
       |  SELECT vec_id, embedding,
       |    $bucket AS bucket
       |  FROM embeddings CROSS JOIN meta),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |         a.embedding AS va, b.embedding AS vb
       |  FROM bkt a JOIN bkt b
       |    ON a.vec_id < b.vec_id
       |   AND bit_count(xor(a.bucket, b.bucket)) <= 1)
       |SELECT id_a, id_b, cos FROM (
       |  SELECT id_a, id_b,
       |    round(list_dot_product(CAST(va AS DOUBLE[]), CAST(vb AS DOUBLE[]))
       |      / (sqrt(list_dot_product(CAST(va AS DOUBLE[]),
       |                               CAST(va AS DOUBLE[])))
       |         * sqrt(list_dot_product(CAST(vb AS DOUBLE[]),
       |                                 CAST(vb AS DOUBLE[])))), 4) AS cos
       |  FROM pairs)
       |WHERE cos >= 0.3 ORDER BY id_a, id_b""".stripMargin
  }

  /** The `incr_near_dup_embed` oracle — the CROSS-SET twin of
    * [[nearDupEmbedLshOracleSql]]: nbits sized from the CORPUS side
    * only (the operator's occupancy rule), candidate pairs restricted
    * to incoming×corpus, same hamming ≤ 1 multiprobe equivalence. */
  private lazy val incrNearDupEmbedOracleSql: String = {
    val bucket = lshBucketCaseSql
    s"""WITH meta AS (
       |  SELECT greatest(6, CAST(ceil(log2(count(*) / 4.0)) AS INT))
       |    AS nbits
       |  FROM embeddings WHERE vec_id % 5 <> 0),
       |bkt AS (
       |  SELECT vec_id, embedding,
       |    $bucket AS bucket
       |  FROM embeddings CROSS JOIN meta),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |         a.embedding AS va, b.embedding AS vb
       |  FROM bkt a JOIN bkt b
       |    ON a.vec_id % 5 = 0 AND b.vec_id % 5 <> 0
       |   AND bit_count(xor(a.bucket, b.bucket)) <= 1)
       |SELECT id_a, id_b, cos FROM (
       |  SELECT id_a, id_b,
       |    round(list_dot_product(CAST(va AS DOUBLE[]), CAST(vb AS DOUBLE[]))
       |      / (sqrt(list_dot_product(CAST(va AS DOUBLE[]),
       |                               CAST(va AS DOUBLE[])))
       |         * sqrt(list_dot_product(CAST(vb AS DOUBLE[]),
       |                                 CAST(vb AS DOUBLE[])))), 4) AS cos
       |  FROM pairs)
       |WHERE cos >= 0.3 ORDER BY id_a, id_b""".stripMargin
  }

  /** The `incr_admit_vec` oracle — the full vector-tier ADMISSION
    * decision replayed: an incoming vector is rejected iff some corpus
    * vector shares a bucket within hamming 1 (fixed nbits = 8, the
    * `admitIncomingVectors` default) AND verifies at rounded cosine
    * ≥ 0.3; admissions aggregate per id-bucket. */
  private lazy val incrAdmitVecOracleSql: String = {
    val bucket = lshBucketCaseSql
    s"""WITH meta AS (SELECT 8 AS nbits),
       |bkt AS (
       |  SELECT vec_id, embedding,
       |    $bucket AS bucket
       |  FROM embeddings CROSS JOIN meta),
       |dup_new AS (
       |  SELECT DISTINCT a.vec_id
       |  FROM bkt a JOIN bkt b
       |    ON a.vec_id % 5 = 0 AND b.vec_id % 5 <> 0
       |   AND bit_count(xor(a.bucket, b.bucket)) <= 1
       |  WHERE round(
       |      list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |                       CAST(b.embedding AS DOUBLE[]))
       |      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |                               CAST(a.embedding AS DOUBLE[])))
       |         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
       |                                 CAST(b.embedding AS DOUBLE[])))),
       |      4) >= 0.3)
       |SELECT vec_id % 100 AS id_bucket, count(*) AS n_admitted,
       |       min(vec_id) AS first_id
       |FROM embeddings
       |WHERE vec_id % 5 = 0
       |  AND vec_id NOT IN (SELECT vec_id FROM dup_new)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The `incr_sq_append` oracle — frozen-grid incremental SQ8
    * maintenance replayed end to end: the day-1 grid (min/max over the
    * `vec_id % 10 <> 0` slice only), every row of corpus ∪ batch
    * encoded under it (out-of-grid day-2 values CLIP at the edges —
    * the operator's documented drift hazard, reproduced by the
    * least/greatest clamp), quantized top-50 cut, exact re-rank top-10,
    * full-outer joined against the exact brute-force top-10 with the
    * per-row match column. */
  private lazy val incrSqAppendOracleSql: String =
    s"""WITH grid AS (
       |  SELECT i, min(embedding[i]::DOUBLE) AS lo,
       |    (max(embedding[i]::DOUBLE) - min(embedding[i]::DOUBLE)) / 127
       |      AS dlt
       |  FROM embeddings, (SELECT unnest(range(1,65)) AS i) d
       |  WHERE vec_id % 10 <> 0
       |  GROUP BY i),
       |g AS (SELECT list(lo ORDER BY i) AS vmin,
       |             list(dlt ORDER BY i) AS dlt FROM grid),
       |scored AS (
       |  SELECT e.vec_id,
       |    round(list_dot_product($q1Sql, vmin)
       |      + list_sum(list_transform(range(1,65), i ->
       |          ($q1Sql)[i] * dlt[i] * (CASE WHEN dlt[i] = 0 THEN 0
       |            ELSE least(127, greatest(0,
       |              CAST(round((e.embedding[i]::DOUBLE - vmin[i])
       |                / dlt[i]) AS INT))) END))), 4) AS sq
       |  FROM embeddings e CROSS JOIN g),
       |cand AS (SELECT vec_id FROM scored ORDER BY sq DESC, vec_id
       |         LIMIT 50),
       |probed AS (
       |  SELECT vec_id, sim FROM (
       |    SELECT e.vec_id,
       |      round(${duckDot("e.embedding", q1Sql)}, 4) AS sim,
       |      row_number() OVER (ORDER BY
       |        round(${duckDot("e.embedding", q1Sql)}, 4) DESC,
       |        e.vec_id) AS rn
       |    FROM embeddings e JOIN cand USING (vec_id))
       |  WHERE rn <= 10),
       |exact AS (
       |  SELECT vec_id,
       |    round(${duckDot("embedding", q1Sql)}, 4) AS sim_exact
       |  FROM embeddings ORDER BY sim_exact DESC, vec_id LIMIT 10)
       |SELECT vec_id, p.sim, x.sim_exact, (p.sim = x.sim_exact) AS matches
       |FROM probed p FULL OUTER JOIN exact x USING (vec_id)
       |ORDER BY p.sim DESC, vec_id""".stripMargin

  /** The `q_bpe_budget` oracle, GENERATED from the checked-in merges
    * table ([[graft.functions.BpeTokenizer.default]]): per word, build a
    * \u0001-separated symbol string ("␁c␁h␁a␁r</w>␁" — the end-of-word
    * marker fused onto the final char exactly like `encodeWord`), fold
    * the 93 merges as boundary-aware `replace` calls in rank order, and
    * count pieces as separators − 1. `replace` is left-to-right
    * non-overlapping — the same scan as one encoder merge pass — and
    * rank-order sequencing reproduces the best-first loop because no
    * compound in the learned table has two derivations (empirically
    * exhaustive on both fixtures; see the q_bpe_budget comment).
    * Docs with no words LEFT-JOIN back in with n_bpe = 0, mirroring
    * `size(graft_bpe(text)) == 0`. */
  /** Shared per-doc BPE-count CTE block (w → p → wc): whitespace words,
    * the merges-table replace chain per word, summed piece counts per
    * doc. Consumed by BOTH bpe oracle replays. */
  private lazy val bpePerDocCtes: String = {
    val sep = "\u0001"
    val chain = graft.functions.BpeTokenizer.default.merges.foldLeft(
      "substr(s0, 1, length(s0)-1) || '</w>' || chr(1)") {
      case (acc, (a, b)) =>
        s"replace($acc, '$sep$a$sep$b$sep', '$sep$a$b$sep')"
    }
    s"""w AS (
       |  SELECT doc_id, u.word AS word
       |  FROM documents,
       |    UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS u(word)
       |), p AS (
       |  SELECT doc_id, $chain AS s
       |  FROM (SELECT doc_id,
       |          chr(1) || regexp_replace(word, '(.)', '\\1' || chr(1), 'g') AS s0
       |        FROM w)
       |), wc AS (
       |  SELECT doc_id,
       |    CAST(sum(length(s) - length(replace(s, chr(1), '')) - 1) AS BIGINT) AS n_bpe
       |  FROM p GROUP BY doc_id
       |)""".stripMargin
  }

  private lazy val bpeBudgetOracleSql: String =
    s"""WITH $bpePerDocCtes, d AS (
       |  SELECT doc_id, lang, COALESCE(wc.n_bpe, 0) AS n_bpe
       |  FROM documents LEFT JOIN wc USING (doc_id)
       |), c AS (
       |  SELECT doc_id, lang, n_bpe,
       |    CAST(sum(n_bpe) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_bpe
       |  FROM d)
       |SELECT doc_id, lang, n_bpe, cum_bpe FROM c WHERE cum_bpe <= 2000
       |ORDER BY lang, doc_id""".stripMargin

  /** The `q_bpe_tokens` oracle: per-doc REAL-BPE subword count (the
    * same merges-chain replay as `q_bpe_budget`, proven equivalent to
    * the best-first merge loop on every fixture word) next to the
    * whitespace-token count. */
  private lazy val bpeTokensOracleSql: String =
    s"""WITH $bpePerDocCtes
       |SELECT doc_id,
       |  CAST(COALESCE(wc.n_bpe, 0) AS BIGINT) AS n_bpe,
       |  CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
       |    AS BIGINT) AS n_ws
       |FROM documents LEFT JOIN wc USING (doc_id)
       |ORDER BY doc_id LIMIT 1000""".stripMargin

  /** Eagerly execute `df` and return the result as a LocalRelation-backed
    * frame — the shared tail of every round-trip/materializing declared
    * query (the result is tiny; the point is truncating lineage so temp
    * dirs and cache entries can be released before returning). */
  private def localFrame(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)

  /** One shared IVF index per fixture dir: `ivf_probe` and
    * `ivf_probe_part` need (assignments, centroids) from the SAME k-means
    * parameters, and a declared-set pass (Verify, a Bench round) runs
    * both — without sharing, the set pays k-means twice. The shared form
    * is the AT-SCALE one: the indexed corpus written as a parquet table
    * PARTITIONED BY cluster_id (`IvfIndex.writePartitioned`) — the
    * driver holds only the k centroid rows and a path string, never a
    * corpus-sized collect (the earlier cache of collected assignment
    * rows was exactly the driver-side-materialization class the 100 TB
    * mandate forbids). Probes read the table back: `ivf_probe_part` via
    * partition pruning, `ivf_probe` via the semi-join shape over the
    * same distributed relation. The map is keyed by dir (ONE entry per
    * fixture dir) and the VALUE carries the source file's (mtime,
    * length) fingerprint: a mismatch rebuilds — and deletes the
    * superseded index dir — instead of serving stale assignments (same
    * guard as `Streams`' schema probe). */
  private final case class IvfBuilt(
      fingerprint: String,
      indexPath: String,
      centRows: Seq[org.apache.spark.sql.Row],
      centSchema: org.apache.spark.sql.types.StructType,
      k: Int,
      nprobe: Int)

  /** Shared-index handle consumed by the `ivf_*` queries: the partitioned
    * table's path, the (tiny) centroid relation, and the CORPUS-SCALED
    * operating point the build chose — probes must read the declared
    * `nprobe` from here, not hardcode one, so the `ivf_recall` row always
    * certifies the point the declared probes actually run at. */
  private[graft] final case class SharedIvf(
      indexPath: String, centroids: DataFrame, k: Int, nprobe: Int)

  private val ivfBuildCache =
    new java.util.concurrent.ConcurrentHashMap[String, IvfBuilt]()

  // staleness guards share Tables.fixtureFingerprint — ONE definition of
  // "the fixture regenerated", not one drifting copy per memo
  private def embFingerprint(dir: String): String =
    Tables.fixtureFingerprint(dir, "embeddings")

  /** The lazy `near_dup_embed_lsh` pipeline over a (vec_id, embedding)
    * frame with known (count, dim): sign-LSH bucket projection →
    * materialized candidate pairs → exact-cosine verify. The sizing rule
    * nBits ≈ log2(N / target occupancy) keeps per-bucket join fan-out
    * constant across SFs. Shared by the declared query (which persists
    * `base` and materializes around it) and `graft.tools.DumpPlans`
    * (which renders the verify-stage plan), so the rendered plan is the
    * executed one. */
  private[graft] def lshNearDupVerify(base: DataFrame, n: Long, d: Int): DataFrame = {
    val nBits = math.max(6,
      math.ceil(math.log(n / 4.0) / math.log(2.0)).toInt)
    val ps = graft.operators.HyperplaneLsh.planes(d, nBits)
    val bucketed = base.select(col("vec_id").as("_id"),
      graft.operators.HyperplaneLsh.bucketCol(col("embedding"), ps)
        .as("_bucket"))
    val cands = NearDup.embeddingCandidatesFromBuckets(bucketed, nBits)
    NearDup.cosineVerify(base, "vec_id", "embedding", cands)
      .filter(col("cos") >= 0.3)
  }

  /** Per-dir memo of the `dedup_clusters*` edge relation — the bounded
    * all-pairs Jaccard verification tier over the doc_id < 128 slice
    * (SQL-expressible, same shape as `jaccard_pairs`; bucketed LSH
    * candidates are the scale path for edge generation). Both declared
    * clustering rows (propagation and star contraction) consume the SAME
    * edges, and a set pass runs both — without sharing, the set would
    * pay the verify tier twice. The verified edge set is tiny by
    * construction (dup families inside a 128-doc slice), so the memo
    * holds the collected LocalRelation rows — driver-bounded, the
    * `materializePairs` class. Fingerprint-guarded like `ivfBuildCache`. */
  private val dedupEdgesCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      (String, Seq[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType)]()

  private[graft] def sharedDedupEdges(s: SparkSession, dir: String): DataFrame = {
    val fp = Tables.fixtureFingerprint(dir, "documents")
    val built = dedupEdgesCache.compute(dir, (_, cached) =>
      if (cached != null && cached._1 == fp) cached
      else {
        val sub = T(s, dir, "documents").filter(col("doc_id") < 128)
        // length-band prefilter (the set-similarity-join size bound):
        // J(A,B) ≥ 0.8 ⇒ min(|A|,|B|) ≥ 0.8·max(|A|,|B|), so pairs
        // outside the band can never verify — 0.79 leaves margin for the
        // 4-decimal rounding at the threshold. Result-identical, so the
        // oracle needs no mirror of it; halves the verify work here and
        // is the standard pruning step of a distributed similarity join.
        val sized = sub.select(col("doc_id"),
          size(array_distinct(NearDup.shingles(col("text"), 1))).as("_ns"))
        val pairs = sized.select(col("doc_id").as("id_a"), col("_ns").as("_na"))
          .crossJoin(sized.select(col("doc_id").as("id_b"), col("_ns").as("_nb")))
          .filter(col("id_a") < col("id_b") &&
            least(col("_na"), col("_nb")).cast("double") >=
              lit(0.79) * greatest(col("_na"), col("_nb")))
          .select(col("id_a"), col("id_b"))
        val edges = NearDup.materializePairs(
          NearDup.jaccardVerify(sub, "doc_id", "text", pairs, shingleSize = 1)
            .filter(col("jaccard") >= 0.8)
            .select(col("id_a"), col("id_b")))
        (fp, edges.collect().toSeq, edges.schema)
      })
    s.createDataFrame(java.util.Arrays.asList(built._2: _*), built._3)
  }

  /** Near-dup clustering end-to-end: similarity edges → connected
    * components → per-doc component id. Near-duplication is not
    * transitive, so pair-level dedup under-deletes; the component id IS
    * the dedup key (keep doc_id == component). Shared by the
    * `dedup_clusters` (min-label propagation) and `dedup_clusters_star`
    * (large-star/small-star contraction) declared rows — same edges,
    * same oracle, two clustering algorithms. */
  private def dedupClustersFrame(s: SparkSession, dir: String,
                                 starContraction: Boolean): DataFrame = {
    val sub = T(s, dir, "documents").filter(col("doc_id") < 128)
    // localFinishEdges = 256, NOT the 2^16 default: this row exists to
    // price the distributed contraction rounds, so the bound is set
    // well below the fixture's ~1.7k-edge verified dup graph — the loop
    // runs real distributed contraction rounds (measured: two) until a
    // generation fits 256 edges, then the driver finishes the geometric
    // tail exactly as it would at corpus scale.
    val cc = Dedup.connectedComponents(sub.select("doc_id"), "doc_id",
      sharedDedupEdges(s, dir), "id_a", "id_b",
      starContraction = starContraction, localFinishEdges = 256)
    try localFrame(cc.orderBy("doc_id"))
    finally cc.unpersist()
  }

  /** Per-dir memo of the propagation-mode COMPONENT LABELS over
    * [[sharedDedupEdges]] — the `sharedIvfIndex` discipline applied to
    * clustering: at corpus scale the component id of every document is
    * a MAINTAINED table (rebuilt when the corpus version changes, read
    * by every downstream consumer), not something each query re-derives,
    * so the rows that CONSUME labels (`dedup_clusters`,
    * `dedup_best_rep`) read this memo while the bench prices the build
    * once as the auditable `_dedup_cc_build` infra line. The LIVE
    * clustering paths stay benchmarked per-rep where the algorithm is
    * the point: `dedup_clusters_star` runs the full star contraction
    * and `dedup_pipeline_lsh` runs propagation over the (different)
    * MinHash edge set. Vertex slice is 128 docs by construction →
    * driver-bounded LocalRelation rows, fingerprint-guarded. */
  private val dedupLabelsCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      (String, Seq[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType)]()

  private[graft] def sharedDedupLabels(s: SparkSession, dir: String): DataFrame = {
    val fp = Tables.fixtureFingerprint(dir, "documents")
    val built = dedupLabelsCache.compute(dir, (_, cached) =>
      if (cached != null && cached._1 == fp) cached
      else {
        val sub = T(s, dir, "documents").filter(col("doc_id") < 128)
        val cc = Dedup.connectedComponents(sub.select("doc_id"), "doc_id",
          sharedDedupEdges(s, dir), "id_a", "id_b")
        try (fp, cc.collect().toSeq, cc.schema)
        finally cc.unpersist()
      })
    s.createDataFrame(java.util.Arrays.asList(built._2: _*), built._3)
  }

  /** The recursive-CTE oracle replaying the whole clustering chain —
    * shared verbatim by both declared clustering rows. */
  private val dedupClustersOracle: String =
    """WITH RECURSIVE
       |  d AS (
       |    SELECT doc_id,
       |      list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS s
       |    FROM documents WHERE doc_id < 128
       |      AND len(list_filter(string_split(text, ' '), x -> x <> '')) > 0),
       |  e AS (
       |    SELECT a.doc_id AS src, b.doc_id AS dst
       |    FROM d a JOIN d b ON a.doc_id <> b.doc_id
       |    WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
       |        / len(list_distinct(a.s || b.s)), 4) >= 0.8),
       |  r AS (
       |    SELECT doc_id AS v, doc_id AS comp FROM documents WHERE doc_id < 128
       |    UNION
       |    SELECT e.src, r.comp FROM e JOIN r ON r.v = e.dst
       |  )
       |SELECT v AS doc_id, min(comp) AS component FROM r GROUP BY v
       |ORDER BY doc_id""".stripMargin

  /** One shared MinHash-LSH verified-candidate relation per fixture dir:
    * `minhash_pairs` and `dedup_pipeline_lsh` both need the SAME
    * signature pass → band self-join → exact-Jaccard verify over the
    * documents table (default 32 hashes / 4 bands / 3-gram verify), and
    * a declared-set pass runs both — without sharing, the set pays the
    * corpus-wide signature scan twice. The verified pair set goes to
    * DISK as a parquet edge table and the memo holds only the PATH —
    * the `sharedIvfIndex` discipline: at web scale the verified dup-edge
    * relation is corpus-order (30-50 % dup rates), so it must never ride
    * through the driver; consumers re-read the table, exactly as a
    * cluster deployment reads the edge table its candidate job
    * persisted. Fingerprint-guarded, one entry per dir (same bound as
    * `ivfBuildCache` / `Streams.nanosCache`). */
  private final case class MinhashEdges(fingerprint: String, path: String)

  private val minhashEdgeCache =
    new java.util.concurrent.ConcurrentHashMap[String, MinhashEdges]()

  private def docsFingerprint(dir: String): String =
    Tables.fixtureFingerprint(dir, "documents")

  private[graft] def sharedMinhashVerified(s: SparkSession, dir: String): DataFrame = {
    val fp = docsFingerprint(dir)
    val built = minhashEdgeCache.compute(dir, (_, cached) =>
      if (cached != null && cached.fingerprint == fp) cached
      else {
        // superseded edge dirs are NOT deleted eagerly — same
        // concurrent-reader reasoning as sharedIvfIndex: compute()
        // serializes builders, not consumers mid-scan on the old path.
        // tmpRoot is driver-local /tmp, which suits this local-mode
        // harness; a cluster deployment points it at shared storage
        // (the edge table must be reachable by every executor).
        val docs = T(s, dir, "documents")
        val cands = NearDup.minHashCandidatesMaterialized(docs, "doc_id", "text")
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-mhedges")
        org.apache.commons.io.FileUtils.forceDeleteOnExit(tmpRoot.toFile)
        val path = s"$tmpRoot/edges"
        NearDup.jaccardVerify(docs, "doc_id", "text", cands)
          .write.mode("overwrite").parquet(path)
        MinhashEdges(fp, path)
      })
    s.read.parquet(built.path)
  }

  /** Corpus-scaled IVF sizing — the standard public recipe: k ≈ √n
    * clusters (so cluster population ≈ √n tracks corpus growth in both
    * factors), and a STARTING nprobe reading ≈ 15 % of the corpus — the
    * point a well-clustered embedding space needs for high recall. The
    * floor keeps tiny fixtures meaningfully partitioned; the k cap marks
    * where a flat plan-literal centroid array should hand over to a
    * hierarchical (two-level) index rather than grow unbounded (IvfIndex
    * scaladoc). The starting nprobe is NOT the declared operating point:
    * [[sharedIvfIndex]] calibrates upward from it against a measured
    * recall@10 target, because the achievable recall at a given read
    * fraction is a property of the DATA (clustered real-world embeddings
    * concentrate neighbors in few cells; the synthetic near-uniform
    * fixture scatters them, pushing nprobe up) — a static rule would
    * either lie on uniform data or over-read on clustered data. */
  private[graft] def ivfSizing(n: Long): (Int, Int) = {
    val k = math.min(1024, math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt))
    val nprobe = math.min(k, math.max(4, math.ceil(k * 0.15).toInt))
    (k, nprobe)
  }

  /** The recall target the shared index's declared operating point must
    * meet — certified live by the `ivf_recall` row on every pass. */
  private[graft] val IvfRecallTarget = 0.9

  /** Returns the shared-index handle (partitioned-index path, centroids,
    * chosen (k, nprobe)). The index write is the one corpus-sized
    * materialization, and it goes to DISK as the partitioned table — the
    * cluster-persistent layout — not through the driver. */
  private[graft] def sharedIvfIndex(s: SparkSession, dir: String): SharedIvf = {
    val fp = embFingerprint(dir)
    val built = ivfBuildCache.compute(dir, (_, cached) =>
      if (cached != null && cached.fingerprint == fp) cached
      else {
        // a superseded index dir is NOT deleted eagerly: compute()
        // serializes builders, not consumers — a concurrent probe may be
        // mid-scan on the old path, and deleting under it would kill
        // that job. The old tmpRoot stays on disk until process exit
        // (forceDeleteOnExit below), bounded by the regeneration count.
        val emb = T(s, dir, "embeddings")
        // the count is one column-pruned metadata-cheap job; its result
        // fixes the corpus-scaled k (and the calibration ladder's start)
        val (k, npStart) = ivfSizing(emb.count())
        // iters = 3: the converged-enough centroid set the recall row
        // (`ivf_recall`) certifies — build cost is 3 jobs over the
        // (cached) vectors, paid once per fixture dir and reported as
        // the bench's `_ivf_build` infra line
        val (assign, cents) = IvfIndex.build(emb, "vec_id", "embedding",
          k = k, iters = 3)
        try {
          val tmpRoot = java.nio.file.Files.createTempDirectory("graft-ivfidx")
          org.apache.commons.io.FileUtils.forceDeleteOnExit(tmpRoot.toFile)
          val path = s"$tmpRoot/ivf"
          IvfIndex.writePartitioned(emb, "vec_id", assign, path)
          // RECALL-CALIBRATED operating point (the public autotune
          // recipe, e.g. FAISS's recall-targeted parameter sweep): pick
          // the smallest ladder nprobe whose MINIMUM recall@10 over the
          // fixed probe vectors reaches the target, against the exact
          // brute-force top-10. The entire measurement is ONE
          // distributed job (`IvfIndex.calibrationTopK`): per-(query,
          // cluster) top-10 tagged with the query's cluster rank, from
          // which the driver evaluates every nprobe — including
          // nprobe = k, which IS the exact answer — so calibration adds
          // a single job to the build instead of one probe per ladder
          // step (all amortized into the auditable `_ivf_build` infra
          // line). It is what makes the declared probes' nprobe a
          // measured quality statement instead of a guess; at corpus
          // scale the calibration queries are a held-out sample, same
          // shape.
          val calib = Seq((1L, QueryVectors.q1), (2L, QueryVectors.q2))
          val centRows = cents.collect().toSeq
          val centsSeq = centRows.map(r =>
            (r.getInt(0), r.getSeq[Double](1).toIndexedSeq)).toIndexedSeq
          // calibrate from the still-cached assignment relation (join on
          // the persisted assign, not the freshly-written files): same
          // rows as the table, minus k parquet-footer reads
          val sweep = IvfIndex.calibrationTopKOf(
            emb.join(assign, "vec_id"), "vec_id",
            "embedding", centsSeq, calib, k = 10)
          def topAt(qid: Long, np: Int): Set[Long] =
            sweep.iterator.filter(t => t._1 == qid && t._2 < np).toSeq
              .sortBy(t => (-t._4, t._3)).take(10).map(_._3).toSet
          val exact = calib.map { case (qid, _) => qid -> topAt(qid, k) }.toMap
          def minRecall(np: Int): Double = calib.map { case (qid, _) =>
            (exact(qid) & topAt(qid, np)).size.toDouble / exact(qid).size
          }.min
          val ladder = Iterator.iterate(npStart)(np => math.min(k, np * 2))
            .takeWhile(_ < k).toSeq :+ k
          val nprobe = ladder.find(minRecall(_) >= IvfRecallTarget).getOrElse(k)
          IvfBuilt(fp, path, centRows, cents.schema, k, nprobe)
        } finally { assign.unpersist(); cents.unpersist() }
      })
    SharedIvf(built.indexPath,
      s.createDataFrame(java.util.Arrays.asList(built.centRows: _*), built.centSchema),
      built.k, built.nprobe)
  }

  /** Shared PQ handle: the encoded-codes table's path, the trained
    * codebooks (m·ks·d driver-side doubles — tiny), and the CALIBRATED
    * re-rank depth the declared PQ rows run at. */
  private[graft] final case class SharedPq(
      fingerprint: String, codesPath: String,
      codebooks: PqIndex.Codebooks, m: Int, ks: Int, rerank: Int)

  private val pqBuildCache =
    new java.util.concurrent.ConcurrentHashMap[String, SharedPq]()

  /** Recall target the declared PQ operating point must meet — certified
    * live by the `pq_recall` row, same contract as [[IvfRecallTarget]]. */
  private[graft] val PqRecallTarget = 0.9

  /** Ceiling on the calibration's candidate-depth ladder (and on any
    * driver-side collect the PQ rows make): the re-rank candidate list is
    * what a cluster broadcast-joins back to raw vectors, so it must stay
    * k-bounded-small no matter what the recall sweep would prefer. */
  private[graft] val PqMaxRerank = 512

  /** One shared PQ build per fixture dir: train codebooks (m=8 subspaces
    * × ks=16 cells over the 64-dim fixture — 8-byte codes, 32×
    * compression; the classic 256-cell/8-bit variant needs unsigned
    * bytes, PqIndex scaladoc), encode the corpus to a parquet codes
    * table (disk, never the driver — the sharedIvfIndex discipline), and
    * CALIBRATE the re-rank depth: the smallest ladder `r` whose minimum
    * recall@10 over the fixture query vectors meets [[PqRecallTarget]],
    * evaluated driver-side from ONE bounded ADC ordering per query.
    * (Correctness of that evaluation: `searchRerank(k, r)` keeps the
    * exact-scored top-k of the ADC top-r, and any exact-top-10 member
    * inside the ADC top-r is beaten by < 10 rows there, so
    * recall(r) = |exact10 ∩ adcTop(r)| / 10 — no per-ladder-step jobs.)
    * Near-uniform random fixture embeddings are PQ's worst case (no
    * cluster structure to compress), so the calibrated `r` lands deeper
    * than it would on real embeddings — the honest operating point,
    * same reasoning as the IVF nprobe calibration. */
  private[graft] def sharedPqIndex(s: SparkSession, dir: String): SharedPq = {
    val fp = embFingerprint(dir)
    val built = pqBuildCache.compute(dir, (_, cached) =>
      if (cached != null && cached.fingerprint == fp) cached
      else {
        val emb = T(s, dir, "embeddings")
        val m = 8
        val ks = 16
        val cb = PqIndex.trainCodebooks(emb, "vec_id", "embedding",
          m = m, ks = ks, iters = 2)
        // superseded dirs are not deleted eagerly — compute() serializes
        // builders, not consumers mid-scan (the sharedIvfIndex rule)
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-pqidx")
        org.apache.commons.io.FileUtils.forceDeleteOnExit(tmpRoot.toFile)
        val path = s"$tmpRoot/codes"
        PqIndex.encode(emb, "vec_id", "embedding", cb)
          .write.mode("overwrite").parquet(path)
        val enc = s.read.parquet(path)
        val calib = Seq((1L, QueryVectors.q1), (2L, QueryVectors.q2))
        val rMax = math.min(emb.count(), PqMaxRerank.toLong).toInt
        def adcTop(q: Seq[Double]): IndexedSeq[Long] = enc
          .select(col("vec_id"),
            round(PqIndex.adcScore(col("codes"), q, cb), 4).as("sim"))
          .orderBy(desc("sim"), asc("vec_id")).limit(rMax)
          .collect().map(_.getLong(0)).toIndexedSeq
        val measured = calib.map { case (_, q) =>
          val exact = Search.topK(emb, "embedding", "vec_id", q, k = 10)
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet
          (adcTop(q), exact)
        }
        def minRecall(r: Int): Double = measured.map { case (adc, exact) =>
          (adc.take(r).toSet & exact).size.toDouble / exact.size
        }.min
        val ladder = Iterator.iterate(10)(_ * 2).takeWhile(_ < rMax)
          .toSeq :+ rMax
        val rerank = ladder.find(minRecall(_) >= PqRecallTarget)
          .getOrElse(rMax)
        SharedPq(fp, path, cb, m, ks, rerank)
      })
    built
  }

  /** Shared SQ8 handle: the scalar-quantized codes table's path, the
    * per-dimension grid (2·d driver-side doubles), and the calibrated
    * re-rank depth the declared SQ rows run at. */
  private[graft] final case class SharedSq(
      fingerprint: String, codesPath: String,
      params: SqIndex.SqParams, rerank: Int)

  private val sqBuildCache =
    new java.util.concurrent.ConcurrentHashMap[String, SharedSq]()

  /** One shared SQ8 build per fixture dir — the LOW-LOSS end of the
    * compression dial (4× vs PQ's 32×): train the per-dimension grid
    * (ONE partial-aggregated exchange), encode the corpus to a parquet
    * codes table, and calibrate the re-rank depth exactly like
    * [[sharedPqIndex]] — the smallest ladder `r` whose minimum recall@10
    * over the fixture query vectors meets [[PqRecallTarget]], evaluated
    * from ONE bounded quantized ordering per query (the same
    * bounded-candidates argument: `searchRerank(k, r)` keeps the
    * exact-scored top-k of the quantized top-r, so
    * recall(r) = |exact10 ∩ sqTop(r)| / 10). With 127 levels per
    * dimension the quantized ordering is nearly exact, so the calibrated
    * depth should land at or near the ladder floor — the measured
    * contrast with PQ's deeper calibrated depth IS the dial evidence. */
  private[graft] def sharedSqIndex(s: SparkSession, dir: String): SharedSq = {
    val fp = embFingerprint(dir)
    val built = sqBuildCache.compute(dir, (_, cached) =>
      if (cached != null && cached.fingerprint == fp) cached
      else {
        val emb = T(s, dir, "embeddings")
        val p = SqIndex.trainParams(emb, "vec_id", "embedding")
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-sqidx")
        org.apache.commons.io.FileUtils.forceDeleteOnExit(tmpRoot.toFile)
        val path = s"$tmpRoot/codes"
        SqIndex.encode(emb, "vec_id", "embedding", p)
          .write.mode("overwrite").parquet(path)
        val enc = s.read.parquet(path)
        val calib = Seq((1L, QueryVectors.q1), (2L, QueryVectors.q2))
        val rMax = math.min(emb.count(), PqMaxRerank.toLong).toInt
        def sqTop(q: Seq[Double]): IndexedSeq[Long] = enc
          .select(col("vec_id"),
            round(SqIndex.sqScore(col("codes"), q, p), 4).as("sim"))
          .orderBy(desc("sim"), asc("vec_id")).limit(rMax)
          .collect().map(_.getLong(0)).toIndexedSeq
        val measured = calib.map { case (_, q) =>
          val exact = Search.topK(emb, "embedding", "vec_id", q, k = 10)
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet
          (sqTop(q), exact)
        }
        def minRecall(r: Int): Double = measured.map { case (sq, exact) =>
          (sq.take(r).toSet & exact).size.toDouble / exact.size
        }.min
        val ladder = Iterator.iterate(10)(_ * 2).takeWhile(_ < rMax)
          .toSeq :+ rMax
        val rerank = ladder.find(minRecall(_) >= PqRecallTarget)
          .getOrElse(rMax)
        SharedSq(fp, path, p, rerank)
      })
    built
  }

  /** Shared residual IVF-PQ handle: the cluster-partitioned residual-
    * codes table, the residual codebooks, and the calibrated
    * (nprobe, rerank) operating point. */
  private[graft] final case class SharedIvfPq(
      fingerprint: String, codesPath: String,
      codebooks: PqIndex.Codebooks, nprobe: Int, rerank: Int)

  private val ivfPqBuildCache =
    new java.util.concurrent.ConcurrentHashMap[String, SharedIvfPq]()

  /** One shared residual IVF-PQ build per fixture dir — the COMPOSED
    * index (partition pruning × compressed scan): reuses the shared IVF
    * build's cells (assignments read back from its partitioned table —
    * no second k-means), trains the residual codebooks on vec − centroid,
    * and writes the codes table partitioned by cluster_id. The re-rank
    * depth is calibrated exactly like [[sharedPqIndex]], but the ADC
    * ordering is restricted to the shared IVF nprobe's clusters — so the
    * certified recall already prices in BOTH approximations (cells
    * skipped by the probe AND residual quantization error). */
  private[graft] def sharedIvfPqIndex(s: SparkSession, dir: String): SharedIvfPq = {
    val fp = embFingerprint(dir)
    val built = ivfPqBuildCache.compute(dir, (_, cached) =>
      if (cached != null && cached.fingerprint == fp) cached
      else {
        val ivf = sharedIvfIndex(s, dir)
        val emb = T(s, dir, "embeddings")
        val assign = s.read.parquet(ivf.indexPath)
          .select(col("vec_id"), col("cluster_id"))
        val res = PqIndex.residuals(emb, "vec_id", "embedding",
          assign, ivf.centroids).select(col("vec_id"), col("res"))
        val cb = PqIndex.trainCodebooks(res, "vec_id", "res",
          m = 8, ks = 16, iters = 2)
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-ivfpq")
        org.apache.commons.io.FileUtils.forceDeleteOnExit(tmpRoot.toFile)
        val path = s"$tmpRoot/codes"
        PqIndex.encodeResidual(emb, "vec_id", "embedding", assign,
            ivf.centroids, cb)
          .repartition(col("cluster_id"))
          .write.partitionBy("cluster_id").mode("overwrite").parquet(path)
        // calibration: ADC ordering RESTRICTED to the probed clusters
        // (one bounded probe per query at r = rMax evaluates every
        // smaller r — same bounded-candidates argument as sharedPqIndex)
        val calib = Seq((1L, QueryVectors.q1), (2L, QueryVectors.q2))
        val rMax = math.min(emb.count(), PqMaxRerank.toLong).toInt
        val measured = calib.map { case (_, q) =>
          val adc = PqIndex.probeIvfPq(s, path, "vec_id", ivf.centroids,
              q, cb, k = rMax, nprobe = ivf.nprobe)
            .select(col("vec_id")).collect().map(_.getLong(0)).toIndexedSeq
          val exact = Search.topK(emb, "embedding", "vec_id", q, k = 10)
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet
          (adc, exact)
        }
        def minRecall(r: Int): Double = measured.map { case (adc, exact) =>
          (adc.take(r).toSet & exact).size.toDouble / exact.size
        }.min
        val ladder = Iterator.iterate(10)(_ * 2).takeWhile(_ < rMax)
          .toSeq :+ rMax
        val rerank = ladder.find(minRecall(_) >= PqRecallTarget)
          .getOrElse(rMax)
        SharedIvfPq(fp, path, cb, ivf.nprobe, rerank)
      })
    built
  }

  /** Generic source/sink round-trip through `fmt` (B32): write a typed
    * lineitem slice (long, decimal, date, string columns), read it back
    * with the writer's schema, aggregate. The oracle computes the same
    * aggregate straight from parquet, so any type/precision loss in the
    * sink→source cycle breaks the hash match. Same eager-materialize +
    * temp-dir-per-invocation discipline as `q_csv_roundtrip`. */
  private def formatRoundTrip(s: SparkSession, dir: String,
                              fmt: String): DataFrame = {
    val tmpRoot = java.nio.file.Files.createTempDirectory(s"graft-${fmt}rt")
    try {
      val tmp = s"$tmpRoot/slice"
      val src = T(s, dir, "lineitem").filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_quantity"), col("l_shipdate"),
          col("l_returnflag"))
      src.write.format(fmt).mode("overwrite").save(tmp)
      // explicit schema on re-read: JSON lines are schemaless text, so this
      // is what pins decimal/date types through the text cycle
      val back = s.read.format(fmt).schema(src.schema).load(tmp)
      localFrame(back.agg(count(lit(1)).as("n"),
        r4(dbl(decSum(col("l_quantity")))).as("sum_qty"),
        max(col("l_shipdate")).as("max_ship"),
        countDistinct(col("l_returnflag")).as("n_flags")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
  }

  private val formatRoundTripOracle: String =
    """SELECT count(*) AS n,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
      |  max(l_shipdate) AS max_ship,
      |  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_flags
      |FROM lineitem WHERE l_orderkey < 100""".stripMargin

  /** Per-dir memo of the EXACT ≥ 0.8 Jaccard pair set over the full
    * documents table, computed subquadratically by
    * [[NearDup.prefixJaccardJoin]] — the ground-truth artifact the
    * recall instruments compare candidate tiers against. Corpus-version
    * keyed like every memo; pair count is dup-family-sized (hundreds on
    * the fixtures), so the rows are driver-bounded LocalRelation
    * material. Built once per set pass as the `_exact_pairs_build`
    * infra line; the LIVE algorithm stays benchmarked per-rep by the
    * `exact_jaccard_join` row. */
  private val exactPairsCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      (String, Seq[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType)]()

  private[graft] def sharedExactPairs(s: SparkSession, dir: String): DataFrame = {
    val fp = Tables.fixtureFingerprint(dir, "documents")
    val built = exactPairsCache.compute(dir, (_, cached) =>
      if (cached != null && cached._1 == fp) cached
      else {
        val pairs = NearDup.prefixJaccardJoin(T(s, dir, "documents"),
          "doc_id", "text", minJaccard = 0.8)
        (fp, pairs.collect().toSeq, pairs.schema)
      })
    s.createDataFrame(java.util.Arrays.asList(built._2: _*), built._3)
  }

  /** Drop every shared-build memo for `dir` so the next consumer
    * rebuilds from scratch — the bench's infra-rep hook. The round-10
    * audit showed the single-shot infra timings absorb the same VM-
    * throttle spikes the per-query min-of-reps exists to filter
    * (`_ivfpq_build` reported 14.7 s for a build that measures ~4.9 s
    * under identical replayed conditions); clearing between reps lets
    * the bench report the min of REAL rebuilds. Superseded temp dirs
    * are left for the existing deleteOnExit/consumer-safety discipline
    * (see the sharedIvfIndex scaladoc); cached frames are driver-local
    * rows or paths, so dropping entries leaks nothing executor-side. */
  private[graft] def clearSharedBuildCaches(dir: String): Unit = {
    ivfBuildCache.remove(dir)
    pqBuildCache.remove(dir)
    sqBuildCache.remove(dir)
    ivfPqBuildCache.remove(dir)
    minhashEdgeCache.remove(dir)
    dedupEdgesCache.remove(dir)
    dedupLabelsCache.remove(dir)
    exactPairsCache.remove(dir)
  }

  /** Per-source memo of the "day-1" index slice (`vec_id % 10 =!= 0`)
    * the incremental-append rows mutate: the slice is WRITTEN once per
    * shared-index generation (keyed by the source table's path, which
    * is itself fingerprint-fresh — a rebuilt shared index gets a new
    * temp dir), and each invocation receives a cheap FILE COPY of it to
    * append into. What each rep then measures is the maintenance path
    * itself — assign/encode + partition append + probe — not the
    * re-creation of yesterday's table, which at scale already exists.
    * Caller must delete the returned copy's parent dir when done. */
  private val day1SliceCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def day1SliceCopy(s: SparkSession, sourcePath: String,
                            tag: String): String = {
    val memo = day1SliceCache.computeIfAbsent(sourcePath, { _ =>
      val tmpRoot = java.nio.file.Files.createTempDirectory(s"graft-$tag-day1")
      org.apache.commons.io.FileUtils.forceDeleteOnExit(tmpRoot.toFile)
      val p = s"$tmpRoot/t"
      // repartition by cluster co-locates each cell in one task → one
      // file per cell, which also keeps every subsequent copy cheap
      s.read.parquet(sourcePath).filter(col("vec_id") % 10 =!= 0)
        .repartition(col("cluster_id"))
        .write.partitionBy("cluster_id").mode("overwrite").parquet(p)
      p
    })
    val work = java.nio.file.Files.createTempDirectory(s"graft-$tag-work")
    val dst = s"$work/t"
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(memo), new java.io.File(dst))
    dst
  }

  val all: ListMap[String, DeclaredQuery] = ListMap(

    // ----- vector search: the reference's flagship path -------------------

    "knn_topk" -> DeclaredQuery(
      (s, dir) => Search.topK(T(s, dir, "embeddings")
          .select(col("vec_id"), col("label"), col("embedding")),
        "embedding", "vec_id", QueryVectors.q1, k = 5)
        .select(col("vec_id"), col("label"), col("sim")),
      Some(s"""SELECT vec_id, label,
         |  round(${duckDot("embedding", q1Sql)}, 4) AS sim
         |FROM embeddings ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin),
      "A4+A5: brute-force dot-product top-k (reference app.py:40-48)"),

    "cosine_topk" -> DeclaredQuery(
      (s, dir) => Search.topK(T(s, dir, "embeddings"),
        "embedding", "vec_id", QueryVectors.q2, k = 5, score = cosine)
        .select(col("vec_id"), col("sim")),
      Some(s"""SELECT vec_id,
         |  round(${duckDot("embedding", q2Sql)}
         |    / (sqrt(${duckDot("embedding", "CAST(embedding AS DOUBLE[])")})
         |       * sqrt(list_dot_product($q2Sql, $q2Sql))), 4) AS sim
         |FROM embeddings ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin),
      "B1: cosine top-k"),

    "filtered_knn" -> DeclaredQuery(
      // FILTERED VECTOR SEARCH — the metadata-predicate + top-k
      // composition every vector store ships (pre-filtering form:
      // the predicate restricts the candidate set BEFORE scoring, so
      // k survivors are guaranteed — contrast post-filtering, which
      // can come up short). Spark-first shape: the metadata predicate
      // is a left-semi join of the vector table against the filtered
      // doc table (AQE broadcasts the small filtered side here; at
      // colocated-metadata scale the predicate pushes into the vector
      // scan itself and the join disappears), then the same
      // TakeOrderedAndProject top-k as the unfiltered row.
      (s, dir) => {
        val meta = T(s, dir, "documents")
          .filter(col("lang") === "en" && length(col("text")) > 200)
          .select(col("doc_id").as("vec_id"))
        val cand = T(s, dir, "embeddings").join(meta, Seq("vec_id"), "left_semi")
        Search.topK(cand, "embedding", "vec_id", QueryVectors.q2,
            k = 5, score = cosine)
          .select(col("vec_id"), col("sim"))
      },
      Some(s"""SELECT vec_id,
         |  round(${duckDot("embedding", q2Sql)}
         |    / (sqrt(${duckDot("embedding", "CAST(embedding AS DOUBLE[])")})
         |       * sqrt(list_dot_product($q2Sql, $q2Sql))), 4) AS sim
         |FROM embeddings e
         |WHERE EXISTS (SELECT 1 FROM documents d
         |  WHERE d.doc_id = e.vec_id AND d.lang = 'en'
         |    AND len(d.text) > 200)
         |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin),
      "filtered vector search: metadata pre-filter (semi-join) + cosine top-k"),

    "l2_nn" -> DeclaredQuery(
      (s, dir) => T(s, dir, "embeddings")
        .select(col("vec_id"),
          r4(l2Dist(col("embedding"), vecLit(QueryVectors.q1))).as("dist"))
        .orderBy(asc("dist"), asc("vec_id")).limit(5),
      Some(s"""SELECT vec_id,
         |  round(sqrt(list_sum(list_transform(range(1, 65),
         |    i -> pow(embedding[i]::DOUBLE - ($q1Sql)[i], 2)))), 4) AS dist
         |FROM embeddings ORDER BY dist ASC, vec_id LIMIT 5""".stripMargin),
      "B2: L2 nearest neighbours"),

    "vec_norms" -> DeclaredQuery(
      (s, dir) => T(s, dir, "embeddings")
        .select(col("vec_id"),
          r4(l2Norm(col("embedding"))).as("norm"),
          r4(l2Norm(normalize(col("embedding")))).as("unit_norm"))
        .orderBy(asc("vec_id")).limit(200),
      Some("""SELECT vec_id, round(n, 4) AS norm,
         |  round(sqrt(list_dot_product(u, u)), 4) AS unit_norm
         |FROM (
         |  SELECT vec_id, n, list_transform(e, x -> x / n) AS u
         |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         |          sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                                CAST(embedding AS DOUBLE[]))) AS n
         |        FROM embeddings))
         |ORDER BY vec_id LIMIT 200""".stripMargin),
      "B3: norm / normalize"),

    "knn_join" -> DeclaredQuery(
      (s, dir) => {
        // the TopKAggregator shape: map-side partial top-k, no window —
        // results proven identical to the window form (TopKAggregatorSpec)
        val emb = T(s, dir, "embeddings")
        Search.knnJoinAgg(
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 3)
          .select(col("qid"), col("cid").as("vec_id"), col("sim"),
            col("rank").cast("long").as("rank"))
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
         |           FROM embeddings WHERE vec_id < 8),
         |scored AS (
         |  SELECT q.qid, e.vec_id,
         |    round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qvec)
         |      / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
         |                               CAST(e.embedding AS DOUBLE[])))
         |         * sqrt(list_dot_product(q.qvec, q.qvec))), 4) AS sim
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
         |r AS (SELECT qid, vec_id, sim,
         |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
         |      FROM scored)
         |SELECT qid, vec_id, sim, rank FROM r WHERE rank <= 3
         |ORDER BY qid, rank""".stripMargin),
      "B4: k-NN join, broadcast queries x corpus + per-key window top-k"),

    "search_threshold" -> DeclaredQuery(
      (s, dir) => Search.aboveThreshold(T(s, dir, "embeddings"),
        "embedding", QueryVectors.q1, minSim = 0.5)
        .select(col("vec_id"), col("sim"))
        .orderBy(asc("vec_id")),
      Some(s"""SELECT vec_id, sim FROM (
         |  SELECT vec_id, round(${duckDot("embedding", q1Sql)}, 4) AS sim
         |  FROM embeddings)
         |WHERE sim >= 0.5 ORDER BY vec_id""".stripMargin),
      "B9: similarity-threshold filter"),

    // ----- dedup + text analysis (LLM-pipeline tier) ----------------------

    "dedup_fingerprint" -> DeclaredQuery(
      (s, dir) => Dedup.exact(T(s, dir, "documents"),
        Dedup.tokenFingerprint(col("text")), col("doc_id"))
        .select(col("rep_id"), col("dup_cnt"), md5(col("fp")).as("fp"))
        .orderBy(asc("rep_id")),
      Some("""SELECT min(doc_id) AS rep_id, count(*) AS dup_cnt,
         |  md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS fp
         |FROM documents
         |GROUP BY fp ORDER BY rep_id""".stripMargin),
      "B7: exact dedup on sorted-token fingerprint"),

    "q_incremental_dedup" -> DeclaredQuery(
      // incremental ingestion, exact tier: the incoming batch (doc_id ≥
      // 250) is deduped against the existing corpus (doc_id < 250) by
      // token fingerprint — corpus contributes only its distinct-key
      // projection to a left-anti join, incoming rows flow once, nothing
      // over already-ingested data recomputes. Per-lang admit counts.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val kept = Dedup.incrementalExact(
          docs.filter(col("doc_id") >= 250),
          Dedup.tokenFingerprint(col("text")),
          docs.filter(col("doc_id") < 250),
          Dedup.tokenFingerprint(col("text")))
        kept.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_admitted"),
            min(col("doc_id")).as("first_id"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_admitted, min(doc_id) AS first_id
         |FROM documents i
         |WHERE doc_id >= 250 AND NOT EXISTS (
         |  SELECT 1 FROM documents c WHERE c.doc_id < 250
         |    AND array_to_string(list_sort(string_split(c.text, ' ')), ' ')
         |      = array_to_string(list_sort(string_split(i.text, ' ')), ' '))
         |GROUP BY lang ORDER BY lang""".stripMargin),
      "incremental ingestion dedup: batch vs existing corpus, distinct-key anti-join"),

    "incr_dedup_bloom" -> DeclaredQuery(
      // the SAME incremental exact-dedup decision, fronted by the
      // Bloom-filter routing tier (Dedup.incrementalExactBloom): one
      // distributed pass folds the corpus key set into a Bloom filter,
      // incoming rows it definitely-excludes are admitted without
      // touching the join, and only the might-contain sliver pays the
      // anti-join shuffle. Routing never decides admission (a false
      // positive just re-enters the join), so the result — and the
      // oracle — is identical to q_incremental_dedup. fpp=0.25 here to
      // force real false positives through the confirm path at fixture
      // scale.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val kept = Dedup.incrementalExactBloom(
          docs.filter(col("doc_id") >= 250),
          Dedup.tokenFingerprint(col("text")),
          docs.filter(col("doc_id") < 250),
          Dedup.tokenFingerprint(col("text")),
          fpp = 0.25)
        kept.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_admitted"),
            min(col("doc_id")).as("first_id"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_admitted, min(doc_id) AS first_id
         |FROM documents i
         |WHERE doc_id >= 250 AND NOT EXISTS (
         |  SELECT 1 FROM documents c WHERE c.doc_id < 250
         |    AND array_to_string(list_sort(string_split(c.text, ' ')), ' ')
         |      = array_to_string(list_sort(string_split(i.text, ' ')), ' '))
         |GROUP BY lang ORDER BY lang""".stripMargin),
      "incremental exact dedup behind a Bloom-filter routing tier (runtime-filter pattern)"),

    "incr_near_dup" -> DeclaredQuery(
      // incremental ingestion, near-dup tier: cross-set MinHash-LSH
      // candidates (incoming meets corpus only inside shared band
      // buckets) + exact-Jaccard verify over the union relation —
      // corpus-internal pairs are never regenerated. Seeded-hash →
      // rows-only per the contract; cross-set shape covered in
      // NearDupSpec.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val incoming = docs.filter(col("doc_id") >= 250)
        val corpus = docs.filter(col("doc_id") < 250)
        val cands = NearDup.materializePairs(
          NearDup.minHashCrossCandidates(incoming, corpus, "doc_id", "text")
            .select(col("id_new").as("id_a"), col("id_old").as("id_b")))
        NearDup.jaccardVerify(docs, "doc_id", "text", cands)
          .filter(col("jaccard") >= 0.8)
          .orderBy(col("id_a"), col("id_b"))
      },
      None,
      "incremental near-dup: cross-set LSH candidates (batch × corpus buckets) + Jaccard verify"),

    "incr_near_dup_simhash" -> DeclaredQuery(
      // the SimHash variant of the incremental near-dup tier: incoming
      // docs meet the corpus only inside shared 16-bit band buckets,
      // verified by full 64-bit Hamming distance — same cross-set
      // discipline as incr_near_dup (no corpus-internal pairs, no
      // incoming×corpus cross join). Seeded-hash → rows-only; the
      // cross ≡ restricted-full-corpus equivalence is property-tested
      // in NearDupSpec.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        NearDup.simHashCrossCandidates(
            docs.filter(col("doc_id") >= 250),
            docs.filter(col("doc_id") < 250),
            "doc_id", "text", maxHamming = 12)
          .orderBy(col("id_new"), col("id_old"))
      },
      None,
      "incremental near-dup, SimHash tier: cross-set banded candidates + Hamming verify"),

    "incr_near_dup_winnow" -> DeclaredQuery(
      // the winnowing-fingerprint variant of the incremental near-dup
      // tier: incoming docs meet the corpus only inside shared
      // fingerprint buckets (n_shared ≥ 2 filters single-hash
      // accidents), completing the declared cross-set family —
      // MinHash (incr_near_dup), SimHash (incr_near_dup_simhash),
      // embedding (incr_near_dup_embed), winnowing (this row).
      // Seeded-hash → rows-only; cross ≡ restricted-full-corpus is
      // property-tested in NearDupSpec.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        NearDup.winnowCrossCandidates(
            docs.filter(col("doc_id") >= 250),
            docs.filter(col("doc_id") < 250),
            "doc_id", "text")
          .orderBy(col("id_new"), col("id_old"))
      },
      None,
      "incremental near-dup, winnowing tier: cross-set fingerprint-bucket candidates"),

    "incr_near_dup_embed" -> DeclaredQuery(
      // the VECTOR tier of incremental ingestion, driver-visible:
      // incoming vectors meet the existing corpus only inside shared
      // sign-LSH buckets (1-bit multiprobe exploded on the INCOMING
      // side — the small one), verified by exact cosine over the
      // candidate-touched ids — no incoming×corpus cross join, no
      // corpus-internal pairs. The split is SF-proportional
      // (vec_id % 5: 20 % incoming at every scale factor) and the
      // nBits sizing rule is the same occupancy-constant formula as
      // near_dup_embed_lsh. Float cosine → rows-only per the contract;
      // the cross-set shape is covered in NearDupSpec.
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val corpus = emb.filter(col("vec_id") % 5 =!= 0)
          val incoming = emb.filter(col("vec_id") % 5 === 0)
          // one cache-populating job doubles as the (count, dim) fetch
          val meta = corpus.agg(count(lit(1)).as("n"),
            first(size(col("embedding"))).as("d")).head()
          val nBits = math.max(6,
            math.ceil(math.log(meta.getLong(0) / 4.0) / math.log(2.0)).toInt)
          val cands = NearDup.materializePairs(
            NearDup.embeddingCrossCandidates(incoming, corpus,
              "vec_id", "embedding", nBits, meta.getInt(1))
              .select(col("id_new").as("id_a"), col("id_old").as("id_b")))
          localFrame(NearDup.cosineVerify(emb, "vec_id", "embedding", cands)
            .filter(col("cos") >= 0.3)
            .orderBy(col("id_a"), col("id_b")))
        } finally emb.unpersist()
      },
      // PROMOTED (round 10): same deterministic-planes replay as
      // near_dup_embed_lsh, cross-set form — nbits sized from the
      // corpus side only, pairs restricted to incoming×corpus
      Some(incrNearDupEmbedOracleSql),
      "incremental near-dup, vector tier: cross-set sign-LSH candidates + exact-cosine verify (full DuckDB replay)"),

    "incr_admit_vec" -> DeclaredQuery(
      // the VECTOR-TIER admission decision end-to-end — incr_admit for
      // an embedding-indexed corpus: incoming vectors meet the corpus
      // only inside shared sign-LSH buckets, candidates verified by
      // exact cosine, incoming rows at ≥ minCosine against ANY corpus
      // vector rejected. The chain is Dedup.admitIncomingVectors — the
      // SAME kernel the streaming mirrors run per micro-batch
      // (Streams.incrementalVectorAdmission / ...Evolving; stream ≡
      // batch asserted in StreamsSpec). minCosine = 0.3 so the
      // near-uniform fixture produces real rejections (driver-visible
      // evidence the tier bites, not an everything-admitted no-op).
      // Float cosine + seeded LSH → rows-only per the contract.
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        localFrame(Dedup.admitIncomingVectors(
            emb.filter(col("vec_id") % 5 === 0),
            emb.filter(col("vec_id") % 5 =!= 0),
            "vec_id", "embedding", minCosine = 0.3)
          .groupBy((col("vec_id") % 100).as("id_bucket"))
          .agg(count(lit(1)).as("n_admitted"),
            min(col("vec_id")).as("first_id"))
          .orderBy(col("id_bucket")))
      },
      // PROMOTED (round 10): deterministic planes at the fixed default
      // nbits=8 make the whole admit/reject decision a static replay
      Some(incrAdmitVecOracleSql),
      "vector-tier incremental admission e2e: cross-set sign-LSH + cosine verify → admit/reject (full DuckDB replay)"),

    "incr_semantic_admit" -> DeclaredQuery(
      // SemDeDup at the INGESTION boundary — semantic_dedup_ivf's
      // admission twin, and incr_admit_vec's cell-partitioned
      // alternative: the incoming slice is assigned to the SHARED IVF
      // index's existing cells (zero-shuffle argmin vs the frozen
      // centroids; the cells the batch touches become a static
      // partition filter on the index scan) and compared by exact
      // cosine only against same-cell corpus vectors. The corpus side
      // here is the shared partitioned table MINUS the incoming slice,
      // so the decision replays a real day-2 ingestion. Same kernel as
      // the streaming mirror (Streams.incrementalSemanticAdmission;
      // stream ≡ batch in StreamsSpec). minCosine = 0.3 per
      // incr_admit_vec's fixture-calibration rationale. Float k-means
      // cells → rows-only per the contract.
      (s, dir) => {
        val ivf = sharedIvfIndex(s, dir)
        val emb = T(s, dir, "embeddings")
        val idx = s.read.parquet(ivf.indexPath)
          .filter(col("vec_id") % 5 =!= 0)
          .select(col("vec_id"), col("embedding"), col("cluster_id"))
        localFrame(Dedup.admitIncomingSemantic(
            emb.filter(col("vec_id") % 5 === 0),
            idx, "vec_id", "embedding", ivf.centroids, minCosine = 0.3)
          .groupBy((col("vec_id") % 100).as("id_bucket"))
          .agg(count(lit(1)).as("n_admitted"),
            min(col("vec_id")).as("first_id"))
          .orderBy(col("id_bucket")))
      },
      None,
      "semantic admission over IVF cells: assign-to-cell + within-cell cosine reject (SemDeDup ingestion twin)"),

    "incr_admit_exact" -> DeclaredQuery(
      // the admission decision with the GUARANTEED near-dup tier
      // (Dedup.admitIncomingExactJaccard — cross-set prefix-filtered
      // exact join instead of MinHash banding), which makes the WHOLE
      // admission verdict deterministic and therefore ORACLE-CHECKED —
      // the one admission row whose near-dup stage the DuckDB replay
      // can follow (the LSH kernel rows are rows-only by contract).
      // Bounded id slices keep the oracle's all-pairs cross replay
      // cheap at any scale factor; the Spark side runs the same slice
      // through the subquadratic prefix path.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        localFrame(Dedup.admitIncomingExactJaccard(
            docs.filter(col("doc_id") >= 150 && col("doc_id") < 300),
            docs.filter(col("doc_id") < 150),
            "doc_id", "text")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_admitted"),
            min(col("doc_id")).as("first_id"))
          .orderBy(col("lang")))
      },
      Some("""WITH c AS (SELECT doc_id, text, lang FROM documents WHERE doc_id < 150),
         |i AS (SELECT doc_id, text, lang FROM documents
         |      WHERE doc_id >= 150 AND doc_id < 300),
         |keptx AS (SELECT i.* FROM i WHERE NOT EXISTS (
         |    SELECT 1 FROM c
         |    WHERE array_to_string(list_sort(string_split(c.text, ' ')), ' ')
         |        = array_to_string(list_sort(string_split(i.text, ' ')), ' '))),
         |st AS (SELECT doc_id, list_distinct(
         |        CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
         |             ELSE list_transform(range(1, len(t) - 1),
         |                    k -> t[k] || ' ' || t[k+1] || ' ' || t[k+2]) END) AS s
         |       FROM (SELECT doc_id,
         |               list_filter(string_split(text, ' '), x -> x <> '') AS t
         |             FROM keptx) WHERE len(t) > 0),
         |so AS (SELECT doc_id, list_distinct(
         |        CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
         |             ELSE list_transform(range(1, len(t) - 1),
         |                    k -> t[k] || ' ' || t[k+1] || ' ' || t[k+2]) END) AS s
         |       FROM (SELECT doc_id,
         |               list_filter(string_split(text, ' '), x -> x <> '') AS t
         |             FROM c) WHERE len(t) > 0),
         |dup AS (SELECT DISTINCT st.doc_id FROM st JOIN so
         |        ON round(len(list_intersect(st.s, so.s))::DOUBLE
         |             / len(list_distinct(st.s || so.s)), 4) >= 0.8)
         |SELECT lang, count(*) AS n_admitted, min(doc_id) AS first_id
         |FROM keptx WHERE doc_id NOT IN (SELECT doc_id FROM dup)
         |GROUP BY lang ORDER BY lang""".stripMargin),
      "admission with the guaranteed exact near-dup tier (prefix join) — oracle-checked end-to-end"),

    "incr_admit" -> DeclaredQuery(
      // the incremental ingestion decision end-to-end: incoming batch →
      // exact-fingerprint anti-join vs corpus → cross-set LSH near-dup
      // scan vs corpus → admit what survives both tiers. Each tier's
      // shape is the individually-checked operator (q_incremental_dedup,
      // incr_near_dup); this chains them into the admit/reject verdict
      // an ingestion job actually emits. Seeded-hash tier → rows-only.
      // the chain is Dedup.admitIncoming — the SAME kernel the streaming
      // mirror runs per micro-batch (Streams.incrementalAdmission), so
      // this row and the stream are one code path (stream ≡ batch
      // asserted in StreamsSpec)
      (s, dir) => {
        val docs = T(s, dir, "documents")
        localFrame(Dedup.admitIncoming(
            docs.filter(col("doc_id") >= 250),
            docs.filter(col("doc_id") < 250),
            "doc_id", "text")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_admitted"),
            min(col("doc_id")).as("first_id"))
          .orderBy(col("lang")))
      },
      None,
      "incremental admission e2e: exact anti-join tier + cross-set near-dup tier → admitted per lang"),

    "incr_admit_seq" -> DeclaredQuery(
      // TWO-DAY sequential ingestion replay — the batch twin of
      // Streams.incrementalAdmissionEvolving (same kernel, chained):
      // day 1 (doc_id 250-374) is admitted against the corpus
      // (doc_id < 250); day 2 (doc_id ≥ 375) is admitted against
      // corpus ∪ DAY-1 ADMISSIONS, so a day-2 document duplicating a
      // day-1 admission is rejected even though neither is in the
      // original corpus. Day-1 admissions are persisted before day 2
      // references them (the kernel reads its corpus side three times —
      // distinct-fingerprint projection, band buckets, verify side; at
      // scale this persist is the write to the corpus table itself).
      // Seeded-hash near-dup tier → rows-only per the contract; the
      // evolving semantics are pinned deterministically in StreamsSpec.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") < 250)
        val day1 = docs.filter(col("doc_id") >= 250 && col("doc_id") < 375)
        val day2 = docs.filter(col("doc_id") >= 375)
        val adm1 = Dedup.admitIncoming(day1, corpus, "doc_id", "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          adm1.count()
          val corpus2 = corpus.select(col("doc_id"), col("text"))
            .union(adm1.select(col("doc_id"), col("text")))
          val adm2 = Dedup.admitIncoming(day2, corpus2, "doc_id", "text")
          localFrame(
            adm1.select(col("doc_id"), col("lang"), lit(1L).as("day"))
              .union(adm2.select(col("doc_id"), col("lang"), lit(2L).as("day")))
              .groupBy(col("day"), col("lang"))
              .agg(count(lit(1)).as("n_admitted"),
                min(col("doc_id")).as("first_id"))
              .orderBy(col("day"), col("lang")))
        } finally adm1.unpersist()
      },
      None,
      "sequential ingestion e2e: day-2 admission runs against corpus ∪ day-1 admissions (evolving-corpus batch twin)"),

    "incr_admit_durable" -> DeclaredQuery(
      // the incr_admit_seq replay with the evolving corpus held in a
      // VersionedCorpus DIRECTORY instead of a persisted in-memory
      // frame — the batch twin of Streams.incrementalAdmissionDurable
      // (the restart-safe ingestion loop). Day-1 admissions COMMIT as a
      // generation before day 2 snapshots the store, which is exactly
      // the corpus-table append incr_admit_seq's persist simulates; the
      // day's admitted rows are then READ BACK from their committed
      // generation (read-your-commit), so the aggregate reflects what
      // the store durably holds, not a recomputation. Row-identical to
      // incr_admit_seq (asserted in VersionedCorpusSpec); seeded-hash
      // near-dup tier → rows-only per the contract.
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-vcadmit")
        try {
          val root = s"$tmpRoot/corpus"
          val docs = T(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("lang"))
          VersionedCorpus.append(docs.filter(col("doc_id") < 250), root)
          def admit(day: DataFrame): DataFrame =
            Dedup.admitIncoming(day,
              VersionedCorpus.snapshot(s, root)
                .select(col("doc_id"), col("text")),
              "doc_id", "text")
          val g1 = VersionedCorpus.append(
            admit(docs.filter(col("doc_id") >= 250 && col("doc_id") < 375)),
            root)
          val g2 = VersionedCorpus.append(
            admit(docs.filter(col("doc_id") >= 375)), root)
          def dayRows(g: Long, day: Long): DataFrame =
            s.read.parquet(s"$root/gen=$g")
              .select(col("doc_id"), col("lang"), lit(day).as("day"))
          localFrame(dayRows(g1, 1L).union(dayRows(g2, 2L))
            .groupBy(col("day"), col("lang"))
            .agg(count(lit(1)).as("n_admitted"),
              min(col("doc_id")).as("first_id"))
            .orderBy(col("day"), col("lang")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      None,
      "durable sequential ingestion: two-day replay with the corpus as an on-disk versioned store (restart-safe batch twin)"),

    "q_corpus_timetravel" -> DeclaredQuery(
      // the VersionedCorpus lifecycle end-to-end, content-proven by
      // oracle: three appends build the corpus in generations, a
      // compaction rewrites the first two as one base generation
      // (content-neutral, history-preserving), time travel to the first
      // commit still sees exactly that commit AFTER compaction, and a
      // vacuum drops the superseded generation data without changing
      // the latest snapshot. Every snapshot's (count, id-sum,
      // char-mass, lang-arity) must hash-match DuckDB computing the
      // same slices straight from the source table — any row lost or
      // duplicated by append/compact/vacuum bookkeeping breaks it.
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-vctt")
        try {
          val root = s"$tmpRoot/corpus"
          val docs = T(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("lang"))
          val g0 = VersionedCorpus.append(
            docs.filter(col("doc_id") < 150), root)
          VersionedCorpus.append(
            docs.filter(col("doc_id") >= 150 && col("doc_id") < 300), root)
          VersionedCorpus.compact(s, root)
          VersionedCorpus.append(docs.filter(col("doc_id") >= 300), root)
          def stats(df: DataFrame, label: String): DataFrame =
            df.agg(count(lit(1)).as("n_docs"),
                sum(col("doc_id")).as("sum_ids"),
                sum(length(col("text")).cast("long")).as("text_chars"),
                countDistinct(col("lang")).as("n_langs"))
              .select(lit(label).as("snap"), col("n_docs"),
                col("sum_ids"), col("text_chars"), col("n_langs"))
          // pre-vacuum reads materialize before vacuum mutates the dir
          val pre = localFrame(
            stats(VersionedCorpus.snapshot(s, root, g0), "asof_first")
              .union(stats(VersionedCorpus.snapshot(s, root), "latest")))
          VersionedCorpus.vacuum(root)
          val post = localFrame(
            stats(VersionedCorpus.snapshot(s, root), "post_vacuum"))
          localFrame(pre.union(post).orderBy(col("snap")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""SELECT * FROM (
         |  SELECT 'asof_first' AS snap, count(*) AS n_docs,
         |    CAST(sum(doc_id) AS BIGINT) AS sum_ids,
         |    CAST(sum(length(text)) AS BIGINT) AS text_chars,
         |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |  FROM documents WHERE doc_id < 150
         |  UNION ALL
         |  SELECT 'latest', count(*), CAST(sum(doc_id) AS BIGINT),
         |    CAST(sum(length(text)) AS BIGINT),
         |    CAST(count(DISTINCT lang) AS BIGINT) FROM documents
         |  UNION ALL
         |  SELECT 'post_vacuum', count(*), CAST(sum(doc_id) AS BIGINT),
         |    CAST(sum(length(text)) AS BIGINT),
         |    CAST(count(DISTINCT lang) AS BIGINT) FROM documents
         |) ORDER BY snap""".stripMargin),
      "versioned corpus store lifecycle: append ×3 + compact + time-travel + vacuum, every snapshot content-checked vs direct SQL"),

    "q_corpus_merge" -> DeclaredQuery(
      // merge-on-read UPSERT + DELETE on the versioned store,
      // content-proven by oracle: an upsert generation revises a key
      // range (text + " rev2") without rewriting anything, a tombstone
      // generation deletes a range, a later append RESURRECTS part of
      // the deleted range (generation order decides — the
      // Delta/Iceberg merge-on-read rule), and a compact + vacuum
      // applies the whole merge physically. Three snapshots
      // (asof-upsert / latest / post-compact) must each hash-match
      // DuckDB computing the same revised-and-filtered slices straight
      // from the source table — a row lost, duplicated, revived too
      // early, or left unrevised by the tombstone bookkeeping breaks
      // it. The " rev2" suffix shifts char mass so an unapplied upsert
      // is visible in the hash, not just the row count.
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-vcmg")
        try {
          val root = s"$tmpRoot/corpus"
          val docs = T(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("lang"))
          VersionedCorpus.append(docs.filter(col("doc_id") < 300), root)
          val gU = VersionedCorpus.upsert(
            docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)
              .withColumn("text", concat(col("text"), lit(" rev2"))),
            root, "doc_id")
          VersionedCorpus.delete(
            docs.filter(col("doc_id") < 50).select("doc_id"), root, "doc_id")
          VersionedCorpus.append(docs.filter(col("doc_id") < 25), root)
          def stats(df: DataFrame, label: String): DataFrame =
            df.agg(count(lit(1)).as("n_docs"),
                sum(col("doc_id")).as("sum_ids"),
                sum(length(col("text")).cast("long")).as("text_chars"),
                countDistinct(col("lang")).as("n_langs"))
              .select(lit(label).as("snap"), col("n_docs"),
                col("sum_ids"), col("text_chars"), col("n_langs"))
          // pre-compact reads materialize before vacuum mutates the dir
          val pre = localFrame(
            stats(VersionedCorpus.snapshot(s, root, gU), "asof_upsert")
              .union(stats(VersionedCorpus.snapshot(s, root), "latest")))
          VersionedCorpus.compact(s, root)
          VersionedCorpus.vacuum(root)
          val post = localFrame(
            stats(VersionedCorpus.snapshot(s, root), "post_compact"))
          localFrame(pre.union(post).orderBy(col("snap")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""SELECT * FROM (
         |  SELECT 'asof_upsert' AS snap, count(*) AS n_docs,
         |    CAST(sum(doc_id) AS BIGINT) AS sum_ids,
         |    CAST(sum(length(text) + CASE WHEN doc_id >= 100 AND doc_id < 200
         |      THEN 5 ELSE 0 END) AS BIGINT) AS text_chars,
         |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |  FROM documents WHERE doc_id < 300
         |  UNION ALL
         |  SELECT 'latest', count(*), CAST(sum(doc_id) AS BIGINT),
         |    CAST(sum(length(text) + CASE WHEN doc_id >= 100 AND doc_id < 200
         |      THEN 5 ELSE 0 END) AS BIGINT),
         |    CAST(count(DISTINCT lang) AS BIGINT)
         |  FROM documents
         |  WHERE doc_id < 300 AND (doc_id < 25 OR doc_id >= 50)
         |  UNION ALL
         |  SELECT 'post_compact', count(*), CAST(sum(doc_id) AS BIGINT),
         |    CAST(sum(length(text) + CASE WHEN doc_id >= 100 AND doc_id < 200
         |      THEN 5 ELSE 0 END) AS BIGINT),
         |    CAST(count(DISTINCT lang) AS BIGINT)
         |  FROM documents
         |  WHERE doc_id < 300 AND (doc_id < 25 OR doc_id >= 50)
         |) ORDER BY snap""".stripMargin),
      "merge-on-read upsert + tombstone delete + resurrection + physical apply at compaction, every snapshot content-checked vs direct SQL"),

    "q_cdc_apply" -> DeclaredQuery(
      // CDC APPLY content-proven by oracle: a change batch mixing three
      // overlapping waves — U(seq 1) over [100,300), D(seq 2) over
      // [150,250), U(seq 3) over [180,220) — folds into the base table
      // [0,300) through `VersionedCorpus.applyChanges` (last-writer-
      // wins per key by seq, then one upsert generation + one tombstone
      // generation). Every key class is exercised: untouched, updated,
      // deleted, delete-then-re-upserted (the seq-3 wave beats the
      // delete), inserted-new, and deleted-while-absent (a no-op). The
      // oracle states the expected FINAL TABLE row-for-row — full text
      // equality, not aggregate counts — so a wrong winner, a leaked
      // tombstone, or a lost insert shows up as a hash mismatch.
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-cdc")
        try {
          val root = s"$tmpRoot/corpus"
          val docs = T(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("lang"))
          VersionedCorpus.append(docs.filter(col("doc_id") < 300), root)
          def wave(lo: Int, hi: Int, op: String, seq: Int, tag: String) =
            docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
              .withColumn("text",
                if (op == "D") col("text") else concat(col("text"), lit(tag)))
              .withColumn("op", lit(op)).withColumn("seq", lit(seq))
          val changes = wave(100, 300, "U", 1, " u1")
            .unionByName(wave(150, 250, "D", 2, ""))
            .unionByName(wave(180, 220, "U", 3, " u3"))
          VersionedCorpus.applyChanges(changes, root, "doc_id", "op", "seq")
          localFrame(VersionedCorpus.snapshot(s, root)
            .select(col("doc_id"), col("text"), col("lang"))
            .orderBy(col("doc_id")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""SELECT doc_id, text, lang FROM (
         |  SELECT doc_id, text, lang FROM documents WHERE doc_id < 100
         |  UNION ALL
         |  SELECT doc_id, text || ' u1', lang FROM documents
         |  WHERE doc_id >= 100 AND doc_id < 150
         |  UNION ALL
         |  SELECT doc_id, text || ' u3', lang FROM documents
         |  WHERE doc_id >= 180 AND doc_id < 220
         |  UNION ALL
         |  SELECT doc_id, text || ' u1', lang FROM documents
         |  WHERE doc_id >= 250 AND doc_id < 300
         |) ORDER BY doc_id""".stripMargin),
      "CDC apply: last-writer-wins change fold into the versioned store, final table content-checked row-for-row vs direct SQL"),

    "q_store_lookup" -> DeclaredQuery(
      // POINT LOOKUPS through the manifest-stats pruned read path
      // (`VersionedCorpus.lookupKey`): every keyed commit records its
      // key min/max in the manifest, so a lookup reads only the
      // generations whose range can hold the key — decided driver-side
      // from O(generations) manifest records, no parquet footer
      // touched for pruned dirs (pruning itself is asserted via
      // inputFiles in VersionedCorpusSpec; THIS row certifies the
      // answers). Six lookups cover every key class — untouched,
      // resurrected-after-delete, deleted, upserted, tail, absent —
      // and must reproduce exactly the rows direct SQL derives.
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-vclk")
        try {
          val root = s"$tmpRoot/corpus"
          val docs = T(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("lang"))
          VersionedCorpus.append(docs.filter(col("doc_id") < 200), root)
          VersionedCorpus.upsert(
            docs.filter(col("doc_id") >= 100 && col("doc_id") < 150)
              .withColumn("text", concat(col("text"), lit(" u1"))),
            root, "doc_id")
          VersionedCorpus.delete(
            docs.filter(col("doc_id") >= 50 && col("doc_id") < 100)
              .select("doc_id"), root, "doc_id")
          VersionedCorpus.append(
            docs.filter(col("doc_id") >= 55 && col("doc_id") < 60), root)
          val out = Seq(10L, 57L, 75L, 120L, 180L, 4000L)
            .map(k => VersionedCorpus.lookupKey(s, root, k))
            .reduce(_ unionByName _)
          localFrame(out.select(col("doc_id"), col("text"), col("lang"))
            .orderBy(col("doc_id")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""SELECT doc_id, text, lang FROM (
         |  SELECT doc_id, text, lang FROM documents
         |  WHERE doc_id IN (10, 57, 180)
         |  UNION ALL
         |  SELECT doc_id, text || ' u1', lang FROM documents
         |  WHERE doc_id = 120
         |) ORDER BY doc_id""".stripMargin),
      "manifest-stats pruned point lookups over the mutated store: every key class answered identically to direct SQL"),

    "q_store_bloom" -> DeclaredQuery(
      // BLOOM-PRUNED POINT LOOKUPS (`VersionedCorpus.pinBloom`): the
      // store's generations hold keys STRIPED by doc_id % 3, so every
      // generation's key [min,max] spans the whole domain and bounds
      // pruning keeps everything — the per-generation Bloom filter
      // (folded into the commit's one read-back aggregate, published
      // as _manifest/<gen>.bloom) is the only thing that can skip
      // reads, and lookups must still answer exactly what direct SQL
      // derives across untouched / upserted / deleted / absent keys.
      // The filter-level pruning itself is asserted via inputFiles in
      // VersionedCorpusSpec; THIS row certifies the answers ride it
      // safely (a probe hashing differently from the build would
      // falsely prune present keys and break the hash here).
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-vcbl")
        try {
          val root = s"$tmpRoot/corpus"
          val docs = T(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("lang"))
            .filter(col("doc_id") < 300)
          VersionedCorpus.append(docs.filter(pmod(col("doc_id"), lit(3)) === 0), root)
          VersionedCorpus.pinKey(root, "doc_id")
          VersionedCorpus.pinBloom(root, expectedItems = 256, fpp = 0.01)
          VersionedCorpus.append(docs.filter(pmod(col("doc_id"), lit(3)) === 1), root)
          VersionedCorpus.append(docs.filter(pmod(col("doc_id"), lit(3)) === 2), root)
          VersionedCorpus.upsert(
            docs.filter(col("doc_id") >= 90 && col("doc_id") < 120)
              .withColumn("text", concat(col("text"), lit(" u1"))),
            root, "doc_id")
          VersionedCorpus.delete(
            docs.filter(col("doc_id") >= 150 && col("doc_id") < 180)
              .select("doc_id"), root, "doc_id")
          val out = Seq(10L, 99L, 155L, 200L, 271L, 4000L)
            .map(k => VersionedCorpus.lookupKey(s, root, k))
            .reduce(_ unionByName _)
          localFrame(out.select(col("doc_id"), col("text"), col("lang"))
            .orderBy(col("doc_id")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""SELECT doc_id, text, lang FROM (
         |  SELECT doc_id, text, lang FROM documents
         |  WHERE doc_id IN (10, 200, 271)
         |  UNION ALL
         |  SELECT doc_id, text || ' u1', lang FROM documents
         |  WHERE doc_id = 99
         |) ORDER BY doc_id""".stripMargin),
      "Bloom-pruned point lookups where key bounds cannot prune (striped keys): every key class answered identically to direct SQL"),

    "q_store_evolve" -> DeclaredQuery(
      // ADDITIVE SCHEMA EVOLUTION content-proven by oracle: the store
      // starts as (doc_id, text), an explicitly-opted-in evolved append
      // adds the lang column, a strict append then uses the evolved
      // schema, and a tombstone delete spans the evolution boundary.
      // The snapshot must read pre-evolution rows with lang = NULL
      // (parquet missing-column semantics under the pinned table
      // schema) and post-evolution rows with their real lang — counted
      // and distinct-counted against DuckDB deriving the same
      // null-pattern from the source table. A reader that dropped the
      // new column (first-file schema), invented non-null values, or
      // lost evolved rows through the tombstone join breaks the hash.
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-vcev")
        try {
          val root = s"$tmpRoot/corpus"
          val docs = T(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("lang"))
          VersionedCorpus.append(
            docs.filter(col("doc_id") < 150).drop("lang"), root)
          VersionedCorpus.append(
            docs.filter(col("doc_id") >= 150 && col("doc_id") < 300),
            root, evolveSchema = true)
          VersionedCorpus.append(
            docs.filter(col("doc_id") >= 300 && col("doc_id") < 350), root)
          VersionedCorpus.delete(
            docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)
              .select("doc_id"), root, "doc_id")
          localFrame(VersionedCorpus.snapshot(s, root)
            .agg(count(lit(1)).as("n_docs"),
              sum(col("doc_id")).as("sum_ids"),
              count(col("lang")).as("n_with_lang"),
              countDistinct(col("lang")).as("n_langs")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""SELECT count(*) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
         |  CAST(count(CASE WHEN doc_id >= 150 THEN lang END) AS BIGINT)
         |    AS n_with_lang,
         |  CAST(count(DISTINCT CASE WHEN doc_id >= 150 THEN lang END)
         |    AS BIGINT) AS n_langs
         |FROM documents
         |WHERE doc_id < 350 AND (doc_id < 100 OR doc_id >= 200)""".stripMargin),
      "additive schema evolution: pre-evolution rows null-filled, evolved rows intact, across a tombstone spanning the boundary"),

    "q_store_mv" -> DeclaredQuery(
      // INCREMENTAL MATERIALIZED-VIEW MAINTENANCE off the change feed
      // (`IncrementalView.refresh` — dirty-group recompute: direct
      // groups from the feed, PREIMAGE groups of mutated keys from the
      // pre-window snapshot via the pruned range path, one upsert +
      // one delete on the view store per refresh). Three waves: a full
      // build, then group MOVES (upserted rows change bucket) + a
      // deleted range + appends, then revisions + another delete. The
      // final view must hash-match DuckDB aggregating the final table
      // directly — a stale untouched group, a lost preimage group, or
      // a surviving emptied group breaks it.
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-mv")
        try {
          val src = s"$tmpRoot/src"; val view = s"$tmpRoot/view"
          val cursor = s"$tmpRoot/cursor.txt"
          val docs = T(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("lang"))
          def slice(lo: Int, hi: Int) =
            docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
              .withColumn("bucket", pmod(col("doc_id"), lit(7)))
              .select("doc_id", "bucket", "text")
          val aggs = Seq(count(lit(1)).as("n"),
            sum(length(col("text")).cast("long")).as("chars"))
          def refresh() = IncrementalView.refresh(s, src, view, cursor,
            "doc_id", "bucket", aggs)
          VersionedCorpus.append(slice(0, 300), src)
          VersionedCorpus.pinKey(src, "doc_id")
          refresh()
          VersionedCorpus.upsert(
            slice(50, 80)
              .withColumn("bucket", pmod(col("doc_id") + 1, lit(7)))
              .withColumn("text", concat(col("text"), lit(" u1"))),
            src, "doc_id")
          VersionedCorpus.delete(slice(200, 250).select("doc_id"),
            src, "doc_id")
          VersionedCorpus.append(slice(300, 330), src)
          refresh()
          VersionedCorpus.upsert(
            slice(0, 10).withColumn("text", concat(col("text"), lit(" u3"))),
            src, "doc_id")
          VersionedCorpus.delete(slice(100, 110).select("doc_id"),
            src, "doc_id")
          VersionedCorpus.delete(slice(150, 160).select("doc_id"),
            src, "doc_id")
          refresh()
          localFrame(IncrementalView.read(s, view).orderBy(col("bucket")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""WITH final AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id BETWEEN 50 AND 79 THEN (doc_id + 1) % 7
         |         ELSE doc_id % 7 END AS bucket,
         |    CASE WHEN doc_id BETWEEN 50 AND 79 THEN text || ' u1'
         |         WHEN doc_id < 10 THEN text || ' u3'
         |         ELSE text END AS text
         |  FROM documents
         |  WHERE doc_id < 330
         |    AND NOT (doc_id BETWEEN 200 AND 249)
         |    AND NOT (doc_id BETWEEN 100 AND 109)
         |    AND NOT (doc_id BETWEEN 150 AND 159))
         |SELECT bucket, count(*) AS n,
         |  CAST(sum(length(text)) AS BIGINT) AS chars
         |FROM final GROUP BY bucket ORDER BY bucket""".stripMargin),
      "incremental MV maintenance: dirty-group recompute across moves/deletes/revisions, final view ≡ DuckDB aggregating the final table"),

    "q_store_where" -> DeclaredQuery(
      // PREDICATE-PRUNED SNAPSHOT over a pinned NON-KEY stats column
      // (`VersionedCorpus.pinStats` + `snapshotWhere` — the
      // Iceberg/Delta column-stats idea at generation granularity):
      // four day-partitioned appends, an upsert and a delete landing
      // inside the band, then a day-band read that skips the
      // out-of-band generations from the manifests alone (pruning
      // asserted in VersionedCorpusSpec; THIS row certifies the
      // answers under merge-on-read resolution).
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-vcw")
        try {
          val root = s"$tmpRoot/corpus"
          val docs = T(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("lang"))
            .withColumn("day", (col("doc_id") / 100).cast("long"))
          def slice(lo: Int, hi: Int) =
            docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
          VersionedCorpus.append(slice(0, 100), root)
          VersionedCorpus.pinStats(root, Seq("day"))
          VersionedCorpus.append(slice(100, 200), root)
          VersionedCorpus.append(slice(200, 300), root)
          VersionedCorpus.append(slice(300, 400), root)
          VersionedCorpus.upsert(
            slice(210, 220).withColumn("text", concat(col("text"), lit(" u1"))),
            root, "doc_id")
          VersionedCorpus.delete(slice(110, 130).select("doc_id"),
            root, "doc_id")
          localFrame(VersionedCorpus.snapshotWhere(s, root, "day", 1L, 2L)
            .select(col("doc_id"), col("text"), col("lang"), col("day"))
            .orderBy(col("doc_id")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""SELECT doc_id,
         |  CASE WHEN doc_id >= 210 AND doc_id < 220 THEN text || ' u1'
         |       ELSE text END AS text,
         |  lang, CAST(doc_id // 100 AS BIGINT) AS day
         |FROM documents
         |WHERE doc_id >= 100 AND doc_id < 300
         |  AND NOT (doc_id >= 110 AND doc_id < 130)
         |ORDER BY doc_id""".stripMargin),
      "generation skipping on a pinned non-key stats column: day-band snapshot ≡ direct SQL across an upsert and a delete"),

    "q_store_range" -> DeclaredQuery(
      // RANGE SCAN through the manifest-pruned keyed read path
      // (`VersionedCorpus.lookupKeyRange` — generations whose key
      // bounds cannot intersect [lo, hi] are never read, decided
      // driver-side; the dominant read shape for time-ordered keys:
      // "this week's slice" touches this week's generations). The
      // range spans a deleted window, a resurrection inside it, an
      // upserted run, and plain tails — the result must equal direct
      // SQL row-for-row (pruning is asserted in VersionedCorpusSpec;
      // THIS row certifies the answers).
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-vcrg")
        try {
          val root = s"$tmpRoot/corpus"
          val docs = T(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("lang"))
          VersionedCorpus.append(docs.filter(col("doc_id") < 200), root)
          VersionedCorpus.upsert(
            docs.filter(col("doc_id") >= 100 && col("doc_id") < 150)
              .withColumn("text", concat(col("text"), lit(" u1"))),
            root, "doc_id")
          VersionedCorpus.delete(
            docs.filter(col("doc_id") >= 50 && col("doc_id") < 100)
              .select("doc_id"), root, "doc_id")
          VersionedCorpus.append(
            docs.filter(col("doc_id") >= 55 && col("doc_id") < 60), root)
          localFrame(VersionedCorpus.lookupKeyRange(s, root, 40L, 160L)
            .select(col("doc_id"), col("text"), col("lang"))
            .orderBy(col("doc_id")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""SELECT doc_id, text, lang FROM (
         |  SELECT doc_id, text, lang FROM documents
         |  WHERE (doc_id >= 40 AND doc_id < 50)
         |     OR (doc_id >= 55 AND doc_id < 60)
         |     OR (doc_id >= 150 AND doc_id <= 160)
         |  UNION ALL
         |  SELECT doc_id, text || ' u1', lang FROM documents
         |  WHERE doc_id >= 100 AND doc_id < 150
         |) ORDER BY doc_id""".stripMargin),
      "manifest-pruned range scan over the mutated store: deletes, a resurrection, and an upserted run inside the range, ≡ direct SQL"),

    "q_store_optimize" -> DeclaredQuery(
      // BIN-PACKING SMALL-FILE COMPACTION (`VersionedCorpus.optimize`,
      // Delta OPTIMIZE semantics) content-proven by oracle: three
      // small appends + an upsert + two more small appends leave two
      // packable runs; optimize rewrites EACH run as one packed
      // generation at the run-top's effective merge position, a delete
      // then lands ACROSS packed and unpacked rows, and vacuumPacked
      // reclaims the replaced originals — so the final snapshot is
      // answered from packed files only and must still hash-match
      // direct SQL row-for-row. A packed row surviving its delete,
      // an upsert losing to a packed run committed before it, or a
      // row lost/duplicated in the rewrite breaks the hash.
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-opt")
        try {
          val root = s"$tmpRoot/corpus"
          val docs = T(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("lang"))
          def slice(lo: Int, hi: Int) =
            docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
          VersionedCorpus.append(slice(0, 60), root)
          VersionedCorpus.append(slice(60, 120), root)
          VersionedCorpus.append(slice(120, 180), root)
          VersionedCorpus.upsert(
            slice(30, 90).withColumn("text", concat(col("text"), lit(" u1"))),
            root, "doc_id")
          VersionedCorpus.append(slice(180, 200), root)
          VersionedCorpus.append(slice(200, 220), root)
          val packed = VersionedCorpus.optimize(s, root, smallRows = 1000L)
          require(packed.size == 2, s"expected 2 packed runs, got $packed")
          VersionedCorpus.delete(slice(100, 190).select("doc_id"),
            root, "doc_id")
          VersionedCorpus.vacuumPacked(root)
          localFrame(VersionedCorpus.snapshot(s, root)
            .select(col("doc_id"), col("text"), col("lang"))
            .orderBy(col("doc_id")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""SELECT doc_id,
         |  CASE WHEN doc_id >= 30 AND doc_id < 90 THEN text || ' u1'
         |       ELSE text END AS text, lang
         |FROM documents
         |WHERE doc_id < 100 OR (doc_id >= 190 AND doc_id < 220)
         |ORDER BY doc_id""".stripMargin),
      "bin-packing optimize: packed runs + cross-boundary delete + reclaimed originals, final snapshot ≡ direct SQL row-for-row"),

    "q_corpus_cdf" -> DeclaredQuery(
      // CHANGE DATA FEED read side, content-proven by oracle: the
      // store's log IS the feed (`VersionedCorpus.changesBetween` —
      // a bare union of the window's own committed files with two
      // literal columns, no join, no read outside the window). The
      // lifecycle commits append / upsert / delete / COMPACT / append;
      // the full feed must carry every insert row, the upserted rows
      // with their revised text, the delete KEYS with null payloads
      // (coalesced to a sentinel so the null-ness itself is hashed),
      // correct per-commit generation ids — and NOTHING for the
      // compaction (a content-neutral rewrite emits no change rows,
      // Delta's OPTIMIZE rule). Checked row-for-row: a leaked base
      // row, wrong label, lost delete key, or mis-numbered commit
      // breaks the hash.
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-cdf")
        try {
          val root = s"$tmpRoot/corpus"
          val docs = T(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("lang"))
          VersionedCorpus.append(docs.filter(col("doc_id") < 200), root)
          VersionedCorpus.upsert(
            docs.filter(col("doc_id") >= 50 && col("doc_id") < 100)
              .withColumn("text", concat(col("text"), lit(" u1"))),
            root, "doc_id")
          VersionedCorpus.delete(
            docs.filter(col("doc_id") >= 150 && col("doc_id") < 180)
              .select("doc_id"), root, "doc_id")
          VersionedCorpus.compact(s, root) // gen 3: must emit NO rows
          VersionedCorpus.append(
            docs.filter(col("doc_id") >= 200 && col("doc_id") < 230), root)
          localFrame(VersionedCorpus.changesBetween(s, root, -1L)
            .select(col("doc_id"),
              coalesce(col("text"), lit("<null>")).as("text"),
              coalesce(col("lang"), lit("<null>")).as("lang"),
              col("_change_type").as("change_type"),
              col("_commit_gen").as("commit_gen"))
            .orderBy(col("commit_gen"), col("doc_id")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""SELECT doc_id, text, lang, change_type, commit_gen FROM (
         |  SELECT doc_id, text, lang, 'insert' AS change_type,
         |    CAST(0 AS BIGINT) AS commit_gen
         |  FROM documents WHERE doc_id < 200
         |  UNION ALL
         |  SELECT doc_id, text || ' u1', lang, 'upsert', CAST(1 AS BIGINT)
         |  FROM documents WHERE doc_id >= 50 AND doc_id < 100
         |  UNION ALL
         |  SELECT doc_id, '<null>', '<null>', 'delete', CAST(2 AS BIGINT)
         |  FROM documents WHERE doc_id >= 150 AND doc_id < 180
         |  UNION ALL
         |  SELECT doc_id, text, lang, 'insert', CAST(4 AS BIGINT)
         |  FROM documents WHERE doc_id >= 200 AND doc_id < 230
         |) ORDER BY commit_gen, doc_id""".stripMargin),
      "change data feed: every commit's change rows labeled and generation-stamped, compaction emits nothing, checked row-for-row"),

    "q_corpus_replica" -> DeclaredQuery(
      // INCREMENTAL PULL REPLICATION content-proven by oracle: a
      // replica store is built purely from the source's change feed
      // (`VersionedCorpus.replicate` — changesSince + applyChanges +
      // durable cursor), pulled in TWO waves with upsert / delete /
      // resurrection landing between them. The final replica snapshot
      // must equal, row for row, what direct SQL derives from the
      // source table — each pull moves only the NEW generations (the
      // O(changes) property that makes downstream consumers viable at
      // 100 TB), and the second pull folds a delete-then-resurrect
      // sequence whose order only the generation stamps can resolve.
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-rep")
        try {
          val src = s"$tmpRoot/src"; val dst = s"$tmpRoot/dst"
          val cursor = s"$tmpRoot/cursor.txt"
          val docs = T(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("lang"))
          VersionedCorpus.append(docs.filter(col("doc_id") < 300), src)
          VersionedCorpus.pinKey(src, "doc_id")
          VersionedCorpus.replicate(s, src, dst, "doc_id", cursor) // pull 1
          VersionedCorpus.upsert(
            docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)
              .withColumn("text", concat(col("text"), lit(" u1"))),
            src, "doc_id")
          VersionedCorpus.delete(
            docs.filter(col("doc_id") >= 50 && col("doc_id") < 150)
              .select("doc_id"), src, "doc_id")
          VersionedCorpus.append(
            docs.filter(col("doc_id") >= 60 && col("doc_id") < 80), src)
          VersionedCorpus.replicate(s, src, dst, "doc_id", cursor) // pull 2
          localFrame(VersionedCorpus.snapshot(s, dst)
            .select(col("doc_id"), col("text"), col("lang"))
            .orderBy(col("doc_id")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""SELECT doc_id, text, lang FROM (
         |  SELECT doc_id, text, lang FROM documents WHERE doc_id < 50
         |  UNION ALL
         |  SELECT doc_id, text, lang FROM documents
         |  WHERE doc_id >= 60 AND doc_id < 80
         |  UNION ALL
         |  SELECT doc_id, text || ' u1', lang FROM documents
         |  WHERE doc_id >= 150 AND doc_id < 200
         |  UNION ALL
         |  SELECT doc_id, text, lang FROM documents
         |  WHERE doc_id >= 200 AND doc_id < 300
         |) ORDER BY doc_id""".stripMargin),
      "incremental pull replication off the change feed: replica snapshot ≡ direct SQL after two pulls spanning upsert/delete/resurrection"),

    "span_dedup" -> DeclaredQuery(
      // substring-level dedup (the ExactSubstr tier, Lee et al. 2021
      // public recipe re-shaped for Spark): per-doc coverage by token
      // 8-gram spans duplicated across >= 2 distinct docs — the
      // boilerplate/license/quotation detector whole-doc MinHash never
      // catches. posexplode grams → one hash-agg on the gram key →
      // equi-join back → per-doc gaps-and-islands window merge. Fully
      // SQL-expressible, so this tier gets a real DuckDB oracle.
      (s, dir) => SpanDedup.coverageStats(T(s, dir, "documents"),
          "doc_id", "text", k = 8, minDocs = 2)
        .withColumnRenamed("_id", "doc_id")
        .orderBy(asc("doc_id")),
      Some("""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |gp AS (
         |  SELECT doc_id, toks, CAST(unnest(range(1, len(toks)-6)) AS INT) AS pos
         |  FROM t WHERE len(toks) >= 8),
         |g AS (
         |  SELECT doc_id, pos,
         |         array_to_string(list_slice(toks, pos, pos+7), ' ') AS gram
         |  FROM gp),
         |d AS (SELECT gram FROM g GROUP BY gram
         |      HAVING count(DISTINCT doc_id) >= 2),
         |p AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)),
         |isl AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
         |         THEN 0 ELSE 1 END AS brk
         |  FROM p),
         |isl2 AS (SELECT doc_id, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM isl),
         |sp AS (SELECT doc_id, island, min(pos) AS s, max(pos)+7 AS e
         |       FROM isl2 GROUP BY doc_id, island),
         |cov AS (SELECT doc_id, sum(e-s+1) AS dup_tokens, count(*) AS n_spans
         |        FROM sp GROUP BY doc_id),
         |nt AS (SELECT doc_id, len(string_split(text,' ')) AS n_tokens
         |       FROM documents)
         |SELECT nt.doc_id, CAST(nt.n_tokens AS BIGINT) AS n_tokens,
         |       CAST(coalesce(cov.dup_tokens,0) AS BIGINT) AS dup_tokens,
         |       CAST(coalesce(cov.n_spans,0) AS BIGINT) AS n_spans,
         |       round(coalesce(cov.dup_tokens,0) * 1.0 / greatest(n_tokens,1), 4)
         |         AS dup_frac
         |FROM nt LEFT JOIN cov USING (doc_id) ORDER BY doc_id""".stripMargin),
      "substring-span dedup: cross-doc duplicated 8-gram span coverage per doc"),

    "span_strip" -> DeclaredQuery(
      // the span-dedup ACTION: rewrite each doc with duplicated-span
      // tokens removed (span expansion + anti-join on position +
      // ordered reassembly). md5 of the cleaned text keeps the oracle
      // row narrow; kept_tokens must equal n_tokens - dup_tokens of
      // span_dedup (asserted in SpanDedupSpec).
      (s, dir) => SpanDedup.stripSpans(T(s, dir, "documents"),
          "doc_id", "text", k = 8, minDocs = 2)
        .select(col("_id").as("doc_id"), col("kept_tokens"),
          md5(col("cleaned_text")).as("cleaned_md5"))
        .orderBy(asc("doc_id")),
      Some("""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |gp AS (
         |  SELECT doc_id, toks, CAST(unnest(range(1, len(toks)-6)) AS INT) AS pos
         |  FROM t WHERE len(toks) >= 8),
         |g AS (
         |  SELECT doc_id, pos,
         |         array_to_string(list_slice(toks, pos, pos+7), ' ') AS gram
         |  FROM gp),
         |d AS (SELECT gram FROM g GROUP BY gram
         |      HAVING count(DISTINCT doc_id) >= 2),
         |p AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)),
         |isl AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
         |         THEN 0 ELSE 1 END AS brk
         |  FROM p),
         |isl2 AS (SELECT doc_id, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM isl),
         |sp AS (SELECT doc_id, island, min(pos) AS s, max(pos)+7 AS e
         |       FROM isl2 GROUP BY doc_id, island),
         |covpos AS (
         |  SELECT doc_id, CAST(unnest(range(s, e+1)) AS INT) AS pos FROM sp),
         |tokpos AS (
         |  SELECT doc_id, toks, CAST(unnest(range(1, len(toks)+1)) AS INT) AS pos
         |  FROM t),
         |keep AS (
         |  SELECT tp.doc_id, tp.pos, list_extract(tp.toks, tp.pos) AS tok
         |  FROM tokpos tp ANTI JOIN covpos c USING (doc_id, pos)),
         |o AS (
         |  SELECT doc_id, count(*) AS kept_tokens,
         |         array_to_string(list(tok ORDER BY pos), ' ') AS cleaned
         |  FROM keep GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(o.kept_tokens, 0) AS BIGINT) AS kept_tokens,
         |       md5(coalesce(o.cleaned, '')) AS cleaned_md5
         |FROM documents d LEFT JOIN o USING (doc_id) ORDER BY doc_id""".stripMargin),
      "substring-span dedup action: duplicated spans stripped, docs reassembled"),

    "incr_span_strip" -> DeclaredQuery(
      // incremental ingestion, SUBSTRING tier — completing the cross-set
      // family (exact, MinHash, SimHash, winnow, embedding, and now
      // span): incoming docs (doc_id >= 250) are rewritten with every
      // token run they copy from the CORPUS (doc_id < 250) removed —
      // quotation/boilerplate contamination is stripped at admission
      // while the incoming doc's novel text survives. The corpus
      // contributes only its DISTINCT gram-key projection to a
      // left-semi join (never re-processed, never all-pairs);
      // incoming-internal duplication deliberately does not trigger.
      // Fully SQL-expressible → oracle-green.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        SpanDedup.crossStripSpans(
            docs.filter(col("doc_id") >= 250),
            docs.filter(col("doc_id") < 250),
            "doc_id", "text", k = 8)
          .select(col("_id").as("doc_id"), col("kept_tokens"),
            md5(col("cleaned_text")).as("cleaned_md5"))
          .orderBy(asc("doc_id"))
      },
      Some("""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |  WHERE doc_id >= 250),
         |ct AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |  WHERE doc_id < 250),
         |gp AS (
         |  SELECT doc_id, toks, CAST(unnest(range(1, len(toks)-6)) AS INT) AS pos
         |  FROM t WHERE len(toks) >= 8),
         |g AS (
         |  SELECT doc_id, pos,
         |         array_to_string(list_slice(toks, pos, pos+7), ' ') AS gram
         |  FROM gp),
         |cgp AS (
         |  SELECT toks, CAST(unnest(range(1, len(toks)-6)) AS INT) AS pos
         |  FROM ct WHERE len(toks) >= 8),
         |cg AS (
         |  SELECT DISTINCT array_to_string(list_slice(toks, pos, pos+7), ' ')
         |    AS gram
         |  FROM cgp),
         |p AS (SELECT g.doc_id, g.pos FROM g SEMI JOIN cg USING (gram)),
         |isl AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
         |         THEN 0 ELSE 1 END AS brk
         |  FROM p),
         |isl2 AS (SELECT doc_id, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM isl),
         |sp AS (SELECT doc_id, island, min(pos) AS s, max(pos)+7 AS e
         |       FROM isl2 GROUP BY doc_id, island),
         |covpos AS (
         |  SELECT doc_id, CAST(unnest(range(s, e+1)) AS INT) AS pos FROM sp),
         |tokpos AS (
         |  SELECT doc_id, toks, CAST(unnest(range(1, len(toks)+1)) AS INT) AS pos
         |  FROM t),
         |keep AS (
         |  SELECT tp.doc_id, tp.pos, list_extract(tp.toks, tp.pos) AS tok
         |  FROM tokpos tp ANTI JOIN covpos c USING (doc_id, pos)),
         |o AS (
         |  SELECT doc_id, count(*) AS kept_tokens,
         |         array_to_string(list(tok ORDER BY pos), ' ') AS cleaned
         |  FROM keep GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(o.kept_tokens, 0) AS BIGINT) AS kept_tokens,
         |       md5(coalesce(o.cleaned, '')) AS cleaned_md5
         |FROM documents d LEFT JOIN o USING (doc_id)
         |WHERE d.doc_id >= 250 ORDER BY d.doc_id""".stripMargin),
      "incremental span dedup: incoming docs stripped of token runs copied from the corpus"),

    "incr_clean_admit" -> DeclaredQuery(
      // the FULL ingestion kernel, chained: strip corpus-copied token
      // runs from the incoming batch (substring tier), drop docs with
      // nothing novel left, then run the two-tier admission kernel
      // (exact anti-join + cross-set MinHash + Jaccard verify) on the
      // CLEANED text — Dedup.cleanAndAdmit, the same kernel the
      // streaming mirror (Streams.incrementalCleanAdmission) runs per
      // micro-batch (stream ≡ batch in StreamsSpec). Per-lang admit
      // counts + surviving token mass. Seeded-hash admission tier →
      // rows-only per the contract.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val admitted = Dedup.cleanAndAdmit(
          docs.filter(col("doc_id") >= 250),
          docs.filter(col("doc_id") < 250),
          "doc_id", "text")
        admitted
          .select(col("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("long")
              .as("kept_tokens"))
          .join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_admitted"),
            sum(col("kept_tokens")).as("kept_tokens"),
            min(col("doc_id")).as("first_id"))
          .orderBy(col("lang"))
      },
      None,
      "clean-then-admit e2e: span strip + two-tier admission on the cleaned text, per-lang rollup"),

    "incr_gated_admit" -> DeclaredQuery(
      // the QUALITY-GATED ingestion kernel: the row-local Gopher gate
      // (TextAnalysis.gopherPass — one projection, no shuffle) rejects
      // low-quality docs BEFORE they pay the cross-set dedup tiers,
      // then the two-tier admission kernel runs on the survivors —
      // Dedup.gateAndAdmit, the same kernel the streaming mirror
      // (Streams.incrementalGatedAdmission) runs per micro-batch
      // (stream ≡ batch in StreamsSpec). The rollup carries the gate's
      // accounting next to the admission's: per-lang incoming vs
      // gate-passing vs admitted. Seeded-hash admission tier →
      // rows-only per the contract.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val incoming = docs.filter(col("doc_id") >= 250)
        val corpus = docs.filter(col("doc_id") < 250)
        val admitted = Dedup.gateAndAdmit(incoming, corpus,
          "doc_id", "text")
        val gate = incoming
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_incoming"),
            sum(when(TextAnalysis.gopherPass(col("text")), 1L)
              .otherwise(0L)).as("n_gate_pass"))
        val adm = admitted
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_admitted"),
            min(col("doc_id")).as("first_id"))
        gate.join(adm, Seq("lang"), "left_outer")
          .select(col("lang"), col("n_incoming"), col("n_gate_pass"),
            coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
            col("first_id"))
          .orderBy(col("lang"))
      },
      None,
      "quality-gated admission e2e: Gopher gate first (row-local), dedup tiers on survivors, per-lang accounting"),

    "doc_stats" -> DeclaredQuery(
      (s, dir) => TextAnalysis.docStats(T(s, dir, "documents"),
        "doc_id", "text", "n_chars").orderBy(asc("doc_id")),
      Some("""SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct,
         |  round(len(list_distinct(t))::DOUBLE / len(t), 4) AS distinct_ratio,
         |  round(n_chars::DOUBLE / len(t), 4) AS chars_per_token
         |FROM (SELECT doc_id, n_chars,
         |        list_filter(string_split(text, ' '), x -> x <> '') AS t
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin),
      "B10 + quality scoring: per-doc token stats"),

    "q_token_budget" -> DeclaredQuery(
      // training-mix assembly under a per-group token budget: within
      // each lang, documents are admitted in deterministic id order
      // until the cumulative token count crosses the budget — the
      // running-sum window form of "take ~B tokens per source". Integer
      // token counts keep the running sum exact (no float-retraction
      // drift). Scale note: partitionBy(lang) gives one window partition
      // per group (same skew profile as any per-key window, cf.
      // q_top_order_per_cust); for few-group corpora at extreme size the
      // same semantics come from per-range partial sums + prefix offsets.
      (s, dir) => {
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
          .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
          .filter(col("cum_tokens") <= 2000)
          .orderBy(col("lang"), col("doc_id"))
      },
      Some("""SELECT doc_id, lang, n_tokens,
         |  CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |FROM (SELECT doc_id, lang,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM documents)
         |QUALIFY cum_tokens <= 2000
         |ORDER BY lang, doc_id""".stripMargin),
      "training-mix token budgeting: per-lang running-sum admission under a token budget"),

    "q_bpe_budget" -> DeclaredQuery(
      // q_token_budget's twin with REAL subword counts: the budget
      // window runs over size(graft_bpe(text)) — the merge-loop BPE
      // count a training mix actually budgets on — instead of the
      // whitespace proxy. Same window discipline (integer running sum,
      // per-lang, id-ordered). ORACLE-CHECKED since round 10: the
      // checked-in merges table is a plan constant, so DuckDB can replay
      // the whole encode as a GENERATED chain of boundary-aware string
      // replaces (each word becomes a U+0001-separated symbol string;
      // merge (a,b) = replace "␁a␁b␁" → "␁ab␁" in RANK order; pieces =
      // separator count − 1). Rank-order replay ≡ the encoder's
      // best-first loop when no compound symbol has two derivations —
      // verified exhaustively on every fixture word at sf0.01 AND sf0.1
      // (297,869 word instances, zero mismatches) before this row was
      // promoted from rows-only.
      (s, dir) => {
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(TextAnalysis.bpeTokens(col("text"))).cast("long").as("n_bpe"))
          .withColumn("cum_bpe", sum(col("n_bpe")).over(w))
          .filter(col("cum_bpe") <= 2000)
          .orderBy(col("lang"), col("doc_id"))
      },
      Some(bpeBudgetOracleSql),
      "training-mix token budgeting on real BPE subword counts — oracle via generated merge-replay SQL"),

    "q_pack_sequences" -> DeclaredQuery(
      // sequence packing (training-data assembly): documents are packed
      // into fixed-token training sequences in deterministic id order
      // within each lang — seq_id = floor(cum_tokens / seq_len), the
      // running-sum bucket form (same window discipline as
      // q_token_budget: integer running sums, no float retraction).
      // Output is one row per packed sequence with its doc count and
      // token mass. Scale note: the window partitions by lang (per-key
      // skew profile documented at q_token_budget); the groupBy after it
      // is partial-aggregatable.
      (s, dir) => {
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
          .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
          .withColumn("seq_id", floor(col("cum_tokens") / lit(512.0)))
          .groupBy(col("lang"), col("seq_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("seq_tokens"))
          .orderBy(col("lang"), col("seq_id"))
      },
      Some("""WITH d AS (SELECT doc_id, lang,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, lang, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM d)
         |SELECT lang, CAST(floor(cum_tokens / 512.0) AS BIGINT) AS seq_id,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
         |FROM c GROUP BY lang, seq_id ORDER BY lang, seq_id""".stripMargin),
      "sequence packing: per-lang running-sum bucket ids over fixed-token training sequences"),

    "q_repetition" -> DeclaredQuery(
      // Gopher-style repetition quality filter: fraction of a doc's
      // 2-grams occupied by its single most frequent 2-gram — the
      // standard boilerplate/spam signal a training mix drops on. Docs
      // with < 2 tokens have no 2-gram and are excluded in both engines.
      (s, dir) => TextAnalysis.repetitionStats(
        T(s, dir, "documents"), "doc_id", "text", n = 2)
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(toks)),
         |                          i -> toks[i] || ' ' || toks[i + 1])) AS gram
         |  FROM t WHERE len(toks) >= 2),
         |c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram)
         |SELECT doc_id, round(max(cnt)::DOUBLE / sum(cnt), 4) AS rep_ratio,
         |  CAST(sum(cnt) AS BIGINT) AS n_grams
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "quality scoring: max-2-gram repetition ratio (Gopher-style boilerplate filter)"),

    "q_trainmix_e2e" -> DeclaredQuery(
      // the TRAINING-MIX assembly pipeline end-to-end against ONE chained
      // oracle: exact dedup (min-id full row per token fingerprint) →
      // repetition-quality filter (max-2-gram ratio ≤ 0.2; <2-token docs
      // drop with it) → stratified per-lang hash admission → per-lang
      // token budget (running sum ≤ 4000) → packing into 512-token
      // sequences. Every stage is the declared operator the standalone
      // queries check individually (dedup_fingerprint, q_repetition,
      // q_stratified, q_token_budget, q_pack_sequences); here the CHAIN
      // is what the oracle replays, so stage composition bugs (dropped
      // columns, filter order, window re-partitioning) can't hide.
      (s, dir) => {
        val bucket = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
          lit(1000L))
        val thresh = when(col("lang") === "en", 500)
          .when(col("lang") === "fr", 250).otherwise(100)
        val dd = Dedup.dropDuplicatesByKey(
          T(s, dir, "documents").select(col("doc_id"), col("lang"), col("text")),
          Dedup.tokenFingerprint(col("text")), col("doc_id"))
        // repetition ratio as the ROW-LOCAL expression twin — joining
        // repetitionStats back onto dd would reference the dedup subtree
        // twice and re-execute its corpus-wide shuffle (the
        // shared-subtree trap); as a projection the chain stays one pass.
        // <2-token docs get a NULL ratio, and NULL <= 0.2 is NULL → the
        // filter drops them, same as the aggregate form's exclusion.
        val kept = dd
          .filter(TextAnalysis.repetitionRatioCol(col("text")) <= 0.2 &&
            bucket < thresh)
          .select(col("doc_id"), col("lang"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        kept.withColumn("cum", sum(col("n_tokens")).over(w))
          .filter(col("cum") <= 4000)
          .withColumn("seq_id", floor(col("cum") / lit(512.0)))
          .groupBy(col("lang"), col("seq_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("seq_tokens"))
          .orderBy(col("lang"), col("seq_id"))
      },
      Some("""WITH dd AS (
         |  SELECT doc_id, lang, text FROM (
         |    SELECT doc_id, lang, text,
         |      row_number() OVER (
         |        PARTITION BY array_to_string(list_sort(string_split(text, ' ')), ' ')
         |        ORDER BY doc_id) AS rn
         |    FROM documents) WHERE rn = 1),
         |t AS (SELECT doc_id, lang,
         |        list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |      FROM dd),
         |g AS (SELECT doc_id,
         |        unnest(list_transform(range(1, len(toks)),
         |                              i -> toks[i] || ' ' || toks[i + 1])) AS gram
         |      FROM t WHERE len(toks) >= 2),
         |c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram),
         |r AS (SELECT doc_id, round(max(cnt)::DOUBLE / sum(cnt), 4) AS rep_ratio
         |      FROM c GROUP BY doc_id),
         |k AS (SELECT t.doc_id, t.lang, CAST(len(t.toks) AS BIGINT) AS n_tokens
         |      FROM t JOIN r ON t.doc_id = r.doc_id
         |      WHERE r.rep_ratio <= 0.2
         |        AND ((t.doc_id % 1000003) * 2654435761) % 1000 <
         |            (CASE WHEN t.lang = 'en' THEN 500
         |                  WHEN t.lang = 'fr' THEN 250 ELSE 100 END)),
         |b AS (SELECT doc_id, lang, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |      FROM k QUALIFY cum <= 4000)
         |SELECT lang, CAST(floor(cum / 512.0) AS BIGINT) AS seq_id,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
         |FROM b GROUP BY lang, seq_id ORDER BY lang, seq_id""".stripMargin),
      "training-mix assembly e2e: dedup → repetition filter → stratified sample → budget → packing vs one chained oracle"),

    "word_freq" -> DeclaredQuery(
      (s, dir) => TextAnalysis.wordFreq(T(s, dir, "documents"), "text")
        .orderBy(desc("cnt"), asc("word")).limit(100),
      Some("""SELECT w AS word, count(*) AS cnt
         |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |WHERE w <> '' GROUP BY w ORDER BY cnt DESC, word LIMIT 100""".stripMargin),
      "B11: corpus word frequency"),

    "tfidf_top" -> DeclaredQuery(
      (s, dir) => TextAnalysis.tfIdf(T(s, dir, "documents"), "doc_id", "text")
        .orderBy(desc("tfidf"), asc("doc_id"), asc("word")).limit(100),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |             FROM documents),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok
         |       WHERE word <> '' GROUP BY doc_id, word),
         |dfc AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok
         |        WHERE word <> '' GROUP BY word),
         |n AS (SELECT count(*)::DOUBLE AS n FROM documents)
         |SELECT tf.doc_id AS doc_id, tf.word AS word,
         |  round(tf.tf * ln(n.n / dfc.df), 4) AS tfidf
         |FROM tf JOIN dfc ON tf.word = dfc.word CROSS JOIN n
         |ORDER BY tfidf DESC, tf.doc_id, tf.word LIMIT 100""".stripMargin),
      "B12: tf-idf"),

    "q_bm25" -> DeclaredQuery(
      (s, dir) => TextAnalysis.bm25(T(s, dir, "documents"), "doc_id", "text",
          Seq("spark", "data", "join"))
        .orderBy(desc("bm25"), asc("doc_id")).limit(50),
      Some("""WITH d AS (SELECT doc_id,
         |         len(list_filter(string_split(text, ' '), t -> t <> ''))::DOUBLE AS dl,
         |         list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |       FROM documents),
         |s AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM d),
         |tf AS (SELECT doc_id, dl, w AS word, count(*)::DOUBLE AS tf
         |       FROM (SELECT doc_id, dl, unnest(toks) AS w FROM d)
         |       WHERE w IN ('spark', 'data', 'join') GROUP BY doc_id, dl, w),
         |dfc AS (SELECT word, count(*)::DOUBLE AS df FROM tf GROUP BY word)
         |SELECT tf.doc_id AS doc_id,
         |  round(sum(ln(1 + (s.n - dfc.df + 0.5) / (dfc.df + 0.5))
         |    * tf.tf * 2.2
         |    / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl))), 4) AS bm25
         |FROM tf JOIN dfc USING (word) CROSS JOIN s
         |GROUP BY tf.doc_id ORDER BY bm25 DESC, doc_id LIMIT 50""".stripMargin),
      "hybrid-search keyword tier: Okapi BM25 (Robertson & Zaragoza 2009)"),

    "bm25_topk_many" -> DeclaredQuery(
      // the keyword twin of ivf_probe_many / sq_topk_many: a BATCH of
      // term-bag queries answered through one corpus pass — union-term
      // filter before the explode, broadcast (qid, word) scoring join,
      // per-query top-k on the map-side bounded aggregator.
      (s, dir) => TextAnalysis.bm25Many(T(s, dir, "documents"),
          "doc_id", "text",
          Seq(1L -> Seq("spark", "data", "join"),
            2L -> Seq("table", "row", "fast")), k = 10)
        .orderBy(col("qid"), col("rank")),
      Some("""WITH q AS (SELECT CAST(qid AS BIGINT) AS qid, word FROM (VALUES
         |        (1, 'spark'), (1, 'data'), (1, 'join'),
         |        (2, 'table'), (2, 'row'), (2, 'fast')) AS v(qid, word)),
         |d AS (SELECT doc_id,
         |         len(list_filter(string_split(text, ' '), t -> t <> ''))::DOUBLE AS dl,
         |         list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |       FROM documents),
         |s AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM d),
         |tf AS (SELECT doc_id, dl, w AS word, count(*)::DOUBLE AS tf
         |       FROM (SELECT doc_id, dl, unnest(toks) AS w FROM d)
         |       WHERE w IN (SELECT DISTINCT word FROM q)
         |       GROUP BY doc_id, dl, w),
         |dfc AS (SELECT word, count(*)::DOUBLE AS df FROM tf GROUP BY word),
         |sc AS (SELECT q.qid, tf.doc_id,
         |         round(sum(ln(1 + (s.n - dfc.df + 0.5) / (dfc.df + 0.5))
         |           * tf.tf * 2.2
         |           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl))), 4) AS bm25
         |       FROM tf JOIN dfc USING (word) JOIN q USING (word) CROSS JOIN s
         |       GROUP BY q.qid, tf.doc_id),
         |r AS (SELECT qid, doc_id, bm25,
         |        row_number() OVER (PARTITION BY qid
         |          ORDER BY bm25 DESC, doc_id) AS rank
         |      FROM sc)
         |SELECT qid, doc_id, bm25, rank FROM r WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin),
      "batched multi-query BM25: one corpus pass, per-query bounded top-k"),

    "q_store_textindex" -> DeclaredQuery(
      // PERSISTED INVERTED INDEX lifecycle (`operators.TextIndex`):
      // build the token-sharded postings index from half the corpus,
      // APPEND the other half (N/avgdl/df must merge across batches),
      // then answer BM25 from the index — reading only the shards the
      // query terms hash to — and hash-match the same scan-based
      // DuckDB oracle q_bm25 uses. STORE-LIFECYCLE row: Spark pays the
      // index build + append it certifies; the oracle replays only the
      // expected scores (exclude from any engine-vs-engine proxy).
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-tix")
        try {
          val idx = s"$tmpRoot/index"
          val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
          TextIndex.build(docs.filter(col("doc_id") % 2 === 0),
            "doc_id", "text", idx, shards = 32)
          TextIndex.append(docs.filter(col("doc_id") % 2 === 1),
            "doc_id", "text", idx)
          localFrame(TextIndex.bm25(s, idx, Seq("vector", "table", "fast"))
            .orderBy(desc("bm25"), asc("doc_id")).limit(50))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""WITH d AS (SELECT doc_id,
         |         len(list_filter(string_split(text, ' '), t -> t <> ''))::DOUBLE AS dl,
         |         list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |       FROM documents),
         |s AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM d),
         |tf AS (SELECT doc_id, dl, w AS word, count(*)::DOUBLE AS tf
         |       FROM (SELECT doc_id, dl, unnest(toks) AS w FROM d)
         |       WHERE w IN ('vector', 'table', 'fast') GROUP BY doc_id, dl, w),
         |dfc AS (SELECT word, count(*)::DOUBLE AS df FROM tf GROUP BY word)
         |SELECT tf.doc_id AS doc_id,
         |  round(sum(ln(1 + (s.n - dfc.df + 0.5) / (dfc.df + 0.5))
         |    * tf.tf * 2.2
         |    / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl))), 4) AS bm25
         |FROM tf JOIN dfc USING (word) CROSS JOIN s
         |GROUP BY tf.doc_id ORDER BY bm25 DESC, doc_id LIMIT 50""".stripMargin),
      "persisted inverted index: build + append + shard-pruned BM25 read, scores ≡ the scan-based oracle"),

    "q_forget_e2e" -> DeclaredQuery(
      // RIGHT-TO-BE-FORGOTTEN end-to-end (`operators.Forget`): the
      // corpus store, the inverted text index, and the partitioned
      // vector index are all built from the fixtures, one id slab is
      // forgotten through the single composed call, and BOTH search
      // surfaces are then queried — indexed BM25 top-20 and an
      // exhaustive (nprobe = every cell, so centroid float-iteration
      // cannot matter) vector probe top-10 — and must hash-match
      // DuckDB replaying the same searches over the SURVIVING rows.
      // A tombstone leak in either index, a stats row not corrected,
      // or a probe reading a dead vector breaks the hash. LIFECYCLE
      // row: Spark builds + mutates three stores; exclude from
      // engine-vs-engine proxies.
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-forget")
        try {
          val corpusRoot = s"$tmpRoot/corpus"; val tix = s"$tmpRoot/tix"
          val vix = s"$tmpRoot/vix"
          val docs = T(s, dir, "documents")
            .select(col("doc_id"), col("text"), col("lang"))
          val emb = T(s, dir, "embeddings")
          VersionedCorpus.append(docs, corpusRoot)
          VersionedCorpus.pinKey(corpusRoot, "doc_id")
          TextIndex.build(docs, "doc_id", "text", tix, shards = 16)
          val (assign, cents) = IvfIndex.build(emb, "vec_id", "embedding",
            k = 8, iters = 2)
          IvfIndex.writePartitioned(emb, "vec_id", assign, vix)
          val removed = Forget.forget(s,
            s.range(100L, 150L).select(col("id").as("doc_id")),
            corpusRoot = Some(corpusRoot), textIndexDir = Some(tix),
            vectorIndexPath = Some(vix))
          require(removed("corpus") == 50L && removed("text_index") == 50L,
            s"forget accounting: $removed")
          val kw = TextIndex.bm25(s, tix, Seq("data", "query", "spark"))
            .orderBy(desc("bm25"), asc("doc_id")).limit(20)
            .select(lit("bm25").as("src"), col("doc_id"),
              col("bm25").as("score"))
          val vec = IvfIndex.probePartitioned(s, vix, "vec_id", "embedding",
              cents, QueryVectors.q2, k = 10, nprobe = 8, score = cosine)
            .select(lit("cosine").as("src"), col("vec_id").as("doc_id"),
              col("sim").as("score"))
          localFrame(kw.unionByName(vec)
            .orderBy(col("src"), desc("score"), asc("doc_id")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some(s"""WITH surv AS (SELECT * FROM documents
         |  WHERE NOT (doc_id >= 100 AND doc_id < 150)),
         |d AS (SELECT doc_id,
         |         len(list_filter(string_split(text, ' '), t -> t <> ''))::DOUBLE AS dl,
         |         list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |       FROM surv),
         |st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM d),
         |tf AS (SELECT doc_id, dl, w AS word, count(*)::DOUBLE AS tf
         |       FROM (SELECT doc_id, dl, unnest(toks) AS w FROM d)
         |       WHERE w IN ('data', 'query', 'spark') GROUP BY doc_id, dl, w),
         |dfc AS (SELECT word, count(*)::DOUBLE AS df FROM tf GROUP BY word),
         |kw AS (SELECT 'bm25' AS src, tf.doc_id AS doc_id,
         |    round(sum(ln(1 + (st.n - dfc.df + 0.5) / (dfc.df + 0.5))
         |      * tf.tf * 2.2
         |      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / st.avgdl))), 4) AS score
         |  FROM tf JOIN dfc USING (word) CROSS JOIN st
         |  GROUP BY tf.doc_id ORDER BY score DESC, doc_id LIMIT 20),
         |vec AS (SELECT 'cosine' AS src, vec_id AS doc_id,
         |    round(${duckDot("embedding", q2Sql)}
         |      / (sqrt(${duckDot("embedding", "CAST(embedding AS DOUBLE[])")})
         |         * sqrt(list_dot_product($q2Sql, $q2Sql))), 4) AS score
         |  FROM embeddings WHERE NOT (vec_id >= 100 AND vec_id < 150)
         |  ORDER BY score DESC, doc_id LIMIT 10)
         |SELECT src, doc_id, score FROM (
         |  SELECT * FROM kw UNION ALL SELECT * FROM vec
         |) ORDER BY src, score DESC, doc_id""".stripMargin),
      "right-to-be-forgotten across corpus store + text index + vector index, both search surfaces ≡ DuckDB over the survivors"),

    "hybrid_rrf" -> DeclaredQuery(
      (s, dir) => {
        // each ranker is top-k-bounded FIRST (TakeOrderedAndProject), so
        // the partition-less rank window only ever sees k rows — the
        // fused join is k-sized by construction
        val kw = TextAnalysis.bm25(T(s, dir, "documents"), "doc_id", "text",
            Seq("spark", "data", "join"))
          .orderBy(desc("bm25"), asc("doc_id")).limit(50)
          .withColumn("rank",
            row_number().over(Window.orderBy(desc("bm25"), asc("doc_id"))))
          .select(col("doc_id"), col("rank"))
        val vec = Search.topK(T(s, dir, "embeddings"), "embedding", "vec_id",
            QueryVectors.q2, k = 50, score = cosine)
          .withColumn("rank",
            row_number().over(Window.orderBy(desc("sim"), asc("vec_id"))))
          .select(col("vec_id").as("doc_id"), col("rank"))
        Search.rrfFuse(kw, vec, "doc_id")
          .orderBy(desc("rrf"), asc("doc_id")).limit(20)
      },
      Some(s"""WITH d AS (SELECT doc_id,
         |         len(list_filter(string_split(text, ' '), t -> t <> ''))::DOUBLE AS dl,
         |         list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |       FROM documents),
         |s AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM d),
         |tf AS (SELECT doc_id, dl, w AS word, count(*)::DOUBLE AS tf
         |       FROM (SELECT doc_id, dl, unnest(toks) AS w FROM d)
         |       WHERE w IN ('spark', 'data', 'join') GROUP BY doc_id, dl, w),
         |dfc AS (SELECT word, count(*)::DOUBLE AS df FROM tf GROUP BY word),
         |bm AS (SELECT tf.doc_id AS doc_id,
         |         round(sum(ln(1 + (s.n - dfc.df + 0.5) / (dfc.df + 0.5))
         |           * tf.tf * 2.2
         |           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl))), 4) AS bm25
         |       FROM tf JOIN dfc USING (word) CROSS JOIN s
         |       GROUP BY tf.doc_id ORDER BY bm25 DESC, doc_id LIMIT 50),
         |kw AS (SELECT doc_id,
         |         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
         |       FROM bm),
         |vtop AS (SELECT vec_id,
         |         round(${duckDot("embedding", q2Sql)}
         |           / (sqrt(${duckDot("embedding", "CAST(embedding AS DOUBLE[])")})
         |              * sqrt(list_dot_product($q2Sql, $q2Sql))), 4) AS sim
         |       FROM embeddings ORDER BY sim DESC, vec_id LIMIT 50),
         |vs AS (SELECT vec_id AS doc_id,
         |         row_number() OVER (ORDER BY sim DESC, vec_id) AS r
         |       FROM vtop)
         |SELECT coalesce(kw.doc_id, vs.doc_id) AS doc_id,
         |  round(coalesce(1.0::DOUBLE / (60 + kw.r), 0)
         |      + coalesce(1.0::DOUBLE / (60 + vs.r), 0), 4) AS rrf
         |FROM kw FULL OUTER JOIN vs ON kw.doc_id = vs.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin),
      "hybrid search: reciprocal-rank fusion of BM25 keyword and cosine vector rankings (Cormack et al. 2009)"),

    "hybrid_rrf_many" -> DeclaredQuery(
      // the BATCHED hybrid: per-query keyword ranking (bm25Many — one
      // corpus pass for all term bags) fused with the per-query vector
      // ranking (knnJoinAgg — broadcast queries × corpus, map-side
      // bounded top-k) by reciprocal rank, completing the multi-query
      // triad keyword / vector / fused. Fully SQL-expressible →
      // oracle-checked.
      (s, dir) => {
        import s.implicits._
        val kw = TextAnalysis.bm25Many(T(s, dir, "documents"),
          "doc_id", "text",
          Seq(1L -> Seq("spark", "data", "join"),
            2L -> Seq("table", "row", "fast")), k = 20)
        val qs = Seq((1L, QueryVectors.q1), (2L, QueryVectors.q2))
          .toDF("qid", "qvec")
        val vec = Search.knnJoinAgg(qs, "qid", "qvec",
            T(s, dir, "embeddings"), "vec_id", "embedding", k = 20,
            excludeSelf = false)
          .select(col("qid"), col("cid").as("doc_id"),
            col("rank").cast("long").as("rank"))
        Search.rrfFuseMany(kw.select(col("qid"), col("doc_id"), col("rank")),
            vec, "qid", "doc_id")
          .orderBy(col("qid"), desc("rrf"), col("doc_id"))
      },
      Some(s"""WITH q AS (SELECT CAST(qid AS BIGINT) AS qid, word FROM (VALUES
         |        (1, 'spark'), (1, 'data'), (1, 'join'),
         |        (2, 'table'), (2, 'row'), (2, 'fast')) AS v(qid, word)),
         |d AS (SELECT doc_id,
         |         len(list_filter(string_split(text, ' '), t -> t <> ''))::DOUBLE AS dl,
         |         list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |       FROM documents),
         |s AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM d),
         |tf AS (SELECT doc_id, dl, w AS word, count(*)::DOUBLE AS tf
         |       FROM (SELECT doc_id, dl, unnest(toks) AS w FROM d)
         |       WHERE w IN (SELECT DISTINCT word FROM q)
         |       GROUP BY doc_id, dl, w),
         |dfc AS (SELECT word, count(*)::DOUBLE AS df FROM tf GROUP BY word),
         |sc AS (SELECT q.qid, tf.doc_id,
         |         round(sum(ln(1 + (s.n - dfc.df + 0.5) / (dfc.df + 0.5))
         |           * tf.tf * 2.2
         |           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl))), 4) AS bm25
         |       FROM tf JOIN dfc USING (word) JOIN q USING (word) CROSS JOIN s
         |       GROUP BY q.qid, tf.doc_id),
         |kw AS (SELECT qid, doc_id,
         |         row_number() OVER (PARTITION BY qid
         |           ORDER BY bm25 DESC, doc_id) AS r
         |       FROM sc QUALIFY r <= 20),
         |vq AS (SELECT CAST(1 AS BIGINT) AS qid, $q1Sql AS qvec
         |       UNION ALL SELECT CAST(2 AS BIGINT), $q2Sql),
         |vsc AS (SELECT vq.qid, e.vec_id AS doc_id,
         |          round(list_dot_product(CAST(e.embedding AS DOUBLE[]), vq.qvec)
         |            / nullif(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
         |                                           CAST(e.embedding AS DOUBLE[])))
         |               * sqrt(list_dot_product(vq.qvec, vq.qvec)), 0), 4) AS sim
         |        FROM embeddings e CROSS JOIN vq),
         |vs AS (SELECT qid, doc_id,
         |         row_number() OVER (PARTITION BY qid
         |           ORDER BY sim DESC, doc_id) AS r
         |       FROM vsc WHERE sim IS NOT NULL QUALIFY r <= 20)
         |SELECT coalesce(kw.qid, vs.qid) AS qid,
         |  coalesce(kw.doc_id, vs.doc_id) AS doc_id,
         |  round(coalesce(1.0::DOUBLE / (60 + kw.r), 0)
         |      + coalesce(1.0::DOUBLE / (60 + vs.r), 0), 4) AS rrf
         |FROM kw FULL OUTER JOIN vs ON kw.qid = vs.qid AND kw.doc_id = vs.doc_id
         |ORDER BY qid, rrf DESC, doc_id""".stripMargin),
      "batched hybrid search: per-query RRF fusion of BM25 and cosine rankings"),

    "lang_rollup" -> DeclaredQuery(
      (s, dir) => T(s, dir, "documents")
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"),
          col("cnt"), col("chars"))
        .orderBy(asc("lang"), asc("source")),
      Some("""SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
         |  count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS chars
         |FROM documents GROUP BY ROLLUP(lang, source)
         |ORDER BY lang, source""".stripMargin),
      "B13+B25: language/source distribution via ROLLUP"),

    // ----- relational core over the TPC-H-ish fixtures --------------------

    "q1_pricing" -> DeclaredQuery(
      (s, dir) => T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r4(dbl(decSum(col("l_quantity")))).as("sum_qty"),
          r4(dbl(decSum(col("l_extendedprice")))).as("sum_price"),
          r4(dbl(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))))
            .as("sum_disc"),
          r4(dbl(decSum(col("l_quantity"))) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
         |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price,
         |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_disc,
         |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
         |  count(*) AS cnt
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      "B22: two-phase hash aggregation (TPC-H Q1 shape)"),

    "q_region_acct" -> DeclaredQuery(
      (s, dir) => T(s, dir, "customer")
        .join(broadcast(T(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_cust"),
          r4(dbl(decSum(col("c_acctbal")))).as("sum_acctbal"))
        .orderBy(col("r_name")),
      Some("""SELECT r_name, count(*) AS n_cust,
         |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_acctbal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin),
      "B18: broadcast hash joins through the dimension chain"),

    "q_priority_join" -> DeclaredQuery(
      (s, dir) => T(s, dir, "orders")
        .join(T(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          r4(dbl(decSum(col("l_quantity")))).as("sum_qty"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, count(*) AS n_items,
         |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      "B19: shuffle (sort-merge) fact-to-fact equi-join"),

    "q_semi" -> DeclaredQuery(
      (s, dir) => T(s, dir, "customer")
        .join(T(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, count(*) AS n_cust
         |FROM customer WHERE EXISTS
         |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      "B20: left-semi join (EXISTS)"),

    "q_anti" -> DeclaredQuery(
      (s, dir) => T(s, dir, "customer")
        .join(T(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")).limit(100),
      Some("""SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS
         |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |ORDER BY c_custkey LIMIT 100""".stripMargin),
      "B20: left-anti join (NOT EXISTS)"),

    "q_top_order_per_cust" -> DeclaredQuery(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        T(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("top_price"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS top_price
         |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
         |        row_number() OVER (PARTITION BY o_custkey
         |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
         |      FROM orders)
         |WHERE rn = 1 ORDER BY o_custkey""".stripMargin),
      "B26: window row_number per partition"),

    "q_mov_sum" -> DeclaredQuery(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id")).rowsBetween(-2, 0)
        T(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            r4(dbl(sum(col("value").cast(DecimalType(18, 4))).over(w)))
              .as("msum"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
         |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS msum
         |FROM events ORDER BY user_id, event_id""".stripMargin),
      "B26: sliding window frame (exact DECIMAL so retraction is lossless)"),

    "q_funnel" -> DeclaredQuery(
      (s, dir) => {
        val ev = T(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("t1"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("u2"), col("ts").as("t2"))
        clicks.join(purchases,
          col("user_id") === col("u2") &&
            col("t2") >= col("t1") &&
            col("t2") <= col("t1") + expr("INTERVAL 10 MINUTES"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT c.user_id, count(*) AS n_pairs
         |FROM events c JOIN events p
         |  ON p.user_id = c.user_id
         | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
         |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
         |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin),
      "B21: range join (equi on user + time-window predicate)"),

    "q_asof" -> DeclaredQuery(
      (s, dir) => {
        val ev = T(s, dir, "events")
        graft.operators.AsOf.asOfJoin(
          ev.filter(col("event_type") === "purchase"), "event_id", "user_id", "ts",
          ev.filter(col("event_type") === "click"), "event_id", "user_id", "ts",
          expr("INTERVAL 30 MINUTES"))
          .select(col("_lid").as("pid"), col("_rid").as("cid"),
            col("_rt").as("cts"))
          .orderBy(col("pid"))
      },
      Some("""WITH p AS (SELECT event_id AS pid, user_id, ts FROM events
         |          WHERE event_type = 'purchase'),
         |c AS (SELECT event_id AS cid, user_id, ts AS cts FROM events
         |      WHERE event_type = 'click')
         |SELECT pid, cid, cts FROM (
         |  SELECT p.pid, c.cid, c.cts,
         |    row_number() OVER (PARTITION BY p.pid
         |      ORDER BY c.cts DESC, c.cid DESC) AS rn
         |  FROM p JOIN c ON c.user_id = p.user_id
         |    AND c.cts <= p.ts AND c.cts >= p.ts - INTERVAL 30 MINUTE)
         |WHERE rn = 1 ORDER BY pid""".stripMargin),
      "B21: as-of join = range join + latest-match pick via max(struct)"),

    "q_setops" -> DeclaredQuery(
      (s, dir) => T(s, dir, "customer")
        .filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"))
        .intersect(T(s, dir, "orders").select(col("o_custkey")))
        .orderBy(col("c_custkey")).limit(200),
      Some("""SELECT c_custkey FROM customer WHERE c_acctbal > 5000
         |INTERSECT
         |SELECT o_custkey FROM orders
         |ORDER BY c_custkey LIMIT 200""".stripMargin),
      "B28: INTERSECT"),

    "q_cube" -> DeclaredQuery(
      (s, dir) => T(s, dir, "documents")
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("cnt"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"), col("cnt"))
        .orderBy(asc("lang"), asc("source")),
      Some("""SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
         |  count(*) AS cnt
         |FROM documents GROUP BY CUBE(lang, source)
         |ORDER BY lang, source""".stripMargin),
      "B25: CUBE grouping sets"),

    "q_intersect_all" -> DeclaredQuery(
      (s, dir) => T(s, dir, "orders").select(col("o_custkey"))
        .intersectAll(T(s, dir, "orders")
          .filter(col("o_totalprice") > 1000).select(col("o_custkey")))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_custkey")).limit(300),
      Some("""SELECT o_custkey, count(*) AS n FROM (
         |  SELECT o_custkey FROM orders
         |  INTERSECT ALL
         |  SELECT o_custkey FROM orders WHERE o_totalprice > 1000)
         |GROUP BY o_custkey ORDER BY o_custkey LIMIT 300""".stripMargin),
      "B28: INTERSECT ALL (multiset semantics)"),

    "q_pivot" -> DeclaredQuery(
      (s, dir) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        val p = T(s, dir, "documents")
          .groupBy(col("source")).pivot("lang", langs).agg(count(lit(1)))
        p.select(col("source") +:
          langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
          .orderBy(col("source"))
      },
      Some("""SELECT source,
         |  count(*) FILTER (lang = 'de') AS de,
         |  count(*) FILTER (lang = 'en') AS en,
         |  count(*) FILTER (lang = 'es') AS es,
         |  count(*) FILTER (lang = 'fr') AS fr,
         |  count(*) FILTER (lang = 'zh') AS zh
         |FROM documents GROUP BY source ORDER BY source""".stripMargin),
      "pivot (wide conditional aggregation)"),

    "q_sample_split" -> DeclaredQuery(
      // deterministic train/val/test split — the training-pipeline
      // sampling op. The split key is a Knuth multiplicative hash of the
      // row id, NOT rand(): a seeded rand() is partition-order-dependent
      // and re-rolls on task retry (the SPARK-23207 class), whereas a
      // content-derived hash reproduces the same split on any cluster,
      // any partitioning, any engine — which is what makes it
      // oracle-checkable here
      (s, dir) => {
        // pre-modulo bounds the product to ~2.6e15 (< int64 max), so the
        // arithmetic never overflows: Spark would wrap silently where
        // DuckDB errors, breaking the engine-portability claim on ids
        // past ~3.5e9
        val bucket = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
          lit(1000L))
        T(s, dir, "documents")
          .withColumn("split",
            when(bucket < 800, "train").when(bucket < 900, "val")
              .otherwise("test"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n"),
            sum(length(col("text")).cast("long")).as("total_chars"),
            countDistinct(col("lang")).as("n_langs"))
          .orderBy(col("split"))
      },
      Some("""SELECT CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000 < 800 THEN 'train'
         |            WHEN ((doc_id % 1000003) * 2654435761) % 1000 < 900 THEN 'val'
         |            ELSE 'test' END AS split,
         |  count(*) AS n,
         |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |FROM documents GROUP BY split ORDER BY split""".stripMargin),
      "deterministic hash-based train/val/test split (retry-safe, engine-portable)"),

    "q_shard_output" -> DeclaredQuery(
      // deterministic shard routing + the balance audit a training-mix
      // WRITER emits: every doc hash-routes to one of 16 shards
      // (Sampling.hashShard — retry-safe and parallelism-independent,
      // so a resumed job rewrites identical shards), and the row set
      // reports each shard's doc count and token mass. The write-time
      // layout is repartition(shard) + partitionBy(shard) — exercised
      // and checked in SamplingSpec; this row oracle-checks the ROUTING
      // and the balance accounting, which is the part with cross-engine
      // semantics.
      (s, dir) => Sampling.hashShard(T(s, dir, "documents"), "doc_id", 16)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextAnalysis.tokens(col("text"))).cast("long"))
            .as("shard_tokens"))
        .orderBy(col("shard")),
      Some("""SELECT ((doc_id % 1000003) * 2654435761) % 16 AS shard,
         |  count(*) AS n_docs,
         |  CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
         |    AS BIGINT) AS shard_tokens
         |FROM documents GROUP BY shard ORDER BY shard""".stripMargin),
      "deterministic hash-shard routing + per-shard balance audit (training-mix writer)"),

    "q_stratified" -> DeclaredQuery(
      // deterministic STRATIFIED sampling — training-mix construction
      // with per-source rates (downsample the over-represented language,
      // keep more of the rare ones). Same Knuth-hash bucket discipline
      // as q_sample_split (retry-safe, partition-independent,
      // engine-portable — a per-group sampleBy(rand) would be none of
      // those); the per-lang rate is a plain CASE threshold on the
      // bucket, so admission is a row-local projection and the only
      // shuffle is the final per-lang rollup.
      (s, dir) => {
        val bucket = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
          lit(1000L))
        val thresh = when(col("lang") === "en", 500)
          .when(col("lang") === "fr", 250).otherwise(100)
        T(s, dir, "documents")
          .withColumn("_keep", bucket < thresh)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("_keep"), size(TextAnalysis.tokens(col("text")))
              .cast("long")).otherwise(0L)).as("kept_tokens"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_total,
         |  CAST(sum(CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000 <
         |      (CASE WHEN lang = 'en' THEN 500 WHEN lang = 'fr' THEN 250 ELSE 100 END)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000 <
         |      (CASE WHEN lang = 'en' THEN 500 WHEN lang = 'fr' THEN 250 ELSE 100 END)
         |    THEN len(list_filter(string_split(text, ' '), x -> x <> ''))
         |    ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
      "deterministic stratified per-lang sampling (training-mix rates via hash thresholds)"),

    "q_temperature_mix" -> DeclaredQuery(
      // TEMPERATURE-weighted source mixing (α = 0.5) — the multinomial
      // rebalancing the multilingual/multi-source training mixes use:
      // source s is sampled ∝ n_s^α instead of ∝ n_s, flattening the
      // head and upweighting rare sources. The whole chain is
      // INTEGER-exact so it stays oracle-green across engines: the
      // weight is floor(sqrt(n_s)) — sqrt is IEEE-correctly-rounded
      // (unlike pow, which is why α is 0.5 and not a free parameter
      // here) and the floor can never cross an integer for non-square
      // n (|√n − m| ≥ 1/(2m+1) ≫ ulp) — the per-source admission
      // threshold is pure int64 arithmetic (div, not /), and admission
      // is the q_sample_split Knuth-hash bucket (retry-safe,
      // partition-independent, engine-portable). Plan shape: one tiny
      // per-source agg, a broadcast of |sources| threshold rows back
      // onto the corpus scan, one final rollup — the corpus flows once.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val budget = 100L // target docs in the mix
        val counts = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_total"))
          .withColumn("w", floor(sqrt(col("n_total"))).cast("long"))
        val thr = counts
          .crossJoin(counts.agg(sum(col("w")).as("_wsum")))
          .withColumn("_num", lit(1000000L) * lit(budget) * col("w"))
          .withColumn("_den", col("_wsum") * col("n_total"))
          // int64 `div`, not `/`: float division re-rounds the quotient
          // and the oracle compare is bit-strict on the threshold
          .withColumn("thr", least(lit(1000000L), expr("_num div _den")))
          .select(col("source"), col("n_total"), col("w"), col("thr"))
        val hash6 = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
          lit(1000000L))
        docs.join(broadcast(thr), "source")
          .withColumn("_keep", hash6 < col("thr"))
          .groupBy(col("source"), col("n_total"), col("w"), col("thr"))
          .agg(sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("_keep"), size(TextAnalysis.tokens(col("text")))
              .cast("long")).otherwise(0L)).as("kept_tokens"))
          .orderBy(col("source"))
      },
      Some("""WITH c AS (
         |  SELECT source, count(*) AS n_total,
         |    CAST(floor(sqrt(count(*))) AS BIGINT) AS w
         |  FROM documents GROUP BY source),
         |t AS (
         |  SELECT c.source, c.n_total, c.w,
         |    CAST(least(1000000,
         |      (1000000 * 100 * c.w) // (CAST(ws.wsum AS BIGINT) * c.n_total))
         |      AS BIGINT) AS thr
         |  FROM c, (SELECT sum(w) AS wsum FROM c) ws)
         |SELECT t.source, t.n_total, t.w, t.thr,
         |  CAST(sum(CASE WHEN ((d.doc_id % 1000003) * 2654435761) % 1000000 < t.thr
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN ((d.doc_id % 1000003) * 2654435761) % 1000000 < t.thr
         |    THEN len(list_filter(string_split(d.text, ' '), x -> x <> ''))
         |    ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM documents d JOIN t ON d.source = t.source
         |GROUP BY t.source, t.n_total, t.w, t.thr
         |ORDER BY t.source""".stripMargin),
      "temperature-weighted (alpha=0.5) source mix: integer-exact sqrt weights + hash admission"),

    "q_unpivot" -> DeclaredQuery(
      // wide→long melt via the native unpivot operator (pure projection +
      // generate — no shuffle before the final sort)
      (s, dir) => T(s, dir, "part")
        .filter(col("p_partkey") <= 100)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          col("p_retailprice").cast("double").as("retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
          "metric", "value")
        .orderBy(col("p_partkey"), col("metric")),
      Some("""SELECT p_partkey, metric, value FROM (
         |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
         |  FROM part WHERE p_partkey <= 100
         |  UNION ALL
         |  SELECT p_partkey, 'retailprice', CAST(p_retailprice AS DOUBLE)
         |  FROM part WHERE p_partkey <= 100)
         |ORDER BY p_partkey, metric""".stripMargin),
      "unpivot/melt (wide→long), UNION ALL-equivalent"),

    "q_stats" -> DeclaredQuery(
      (s, dir) => T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(r4(median(col("l_quantity"))).as("med_qty"),
          r4(percentile(col("l_extendedprice"), lit(0.9))).as("p90_price"),
          r4(stddev_samp(col("l_quantity"))).as("sd_qty"),
          r4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
          r4(covar_samp(col("l_quantity"), col("l_discount"))).as("cov_qd"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, round(median(l_quantity), 4) AS med_qty,
         |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
         |  round(stddev_samp(l_quantity), 4) AS sd_qty,
         |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
         |  round(covar_samp(l_quantity, l_discount), 4) AS cov_qd
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      "statistical aggregates: median / percentile / stddev / corr / covar"),

    "q_grouping_sets" -> DeclaredQuery(
      // deliberately through the spark.sql surface (direct-file SQL):
      // the engine's SQL entry point is part of the contract
      // NULL key values are excluded so coalesce's 'ALL' marker can only
      // mean "grouping null" — otherwise a NULL-lang group and the grand
      // total would share a sort key and the row order would be ambiguous
      (s, dir) => s.sql(
        s"""SELECT coalesce(lang, 'ALL') AS lang,
           |  coalesce(source, 'ALL') AS source, count(*) AS cnt
           |FROM parquet.`$dir/documents.parquet`
           |WHERE lang IS NOT NULL AND source IS NOT NULL
           |GROUP BY GROUPING SETS ((lang), (source), ())
           |ORDER BY lang, source""".stripMargin),
      Some("""SELECT coalesce(lang, 'ALL') AS lang,
         |  coalesce(source, 'ALL') AS source, count(*) AS cnt
         |FROM documents
         |WHERE lang IS NOT NULL AND source IS NOT NULL
         |GROUP BY GROUPING SETS ((lang), (source), ())
         |ORDER BY lang, source""".stripMargin),
      "B25: explicit GROUPING SETS via the SQL surface"),

    "q_corr_subquery" -> DeclaredQuery(
      (s, dir) => s.sql(
        s"""SELECT c_custkey,
           |  (SELECT count(*) FROM parquet.`$dir/orders.parquet` o
           |   WHERE o.o_custkey = c.c_custkey) AS n_orders
           |FROM parquet.`$dir/customer.parquet` c
           |ORDER BY c_custkey LIMIT 200""".stripMargin),
      Some("""SELECT c_custkey,
         |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
         |    AS n_orders
         |FROM customer c ORDER BY c_custkey LIMIT 200""".stripMargin),
      "correlated scalar subquery (Catalyst decorrelates to an aggregate join)"),

    "q_lateral" -> DeclaredQuery(
      // correlated LATERAL derived table (SQL surface): per-customer
      // top-2 orders by price — Catalyst decorrelates + plans the inner
      // top-k per group without a per-row re-execution
      (s, dir) => s.sql(
        s"""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
           |FROM parquet.`$dir/customer.parquet` c,
           |LATERAL (
           |  SELECT o_orderkey, o_totalprice
           |  FROM parquet.`$dir/orders.parquet` o
           |  WHERE o.o_custkey = c.c_custkey
           |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
           |WHERE c.c_custkey <= 100
           |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin),
      Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
         |FROM customer c,
         |LATERAL (
         |  SELECT o_orderkey, o_totalprice
         |  FROM orders o
         |  WHERE o.o_custkey = c.c_custkey
         |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
         |WHERE c.c_custkey <= 100
         |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin),
      "correlated LATERAL derived table (per-key top-k via SQL surface)"),

    "q_lag_rank" -> DeclaredQuery(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wv = Window.partitionBy(col("user_id"))
          .orderBy(desc("value"), asc("event_id"))
        T(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            r4(col("value") - lag(col("value"), 1).over(w)).as("d_prev"),
            rank().over(wv).cast("long").as("rnk"),
            dense_rank().over(wv).cast("long").as("drnk"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
         |  round(value - lag(value, 1) OVER
         |    (PARTITION BY user_id ORDER BY ts, event_id), 4) AS d_prev,
         |  rank() OVER (PARTITION BY user_id
         |    ORDER BY value DESC, event_id) AS rnk,
         |  dense_rank() OVER (PARTITION BY user_id
         |    ORDER BY value DESC, event_id) AS drnk
         |FROM events ORDER BY user_id, event_id""".stripMargin),
      "B26: lag / rank / dense_rank window family"),

    "q_monthly" -> DeclaredQuery(
      (s, dir) => T(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"),
          r4(dbl(decSum(col("o_totalprice")))).as("sum_price"))
        .orderBy(col("month")),
      Some("""SELECT date_trunc('month', o_orderdate) AS month,
         |  count(*) AS n_orders,
         |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price
         |FROM orders GROUP BY month ORDER BY month""".stripMargin),
      "B29: date_trunc bucket aggregation"),

    "q_string_fns" -> DeclaredQuery(
      (s, dir) => T(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("pfx"),
          length(col("p_name")).cast("long").as("nlen"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("bt"),
          regexp_extract(col("p_name"), "^([a-z]+)", 1).as("w1"))
        .orderBy(col("p_partkey")).limit(300),
      Some("""SELECT p_partkey, upper(p_name) AS uname,
         |  substring(p_name, 1, 5) AS pfx,
         |  length(p_name) AS nlen,
         |  concat(p_brand, '/', p_type) AS bt,
         |  regexp_extract(p_name, '^([a-z]+)', 1) AS w1
         |FROM part ORDER BY p_partkey LIMIT 300""".stripMargin),
      "B14: string scalar functions"),

    "q_math_fns" -> DeclaredQuery(
      (s, dir) => T(s, dir, "part")
        .select(col("p_partkey"),
          r4(sqrt(col("p_retailprice"))).as("rsqrt"),
          r4(log(col("p_retailprice"))).as("rln"),
          pow(col("p_size"), 2).as("p2"),
          floor(col("p_retailprice")).cast("long").as("fl"),
          ceil(col("p_retailprice")).cast("long").as("ce"),
          abs(col("p_size") - 25).as("ab"))
        .orderBy(col("p_partkey")).limit(300),
      Some("""SELECT p_partkey, round(sqrt(p_retailprice), 4) AS rsqrt,
         |  round(ln(p_retailprice), 4) AS rln,
         |  pow(p_size, 2) AS p2,
         |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
         |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
         |  abs(p_size - 25) AS ab
         |FROM part ORDER BY p_partkey LIMIT 300""".stripMargin),
      "B30: math scalar functions"),

    "q_array_fns" -> DeclaredQuery(
      // first5 is emitted as a space-joined STRING, not a raw array: the
      // driver's comparer sorts result columns with pandas, which cannot
      // hash numpy array cells (round-1 red row). The array ops under it
      // (slice/sort_array/array_distinct/array_contains) are unchanged.
      (s, dir) => T(s, dir, "documents")
        .select(col("doc_id"),
          array_join(slice(sort_array(split(col("text"), " ")), 1, 5), " ")
            .as("first5"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct"),
          array_contains(split(col("text"), " "), "spark").as("has_spark"))
        .orderBy(col("doc_id")).limit(500),
      Some("""SELECT doc_id,
         |  array_to_string((list_sort(string_split(text, ' ')))[1:5], ' ') AS first5,
         |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
         |  list_contains(string_split(text, ' '), 'spark') AS has_spark
         |FROM documents ORDER BY doc_id LIMIT 500""".stripMargin),
      "B31: array functions"),

    "q_json_agg" -> DeclaredQuery(
      (s, dir) => T(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(get_json_object(col("props"), "$.k").cast("long")).as("k_sum"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n,
         |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      "B15: JSON extraction + aggregation"),

    "q_distinct_parts" -> DeclaredQuery(
      (s, dir) => T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(*) AS n_rows,
         |  count(DISTINCT l_partkey) AS n_parts,
         |  count(DISTINCT l_suppkey) AS n_supps
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      "B23: distinct aggregation"),

    "corpus_stats" -> DeclaredQuery(
      (s, dir) => T(s, dir, "documents")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources")),
      Some("""SELECT count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
         |  count(DISTINCT lang) AS n_langs, count(DISTINCT source) AS n_sources
         |FROM documents""".stripMargin),
      "A8: corpus stats (count/min/max/distinct)"),

    "q_filter_pushdown" -> DeclaredQuery(
      (s, dir) => T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber")).limit(500),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_quantity < 10
         |ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin),
      "B17: predicate + projection pushdown to the parquet scan"),

    // ----- streaming-tier expressions, batch-checked (B34/B35) ------------

    "q_tumbling" -> DeclaredQuery(
      (s, dir) => Streams.tumblingAgg(T(s, dir, "events"), "1 hour")
        .orderBy(col("bucket"), col("event_type")),
      Some("""SELECT date_trunc('hour', ts) AS bucket, event_type,
         |  count(*) AS n,
         |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
         |FROM events GROUP BY bucket, event_type
         |ORDER BY bucket, event_type""".stripMargin),
      "B34: tumbling window agg (same expression runs under readStream)"),

    "q_sliding" -> DeclaredQuery(
      (s, dir) => Streams.slidingAgg(T(s, dir, "events"), "1 hour", "30 minutes")
        .orderBy(col("bucket"), col("event_type")),
      Some("""SELECT TIMESTAMP '1970-01-01'
         |    + ((CAST(floor(epoch(ts) / 1800) AS BIGINT) - o.i) * 1800) * INTERVAL 1 SECOND
         |    AS bucket,
         |  event_type, count(*) AS n
         |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) o
         |GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin),
      "B34: sliding window agg — each event lands in width/slide buckets"),

    "q_session" -> DeclaredQuery(
      (s, dir) => Streams.sessionAgg(T(s, dir, "events"), "10 minutes")
        .orderBy(col("user_id"), col("session_start")),
      Some("""WITH x AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |              >= INTERVAL 10 MINUTE
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM events),
         |y AS (
         |  SELECT user_id, ts,
         |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM x)
         |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
         |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin),
      "B35: session windows ≡ gaps-and-islands in batch"),

    // ----- near-dup verification tier (oracle-expressible pieces) ---------

    "jaccard_pairs" -> DeclaredQuery(
      (s, dir) => {
        val sub = T(s, dir, "documents").filter(col("doc_id") < 40)
        val pairs = sub.select(col("doc_id").as("id_a"))
          .crossJoin(sub.select(col("doc_id").as("id_b")))
          .filter(col("id_a") < col("id_b"))
        NearDup.jaccardVerify(sub, "doc_id", "text", pairs, shingleSize = 1)
          .filter(col("jaccard") >= 0.5)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH d AS (
         |  SELECT doc_id,
         |    list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS s
         |  FROM documents WHERE doc_id < 40
         |    AND len(list_filter(string_split(text, ' '), x -> x <> '')) > 0)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(len(list_intersect(a.s, b.s))::DOUBLE
         |    / len(list_distinct(a.s || b.s)), 4) AS jaccard
         |FROM d a JOIN d b ON a.doc_id < b.doc_id
         |WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
         |    / len(list_distinct(a.s || b.s)), 4) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin),
      "B8 verify: token-set Jaccard over candidate pairs"),

    "exact_jaccard_join" -> DeclaredQuery(
      // EXACT similarity self-join over the WHOLE corpus without an
      // all-pairs comparison: prefix-filtered candidates (AllPairs/
      // PPJoin bound — rarest-first token order, per-doc prefixes,
      // inverted-index join) + exact verify. The oracle replays the
      // quadratic all-pairs form — identical rows proves the prefix
      // bound lost nothing, which is the operator's whole claim.
      (s, dir) => NearDup.prefixJaccardJoin(T(s, dir, "documents"),
          "doc_id", "text", minJaccard = 0.8)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH t AS (SELECT doc_id,
         |         list_filter(string_split(text, ' '), x -> x <> '') AS t
         |       FROM documents),
         |d AS (SELECT doc_id, list_distinct(
         |        CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
         |             ELSE list_transform(range(1, len(t) - 1),
         |                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         |        END) AS s
         |      FROM t WHERE len(t) > 0)
         |SELECT id_a, id_b, jaccard FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    round(len(list_intersect(a.s, b.s))::DOUBLE
         |      / len(list_distinct(a.s || b.s)), 4) AS jaccard
         |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
         |WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin),
      "exact Jaccard self-join via prefix filtering (AllPairs/PPJoin) ≡ all-pairs oracle"),

    "minhash_recall" -> DeclaredQuery(
      // driver-visible LSH-tier QUALITY evidence (the ivf_recall
      // discipline applied to text dedup): candidate recall of the
      // shared MinHash memo against the EXACT ≥ 0.8 pair set — which
      // the prefix-filtered exact join computes subquadratically, so
      // the ground truth itself scales (an all-pairs exact side would
      // be quadratic in the corpus). Seeded-hash candidates →
      // rows-only; the VALUE is the point: banding that loses dup
      // pairs surfaces here as a recall drop, driver-visible.
      (s, dir) => {
        val exact = sharedExactPairs(s, dir).select(col("id_a"), col("id_b"))
        val got = sharedMinhashVerified(s, dir)
          .filter(col("jaccard") >= 0.8).select(col("id_a"), col("id_b"))
        val hit = exact.join(got, Seq("id_a", "id_b"), "left_semi")
        localFrame(exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
          .select(col("n_exact"), col("n_hit"),
            r4(col("n_hit").cast("double") / col("n_exact")).as("recall")))
      },
      None,
      "MinHash-LSH candidate recall vs the exact prefix-join pair set"),

    "near_dup_tier_recall" -> DeclaredQuery(
      // the WHOLE candidate-tier dashboard in one row set — coverage of
      // the exact ≥ 0.8 Jaccard ground truth (the prefix-join memo) by
      // each candidate generator a pipeline might deploy alone:
      // MinHash-LSH (the designed-for-this tier — its number is the
      // calibrated ≥ 0.9 promise), SimHash hamming buckets and
      // winnowing fingerprints (different dup definitions — their
      // coverage of the Jaccard truth is exactly what a user choosing
      // ONE tier needs to see, and WHY the admission kernel runs the
      // MinHash tier). Seeded hashes throughout → rows-only; the
      // values are the point.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val exact = sharedExactPairs(s, dir).select(col("id_a"), col("id_b"))
        def coverage(tier: String, cands: DataFrame): DataFrame = {
          val hit = exact.join(cands.select(col("id_a"), col("id_b")),
            Seq("id_a", "id_b"), "left_semi")
          exact.agg(count(lit(1)).as("n_exact"))
            .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
            .select(lit(tier).as("tier"), col("n_exact"), col("n_hit"),
              r4(col("n_hit").cast("double") / col("n_exact")).as("recall"))
        }
        localFrame(
          coverage("minhash",
            sharedMinhashVerified(s, dir).filter(col("jaccard") >= 0.8))
          .unionAll(coverage("simhash",
            NearDup.simHashCandidates(docs, "doc_id", "text")))
          .unionAll(coverage("winnow",
            NearDup.winnowCandidates(docs, "doc_id", "text")))
          .orderBy(col("tier")))
      },
      None,
      "per-tier candidate coverage of the exact Jaccard ground truth"),

    "dedup_clusters" -> DeclaredQuery(
      // label CONSUMPTION row: reads the per-dir component-label memo
      // (built once per corpus version — the `_dedup_cc_build` infra
      // line) the way every at-scale consumer reads the maintained
      // labels table. The live clustering algorithms stay benchmarked
      // in `dedup_clusters_star` (contraction, this oracle) and
      // `dedup_pipeline_lsh` (propagation over the MinHash edges).
      (s, dir) => sharedDedupLabels(s, dir).orderBy("doc_id"),
      Some(dedupClustersOracle),
      "dedup clustering: Jaccard edges → connected components (min-label propagation)"),

    "dedup_clusters_star" -> DeclaredQuery(
      // the LARGE-STAR/SMALL-STAR CONTRACTION variant of dedup_clusters,
      // through the SAME recursive-CTE oracle: identical edges (shared
      // per-dir memo), identical expected labels — the polylog-round
      // contraction path (Dedup.starContractionLabels, Kiveris et al.
      // 2014) proven oracle-green, not just spec-equivalent. The
      // propagation twin above stays the default (shallow dup graphs
      // converge in a handful of rounds at lower per-round cost).
      (s, dir) => dedupClustersFrame(s, dir, starContraction = true),
      Some(dedupClustersOracle),
      "dedup clustering via star contraction: same edges + oracle as dedup_clusters"),

    "dedup_best_rep" -> DeclaredQuery(
      // QUALITY-AWARE canonical selection — the refinement every
      // production dedup applies after clustering: keep each near-dup
      // cluster's BEST member (here: richest vocabulary = most distinct
      // tokens; integer-exact, so the whole chain stays oracle-green),
      // ties → smallest id, instead of an arbitrary min-id pick.
      // Same shared edges + components as dedup_clusters; the argmax is
      // Dedup.keepBestByKey — a partial-aggregatable (key → min-struct)
      // agg, single shuffle, no per-group sort, so the selection costs
      // the same as the min-id pick at any scale.
      (s, dir) => {
        val toks = filter(split(col("text"), " "), x => x =!= lit(""))
        val sub = T(s, dir, "documents").filter(col("doc_id") < 128)
          .select(col("doc_id"),
            size(array_distinct(toks)).cast("long").as("n_types"))
        // consumes the maintained label memo (same discipline as
        // dedup_clusters); the selection itself — docs ⋈ labels, one
        // quality argmax per component, sizes join — runs live, and is
        // the same single-shuffle keepBestByKey shape dedupFromEdges
        // plans at any scale
        val cc = sharedDedupLabels(s, dir)
        val sizes = cc.groupBy(col("component")).agg(count(lit(1)).as("n_docs"))
        val reps = Dedup.keepBestByKey(sub.join(cc, "doc_id"),
          col("component"), col("n_types"), col("doc_id"))
        localFrame(reps.join(sizes, "component")
          .select(col("component"), col("doc_id").as("rep_id"),
            col("n_types").as("rep_n_types"), col("n_docs"))
          .orderBy(col("component")))
      },
      Some("""WITH RECURSIVE
         |  d AS (
         |    SELECT doc_id,
         |      list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS s
         |    FROM documents WHERE doc_id < 128
         |      AND len(list_filter(string_split(text, ' '), x -> x <> '')) > 0),
         |  e AS (
         |    SELECT a.doc_id AS src, b.doc_id AS dst
         |    FROM d a JOIN d b ON a.doc_id <> b.doc_id
         |    WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
         |        / len(list_distinct(a.s || b.s)), 4) >= 0.8),
         |  r AS (
         |    SELECT doc_id AS v, doc_id AS comp FROM documents WHERE doc_id < 128
         |    UNION
         |    SELECT e.src, r.comp FROM e JOIN r ON r.v = e.dst
         |  ),
         |  comp AS (SELECT v AS doc_id, min(comp) AS component FROM r GROUP BY v),
         |  t AS (SELECT doc_id,
         |          len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS n_types
         |        FROM documents WHERE doc_id < 128),
         |  j AS (SELECT comp.component, comp.doc_id, t.n_types
         |        FROM comp JOIN t ON comp.doc_id = t.doc_id)
         |SELECT component, doc_id AS rep_id, n_types AS rep_n_types, n_docs
         |FROM (SELECT j.*, count(*) OVER (PARTITION BY component) AS n_docs,
         |        row_number() OVER (PARTITION BY component
         |          ORDER BY n_types DESC, doc_id) AS rn
         |      FROM j) WHERE rn = 1
         |ORDER BY component""".stripMargin),
      "quality-aware canonical selection: each dup cluster keeps its richest-vocabulary member"),

    "dedup_pipeline_lsh" -> DeclaredQuery(
      // the 100 TB dedup story EXECUTED end-to-end, not just proven
      // componentwise: MinHash-LSH candidates (bucket join, never
      // all-pairs) → exact-Jaccard verify ≥ 0.8 → connected components →
      // min-id representative per component. Output = the deduped corpus
      // (representatives + singletons) with component id and size.
      // Seeded-hash candidate stage → rows-only per the contract; the
      // fixture-slice equivalence of LSH-edge components vs all-pairs
      // components is property-tested in DedupSpec.
      (s, dir) => {
        // candidate+verify stages come from the per-dir memo shared with
        // minhash_pairs (one corpus-wide signature pass per set pass —
        // the sharedIvfIndex discipline); stages 3-4 run live. The
        // un-memoized full chain is the lshDedupPipeline operator,
        // exercised end-to-end in DedupSpec.
        val edges = sharedMinhashVerified(s, dir)
          .filter(col("jaccard") >= 0.8)
          .select(col("id_a"), col("id_b"))
        val out = Dedup.dedupFromEdges(
          T(s, dir, "documents").select(col("doc_id"), col("lang"), col("text")),
          "doc_id", edges)
        try localFrame(out
          .select(col("doc_id"), col("lang"), col("component"),
            col("n_docs"))
          .orderBy(col("doc_id")))
        finally out.unpersist()
      },
      None,
      "LLM-pipeline dedup chained end-to-end: LSH candidates → Jaccard verify → CC → representatives"),

    "near_dup_embed" -> DeclaredQuery(
      (s, dir) => NearDup.embeddingNearDup(T(s, dir, "embeddings"),
        "vec_id", "embedding", minCosine = 0.35, maxId = 300)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH s AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                          CAST(embedding AS DOUBLE[]))) AS n
         |  FROM embeddings WHERE vec_id < 300)
         |SELECT * FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    round(list_dot_product(a.v, b.v) / (a.n * b.n), 4) AS cos
         |  FROM s a JOIN s b ON a.vec_id < b.vec_id)
         |WHERE cos >= 0.35 ORDER BY id_a, id_b""".stripMargin),
      "embedding-cosine near-dup pairs (bounded verification tier)"),

    "semantic_dedup" -> DeclaredQuery(
      // SemDeDup (Abbas et al. 2023) with a CATEGORICAL cluster column
      // (label) and the default min-id keep rule — the fully
      // deterministic, SQL-expressible form of the operator, so the
      // whole within-cluster pairwise-cosine + survivor-selection chain
      // is oracle-checked. The paper-faithful k-means-cells +
      // centroid-distance-rank form is the `semantic_dedup_ivf` row.
      // 0.35 is fixture-calibrated: the synthetic embeddings are
      // near-uniform (max within-label cosine ≈ 0.47), so a production
      // 0.9x threshold would make the row vacuously a no-op.
      (s, dir) => Dedup.semanticDedup(T(s, dir, "embeddings"),
          "vec_id", "embedding", "label", minCosine = 0.35)
        .select(col("vec_id"), col("label")).orderBy("vec_id"),
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |       FROM embeddings),
         |drops AS (SELECT DISTINCT x.vec_id
         |  FROM e x JOIN e y ON x.label = y.label AND y.vec_id < x.vec_id
         |  WHERE round(list_dot_product(x.v, y.v)
         |      / (sqrt(list_dot_product(x.v, x.v))
         |         * sqrt(list_dot_product(y.v, y.v))), 4) >= 0.35)
         |SELECT vec_id, label FROM embeddings
         |WHERE vec_id NOT IN (SELECT vec_id FROM drops)
         |ORDER BY vec_id""".stripMargin),
      "SemDeDup: within-cluster cosine dedup, min-id survivor (oracle form)"),

    "semantic_dedup_ivf" -> DeclaredQuery(
      // the paper's actual operating shape: cells from the SHARED IVF
      // k-means build bound the quadratic, and of each duplicate group
      // the member FARTHEST from its cell centroid survives (ascending
      // cosine-to-centroid rank — diversity-preserving). k-means cells
      // are float-iterative → rows-only per the contract; the keep-rule
      // and cluster-scoping semantics are pinned in DedupSpec.
      (s, dir) => {
        val ivf = sharedIvfIndex(s, dir)
        val withRank = s.read.parquet(ivf.indexPath)
          .join(broadcast(ivf.centroids), "cluster_id")
          .withColumn("_ccos",
            r4(VectorFunctions.cosine(col("embedding"), col("centroid"))))
        Dedup.semanticDedup(withRank, "vec_id", "embedding",
            "cluster_id", minCosine = 0.35, rankCols = Seq("_ccos"))
          .select(col("vec_id"), col("cluster_id").cast("int").as("cluster_id"))
          .orderBy("vec_id")
      },
      None,
      "SemDeDup over shared IVF cells, centroid-distance diversity rank"),

    // ----- more text analysis --------------------------------------------

    "q_token_bpe" -> DeclaredQuery(
      (s, dir) => T(s, dir, "documents")
        .select(col("doc_id"),
          size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)"))
            .cast("long").as("n_bpe"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_ws"))
        .orderBy(col("doc_id")).limit(1000),
      Some("""SELECT doc_id,
         |  len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS n_bpe,
         |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_ws
         |FROM documents ORDER BY doc_id LIMIT 1000""".stripMargin),
      "token counting: whitespace + BPE-ish regex segmentation"),

    "q_bpe_tokens" -> DeclaredQuery(
      // REAL merge-loop BPE under the checked-in merges table (vs
      // q_token_bpe's regex approximation, kept for its oracle): per-doc
      // subword counts + the corpus's most frequent subword pieces.
      // Table-seeded tokenization is not SQL-expressible → rows-only;
      // merge-loop semantics are property-tested in BpeSpec.
      (s, dir) => {
        val toks = TextAnalysis.bpeTokens(col("text"))
        T(s, dir, "documents")
          .select(col("doc_id"),
            size(toks).cast("long").as("n_bpe"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_ws"))
          .orderBy(col("doc_id")).limit(1000)
      },
      // PROMOTED (round 10): the q_bpe_budget merges-chain replay
      // yields the per-doc count directly — see bpeTokensOracleSql
      Some(bpeTokensOracleSql),
      "token counting: real BPE merge-loop subword segmentation (checked-in merges table; merges-chain DuckDB replay)"),

    "lang_predict" -> DeclaredQuery(
      (s, dir) => T(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          LangId.predict(col("text")).as("predicted"))
        .orderBy(col("doc_id")).limit(1000),
      Some {
        val structs = LangId.defaultProfiles.toSeq.sortBy(_._1).map {
          case (lang, ms) =>
            val lst = ms.map(m => s"'$m'").mkString("[", ", ", "]")
            s"struct_pack(s := len(list_intersect(t, $lst)), l := '$lang')"
        }.mkString(",\n    ")
        s"""SELECT doc_id, lang,
           |  (list_sort([
           |    $structs], 'DESC'))[1].l AS predicted
           |FROM (SELECT doc_id, lang,
           |        list_filter(string_split(text, ' '), x -> x <> '') AS t
           |      FROM documents)
           |ORDER BY doc_id LIMIT 1000""".stripMargin
      },
      "language-ID heuristic: marker-word argmax via struct greatest"),

    "q_except" -> DeclaredQuery(
      (s, dir) => T(s, dir, "customer").select(col("c_custkey"))
        .except(T(s, dir, "customer").filter(col("c_acctbal") > 0)
          .select(col("c_custkey")))
        .orderBy(col("c_custkey")).limit(200),
      Some("""SELECT c_custkey FROM customer
         |EXCEPT
         |SELECT c_custkey FROM customer WHERE c_acctbal > 0
         |ORDER BY c_custkey LIMIT 200""".stripMargin),
      "B28: EXCEPT"),

    "chunk_docs" -> DeclaredQuery(
      (s, dir) => TextAnalysis.chunk(
        T(s, dir, "documents").filter(col("doc_id") < 50),
        "doc_id", "text", width = 40, stride = 20)
        .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""WITH t AS (SELECT doc_id,
         |          list_filter(string_split(text, ' '), x -> x <> '') AS tk
         |        FROM documents WHERE doc_id < 50)
         |SELECT doc_id, CAST((u.s - 1) // 20 AS BIGINT) AS chunk_idx,
         |  array_to_string(tk[u.s : u.s + 39], ' ') AS chunk_text
         |FROM t, UNNEST(range(1, greatest(len(tk), 1) + 1, 20)) AS u(s)
         |ORDER BY doc_id, chunk_idx""".stripMargin),
      "document chunker: fixed-width token windows with stride overlap"),

    "q_normalize_redact" -> DeclaredQuery(
      // text normalization + PII redaction — the first stages of a
      // training pipeline, checked byte-exact through the oracle. The
      // synthetic corpus has no real emails/URLs, so a deterministic
      // suffix is appended to exercise both redaction patterns
      (s, dir) => T(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          TextAnalysis.normalizeText(col("text")).as("norm_text"),
          TextAnalysis.redactPii(
            concat(col("text"),
              lit(" contact bob@example.com via https://example.com/x")))
            .as("redacted"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
         |  trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text,
         |  regexp_replace(
         |    regexp_replace(text || ' contact bob@example.com via https://example.com/x',
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    'https?://[^\s]+', '<URL>', 'g') AS redacted
         |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin),
      "text normalization + PII redaction (email/URL placeholder tokens)"),

    "q_nfc" -> DeclaredQuery(
      // Unicode NFC canonical composition via the native NfcNormalize
      // expression. The fixture is ASCII-only (where NFC is the
      // identity — also asserted by the ASCII-fast-path spec), so a
      // decomposed-Unicode suffix is appended to force real
      // composition work; DuckDB's nfc_normalize is the oracle.
      (s, dir) => T(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          TextAnalysis.nfc(
            concat(col("text"),
              // DECOMPOSED suffix (e/n + combining marks) plus one
              // precomposed e-acute: NFC composes the first two, keeps
              // the third
              lit(" cafe\u0301 nin\u0303o \u00e9")))
            .as("nfc_text"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
         |  nfc_normalize(text || ' cafe' || chr(769) || ' nin' || chr(771)
         |    || 'o ' || chr(233)) AS nfc_text
         |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin),
      "Unicode NFC normalization (native expression, decomposed suffix forces composition)"),

    "q_pipeline_e2e" -> DeclaredQuery(
      // the composed training-data pipeline — every stage is
      // oracle-green alone (q_extract_chunks, q_normalize_redact,
      // chunk_docs, dedup_fingerprint, q_quality); this chains them the
      // way a real user would, against ONE oracle that chains the same
      // SQL stages, so cross-stage column-name/laziness bugs can't hide:
      // binary ingest → extract → redact → normalize → chunk → exact
      // dedup (token fingerprint) → stopword/length quality filter
      (s, dir) => {
        val media = Multimodal.asDocumentMedia(
          T(s, dir, "documents").filter(col("doc_id") < 300), "doc_id", "text")
        val extracted = Multimodal.extractText(media).toDF()
          .select(col("media_id").as("doc_id"), col("text"))
        // redact BEFORE normalize: the patterns are case-sensitive on
        // raw text; the placeholders then lowercase like any token
        val cleaned = extracted.select(col("doc_id"),
          TextAnalysis.normalizeText(TextAnalysis.redactPii(col("text")))
            .as("text"))
        val chunks = TextAnalysis.chunk(cleaned, "doc_id", "text",
          width = 30, stride = 15)
        val deduped = Dedup.dropDuplicatesByKey(chunks,
          Dedup.tokenFingerprint(col("chunk_text")),
          struct(col("doc_id"), col("chunk_idx")))
        val toks = TextAnalysis.tokens(col("chunk_text"))
        val stop = Seq("the", "a", "of", "to", "in")
        deduped.select(col("doc_id"), col("chunk_idx"),
            size(toks).cast("long").as("n_tokens"),
            round(size(filter(toks, t => t.isin(stop: _*))).cast("double") /
              size(toks), 4).as("stop_ratio"),
            col("chunk_text"))
          .where(col("n_tokens") >= 10 && col("stop_ratio") <= 0.5)
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""WITH clean AS (
         |  SELECT doc_id,
         |    trim(regexp_replace(lower(
         |      regexp_replace(regexp_replace(text,
         |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |      'https?://[^\s]+', '<URL>', 'g')), '\s+', ' ', 'g')) AS text
         |  FROM documents WHERE doc_id < 300),
         |t AS (SELECT doc_id,
         |        list_filter(string_split(text, ' '), x -> x <> '') AS tk
         |      FROM clean),
         |ch AS (
         |  SELECT doc_id, CAST((u.s - 1) // 15 AS BIGINT) AS chunk_idx,
         |    array_to_string(tk[u.s : u.s + 29], ' ') AS chunk_text
         |  FROM t, UNNEST(range(1, greatest(len(tk), 1) + 1, 15)) AS u(s)),
         |dd AS (
         |  SELECT doc_id, chunk_idx, chunk_text
         |  FROM ch
         |  QUALIFY row_number() OVER (
         |    PARTITION BY array_to_string(list_sort(string_split(chunk_text, ' ')), ' ')
         |    ORDER BY doc_id, chunk_idx) = 1),
         |q AS (
         |  SELECT doc_id, chunk_idx,
         |    CAST(len(list_filter(string_split(chunk_text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
         |    round(len(list_filter(string_split(chunk_text, ' '),
         |        x -> x IN ('the','a','of','to','in')))::DOUBLE
         |      / len(list_filter(string_split(chunk_text, ' '), x -> x <> '')), 4) AS stop_ratio,
         |    chunk_text
         |  FROM dd)
         |SELECT doc_id, chunk_idx, n_tokens, stop_ratio, chunk_text FROM q
         |WHERE n_tokens >= 10 AND stop_ratio <= 0.5
         |ORDER BY doc_id, chunk_idx""".stripMargin),
      "end-to-end pipeline: extract → redact → normalize → chunk → dedup → quality filter"),

    "q_logfreq_quality" -> DeclaredQuery(
      // corpus-frequency quality filter: mean ln(word count) per doc —
      // low scores mark rare-token/gibberish docs for dropping
      (s, dir) => TextAnalysis.logFreqScore(
        T(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH tok AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
         |  FROM documents),
         |wf AS (SELECT word, count(*) AS cnt FROM tok GROUP BY word)
         |SELECT t.doc_id, round(avg(ln(CAST(wf.cnt AS DOUBLE))), 4) AS lf_score
         |FROM tok t JOIN wf USING (word)
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin),
      "corpus-frequency quality score (mean log word count per doc)"),

    "q_lm_bigram" -> DeclaredQuery(
      // perplexity-tier quality scoring (the CCNet-style filter): a
      // bigram LM trained as DataFrame aggregations on the trusted half
      // of the corpus (doc_id < 250) scores the incoming half — lm_bits
      // = mean -log2 P(w2|w1) with add-one smoothing; low bits = fluent
      // under the reference model, high = junk/OOV. Train and score are
      // ONE lazy plan (model lookups are equi-joins on the word/bigram
      // key), so the whole filter is oracle-expressible.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        TextAnalysis.bigramLmScore(
          docs.filter(col("doc_id") >= 250),
          docs.filter(col("doc_id") < 250),
          "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""WITH ct AS (SELECT doc_id,
         |          list_filter(string_split(text, ' '), x -> x <> '') AS tk
         |        FROM documents WHERE doc_id < 250),
         |cu AS (SELECT unnest(tk) AS w1 FROM ct),
         |c1 AS (SELECT w1, count(*) AS c1 FROM cu GROUP BY w1),
         |v AS (SELECT count(DISTINCT w1) AS v FROM cu),
         |c2 AS (SELECT bg, count(*) AS c2 FROM (
         |         SELECT tk[u.s] || ' ' || tk[u.s + 1] AS bg
         |         FROM ct, UNNEST(range(1, len(tk), 1)) AS u(s)) GROUP BY bg),
         |st AS (SELECT doc_id,
         |          list_filter(string_split(text, ' '), x -> x <> '') AS tk
         |        FROM documents WHERE doc_id >= 250),
         |sg AS (SELECT doc_id, tk[u.s] AS w1, tk[u.s] || ' ' || tk[u.s + 1] AS bg
         |       FROM st, UNNEST(range(1, len(tk), 1)) AS u(s)),
         |j AS (SELECT sg.doc_id,
         |        -log2((coalesce(c2.c2, 0) + 1.0) /
         |              (coalesce(c1.c1, 0) + (SELECT v FROM v))) AS bits
         |      FROM sg LEFT JOIN c2 USING (bg) LEFT JOIN c1 USING (w1)),
         |o AS (SELECT doc_id, count(*) AS n_bigrams, round(avg(bits), 4) AS lm_bits
         |      FROM j GROUP BY doc_id)
         |SELECT s.doc_id, CAST(coalesce(o.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |       o.lm_bits
         |FROM (SELECT doc_id FROM documents WHERE doc_id >= 250) s
         |LEFT JOIN o USING (doc_id) ORDER BY doc_id""".stripMargin),
      "bigram-LM perplexity quality score: reference-corpus model, add-one smoothing"),

    "q_quality_gate" -> DeclaredQuery(
      // the quality GATE — the admission verdict a FineWeb/Gopher-style
      // pipeline actually acts on, chaining three INDEPENDENT signal
      // tiers over the incoming half of the corpus: max-2-gram
      // repetition (boilerplate), bigram-LM bits under the trusted-half
      // model (fluency/junk), and stopword ratio (gibberish). Each
      // signal is its own declared, individually-oracled operator
      // (q_repetition, q_lm_bigram, q_quality); this row proves the
      // COMPOSED verdict end-to-end against one chained oracle.
      // Thresholds are fixture-calibrated so every signal really bites
      // (lm_bits median 4.97, rep max 0.167, stop median 0.059);
      // comparisons run on the 4-dp-rounded values in BOTH engines, and
      // a doc missing a signal (< 2 tokens → no bigram) fails the gate.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val incoming = docs.filter(col("doc_id") >= 250)
        val corpus = docs.filter(col("doc_id") < 250)
        val toks = TextAnalysis.tokens(col("text"))
        val stop = Seq("the", "a", "of", "to", "in")
        val base = incoming.select(col("doc_id"),
          round(size(filter(toks, t => t.isin(stop: _*))).cast("double") /
            size(toks), 4).as("stop_ratio"))
        val rep = TextAnalysis.repetitionStats(incoming, "doc_id", "text", n = 2)
          .select(col("doc_id"), col("rep_ratio"))
        val lm = TextAnalysis.bigramLmScore(incoming, corpus, "doc_id", "text")
          .select(col("doc_id"), col("lm_bits"))
        base.join(rep, Seq("doc_id"), "left").join(lm, Seq("doc_id"), "left")
          .select(col("doc_id"), col("stop_ratio"), col("rep_ratio"),
            col("lm_bits"),
            when(coalesce(col("rep_ratio") <= 0.1, lit(false)) &&
                 coalesce(col("lm_bits") <= 5.0, lit(false)) &&
                 coalesce(col("stop_ratio") >= 0.02, lit(false)),
              lit(1L)).otherwise(lit(0L)).as("admitted"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH ct AS (SELECT doc_id,
         |          list_filter(string_split(text, ' '), x -> x <> '') AS tk
         |        FROM documents WHERE doc_id < 250),
         |cu AS (SELECT unnest(tk) AS w1 FROM ct),
         |c1 AS (SELECT w1, count(*) AS c1 FROM cu GROUP BY w1),
         |v AS (SELECT count(DISTINCT w1) AS v FROM cu),
         |c2 AS (SELECT bg, count(*) AS c2 FROM (
         |         SELECT tk[u.s] || ' ' || tk[u.s + 1] AS bg
         |         FROM ct, UNNEST(range(1, len(tk), 1)) AS u(s)) GROUP BY bg),
         |st AS (SELECT doc_id,
         |          list_filter(string_split(text, ' '), x -> x <> '') AS tk
         |        FROM documents WHERE doc_id >= 250),
         |sg AS (SELECT doc_id, tk[u.s] AS w1, tk[u.s] || ' ' || tk[u.s + 1] AS bg
         |       FROM st, UNNEST(range(1, len(tk), 1)) AS u(s)),
         |j AS (SELECT sg.doc_id,
         |        -log2((coalesce(c2.c2, 0) + 1.0) /
         |              (coalesce(c1.c1, 0) + (SELECT v FROM v))) AS bits
         |      FROM sg LEFT JOIN c2 USING (bg) LEFT JOIN c1 USING (w1)),
         |lm AS (SELECT doc_id, round(avg(bits), 4) AS lm_bits
         |       FROM j GROUP BY doc_id),
         |g AS (SELECT doc_id,
         |        unnest(list_transform(range(1, len(tk)),
         |                              i -> tk[i] || ' ' || tk[i + 1])) AS gram
         |      FROM st WHERE len(tk) >= 2),
         |c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram),
         |rep AS (SELECT doc_id, round(max(cnt)::DOUBLE / sum(cnt), 4) AS rep_ratio
         |        FROM c GROUP BY doc_id),
         |base AS (SELECT doc_id,
         |           round(len(list_filter(tk, x -> x IN ('the','a','of','to','in')))::DOUBLE
         |             / len(tk), 4) AS stop_ratio
         |         FROM st)
         |SELECT b.doc_id, b.stop_ratio, rep.rep_ratio, lm.lm_bits,
         |  CAST(CASE WHEN coalesce(rep.rep_ratio <= 0.1, false)
         |         AND coalesce(lm.lm_bits <= 5.0, false)
         |         AND coalesce(b.stop_ratio >= 0.02, false)
         |       THEN 1 ELSE 0 END AS BIGINT) AS admitted
         |FROM base b LEFT JOIN rep USING (doc_id) LEFT JOIN lm USING (doc_id)
         |ORDER BY doc_id""".stripMargin),
      "composed quality gate: repetition + bigram-LM bits + stopword ratio → admission verdict"),

    "q_decontaminate" -> DeclaredQuery(
      // benchmark decontamination: docs 0-49 play the eval set, the rest
      // the training corpus; flag every training doc echoing one of the
      // eval set's token 4-grams (test-set-leakage guard)
      (s, dir) => {
        val docs = T(s, dir, "documents")
        Decontaminate.contaminated(
          docs.filter(col("doc_id") >= 50), "doc_id", "text",
          docs.filter(col("doc_id") < 50), "text", n = 4)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (SELECT doc_id,
         |          list_filter(string_split(text, ' '), x -> x <> '') AS tk
         |        FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    CASE WHEN len(tk) < 4 THEN array_to_string(tk, ' ')
         |         ELSE array_to_string(tk[u.s : u.s + 3], ' ') END AS sng
         |  FROM tok, UNNEST(range(1, greatest(len(tk) - 3, 1) + 1, 1)) AS u(s)),
         |ev AS (SELECT DISTINCT sng FROM sh WHERE doc_id < 50)
         |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM (SELECT doc_id, sng FROM sh WHERE doc_id >= 50) t
         |JOIN ev USING (sng)
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin),
      "benchmark decontamination: eval n-gram echo scan over the training corpus"),

    "q_extract_chunks" -> DeclaredQuery(
      // the full binary-ingest path: documents re-encoded as opaque
      // binary media rows → per-partition text EXTRACTION (the
      // reference's declared PyPDF2 capability; stub = lossless UTF-8
      // decode) → token chunker. The oracle chunks the original text
      // column directly, so a green row proves the binary roundtrip is
      // exact end-to-end.
      (s, dir) => {
        val media = Multimodal.asDocumentMedia(
          T(s, dir, "documents").filter(col("doc_id") < 50), "doc_id", "text")
        val extracted = Multimodal.extractText(media).toDF()
          .select(col("media_id").as("doc_id"), col("text"))
        TextAnalysis.chunk(extracted, "doc_id", "text", width = 30, stride = 15)
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""WITH t AS (SELECT doc_id,
         |          list_filter(string_split(text, ' '), x -> x <> '') AS tk
         |        FROM documents WHERE doc_id < 50)
         |SELECT doc_id, CAST((u.s - 1) // 15 AS BIGINT) AS chunk_idx,
         |  array_to_string(tk[u.s : u.s + 29], ' ') AS chunk_text
         |FROM t, UNNEST(range(1, greatest(len(tk), 1) + 1, 15)) AS u(s)
         |ORDER BY doc_id, chunk_idx""".stripMargin),
      "binary→text extraction (stub UTF-8 extractor) + chunker, oracle-checked"),

    "q_html_extract" -> DeclaredQuery(
      // REAL HTML→text extraction, oracle-checked through a ROUND TRIP:
      // each document is wrapped into a full HTML page (head/title,
      // style + script elements with hostile bodies, a comment, an
      // &nbsp; entity, and the text itself entity-ESCAPED into a <p>),
      // the binary payload goes through the real per-partition
      // extractor (`Multimodal.extractText` → HtmlText: raw-text
      // element skip, tag strip, one-pass entity decode, whitespace
      // collapse), and the result must equal what the markup round
      // trip predicts — title + heading + the original text, collapsed
      // — which DuckDB reconstructs from the documents table alone
      // (the extraction inverts the escaping exactly, so the oracle
      // needs no HTML parser, just the `\s+` collapse). Escape order
      // matters on the Spark side: '&' first, then '<'/'>'.
      (s, dir) => {
        import s.implicits._
        val esc = regexp_replace(regexp_replace(regexp_replace(
          col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
        val html = concat(
          lit("<html><!-- synthetic fixture --><head><title>Doc "),
          col("doc_id"),
          lit("</title><style>p { color: red; }</style></head>" +
            "<body><h1>Doc&nbsp;"), col("doc_id"),
          lit("</h1><p>"), esc,
          lit("</p><script>if (1 < 2) { alert(\"x & y\"); }</script>" +
            "</body></html>"))
        val media = T(s, dir, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id").as("media_id"),
            encode(html, "UTF-8").as("payload"),
            lit("html").as("meta_format"))
          .as[Multimodal.DocMediaRow]
        Multimodal.extractText(media).toDF()
          .select(col("media_id"), col("text"))
          .orderBy(col("media_id"))
      },
      Some("""
        SELECT doc_id AS media_id,
               trim('Doc ' || doc_id || ' Doc ' || doc_id || ' ' ||
                 trim(regexp_replace(text, '\s+', ' ', 'g'))) AS text
        FROM documents WHERE doc_id < 200 ORDER BY doc_id
      """),
      "real HTML→text extraction (tag strip, raw-text skip, entity decode), oracle-checked via markup round trip"),

    "q_pdf_extract" -> DeclaredQuery(
      // REAL PDF→text extraction, oracle-checked through an EXACT round
      // trip: each document's text is written into a genuine
      // Flate-compressed PDF (PdfText.write — byte-accurate xref,
      // octal-escaped UTF-8 literal strings), the binary payload goes
      // through the real per-partition extractor (content-stream scan,
      // java.util.zip inflate, the ISO 32000-1 §9.4 text-operator
      // grammar), and the result must equal the original text verbatim
      // — no whitespace-collapse forgiveness needed because, unlike
      // HTML, PDF strings are byte-exact. The only normalization is the
      // extractor's outer trim, mirrored in SQL.
      (s, dir) => {
        import s.implicits._
        val media = T(s, dir, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"), col("text"))
          .map { r => Multimodal.DocMediaRow(r.getLong(0),
            PdfText.write(Seq(r.getString(1)), compress = true), "pdf") }
        Multimodal.extractText(media).toDF()
          .select(col("media_id"), col("text"))
          .orderBy(col("media_id"))
      },
      Some("""
        SELECT doc_id AS media_id,
               regexp_replace(text, '^\s+|\s+$', '', 'g') AS text
        FROM documents WHERE doc_id < 200 ORDER BY media_id
      """),
      "real PDF→text extraction (FlateDecode + content-stream walk), oracle-checked via exact round trip"),

    "q_docx_extract" -> DeclaredQuery(
      // REAL DOCX→text extraction, oracle-checked through an EXACT
      // round trip (the PDF row's discipline for the other office
      // container): a .docx is a ZIP of OOXML — java.util.zip opens it,
      // the WordprocessingML walk (w:t runs, w:p paragraphs, entities)
      // recovers the text verbatim, whitespace preserved per
      // xml:space="preserve".
      (s, dir) => {
        import s.implicits._
        val media = T(s, dir, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"), col("text"))
          .map { r => Multimodal.DocMediaRow(r.getLong(0),
            graft.operators.DocxText.write(Seq(r.getString(1))), "docx") }
        Multimodal.extractText(media).toDF()
          .select(col("media_id"), col("text"))
          .orderBy(col("media_id"))
      },
      Some("""
        SELECT doc_id AS media_id,
               regexp_replace(text, '^\s+|\s+$', '', 'g') AS text
        FROM documents WHERE doc_id < 200 ORDER BY media_id
      """),
      "real DOCX→text extraction (ZIP + WordprocessingML walk), oracle-checked via exact round trip"),

    "q_odt_extract" -> DeclaredQuery(
      // REAL ODT→text extraction, oracle-checked via exact round trip:
      // ZIP + the ODF text vocabulary, with space runs encoded per ODF
      // whitespace rules so collapsing readers and this extractor agree.
      (s, dir) => {
        import s.implicits._
        val media = T(s, dir, "documents").filter(col("doc_id") < 150)
          .select(col("doc_id"), col("text"))
          .map { r => Multimodal.DocMediaRow(r.getLong(0),
            graft.operators.OdtText.write(Seq(r.getString(1))), "odt") }
        Multimodal.extractText(media).toDF()
          .select(col("media_id"), col("text"))
          .orderBy(col("media_id"))
      },
      Some("""
        SELECT doc_id AS media_id,
               regexp_replace(text, '^\s+|\s+$', '', 'g') AS text
        FROM documents WHERE doc_id < 150 ORDER BY media_id
      """),
      "real ODT→text extraction (ZIP + ODF walk), oracle-checked via exact round trip"),

    "q_rtf_extract" -> DeclaredQuery(
      // REAL RTF→text extraction, oracle-checked via exact round trip:
      // control-word walk with group tracking, destination drops, hex
      // and \uN unicode escapes.
      (s, dir) => {
        import s.implicits._
        val media = T(s, dir, "documents").filter(col("doc_id") < 150)
          .select(col("doc_id"), col("text"))
          .map { r => Multimodal.DocMediaRow(r.getLong(0),
            graft.operators.RtfText.write(Seq(r.getString(1))), "rtf") }
        Multimodal.extractText(media).toDF()
          .select(col("media_id"), col("text"))
          .orderBy(col("media_id"))
      },
      Some("""
        SELECT doc_id AS media_id,
               regexp_replace(text, '^\s+|\s+$', '', 'g') AS text
        FROM documents WHERE doc_id < 150 ORDER BY media_id
      """),
      "real RTF→text extraction (control-word walk), oracle-checked via exact round trip"),

    "q_extract_safe" -> DeclaredQuery(
      // The PRODUCTION extraction shape, oracle-checked: a mixed batch
      // where even ids are genuine DOCX payloads and odd ids are
      // garbage bytes under the same format tag — extractTextSafe must
      // recover every good document AND capture every bad one as an
      // error row instead of failing the batch (the
      // one-damaged-file-kills-a-million-doc-task failure mode,
      // eliminated by contract).
      (s, dir) => {
        import s.implicits._
        val media = T(s, dir, "documents").filter(col("doc_id") < 100)
          .select(col("doc_id"), col("text"))
          .map { r =>
            val id = r.getLong(0)
            val payload =
              if (id % 2 == 0) graft.operators.DocxText.write(Seq(r.getString(1)))
              else Array.tabulate[Byte](16)(j => ((id * 31 + j * 7) % 251).toByte)
            Multimodal.DocMediaRow(id, payload, "docx")
          }
        Multimodal.extractTextSafe(media).toDF()
          .select(col("media_id"),
            col("error").isNull.as("ok"),
            col("text"))
          .orderBy(col("media_id"))
      },
      Some("""
        SELECT doc_id AS media_id,
               doc_id % 2 = 0 AS ok,
               CASE WHEN doc_id % 2 = 0
                    THEN regexp_replace(text, '^\s+|\s+$', '', 'g') END AS text
        FROM documents WHERE doc_id < 100 ORDER BY media_id
      """),
      "error-capturing extraction: good rows recover, damaged rows become error rows, batch never dies — oracle-checked"),

    "q_quality" -> DeclaredQuery(
      (s, dir) => {
        val toks = TextAnalysis.tokens(col("text"))
        val stop = Seq("the", "a", "of", "to", "in")
        T(s, dir, "documents").select(
          col("doc_id"),
          length(col("text")).cast("long").as("text_len"),
          length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("long")
            .as("punct_cnt"),
          round(size(filter(toks, t => t.isin(stop: _*))).cast("double") /
            size(toks), 4).as("stop_ratio"),
          round(aggregate(transform(toks, t => length(t).cast("long")),
            lit(0L), (a, x) => a + x).cast("double") / size(toks), 4)
            .as("avg_word_len"))
          .orderBy(col("doc_id")).limit(1000)
      },
      Some("""SELECT doc_id, length(text) AS text_len,
         |  length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS punct_cnt,
         |  round(len(list_filter(t, x -> x IN ('the','a','of','to','in')))::DOUBLE
         |    / len(t), 4) AS stop_ratio,
         |  round(list_sum(list_transform(t, x -> length(x)))::DOUBLE / len(t), 4)
         |    AS avg_word_len
         |FROM (SELECT doc_id, text,
         |        list_filter(string_split(text, ' '), x -> x <> '') AS t
         |      FROM documents)
         |ORDER BY doc_id LIMIT 1000""".stripMargin),
      "quality scoring: length / punctuation / stopword ratios"),

    "q_gopher_rules" -> DeclaredQuery(
      // the Gopher rule-set quality gate (Rae et al. 2021 §A1.1,
      // public): word-count bounds, mean-word-length bounds, minimum
      // stopword count, most-common-word frequency cap — per-doc rule
      // booleans (0/1 BIGINT, the q_quality_gate convention) plus the
      // conjunctive verdict. Thresholds fixture-calibrated so every
      // rule bites. The whole gate is ONE row-local projection
      // (TextAnalysis.gopherRules — even the top-word count folds in
      // place over the token array): no explode, no join, no shuffle;
      // at 100 TB it runs at scan speed inside the admission chain.
      (s, dir) => TextAnalysis.gopherRules(
          T(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")).limit(1000),
      Some("""WITH t AS (SELECT doc_id,
         |        list_filter(string_split(text, ' '), x -> x <> '') AS tk
         |      FROM documents),
         |s AS (SELECT doc_id,
         |        len(tk) AS n_words,
         |        list_sum(list_transform(tk, x -> length(x)))::DOUBLE
         |          / len(tk) AS mwl,
         |        len(list_filter(tk, x -> x IN ('the','a','of','to','in')))
         |          AS n_stop,
         |        list_max(list_transform(list_distinct(tk),
         |            w -> len(list_filter(tk, x -> x = w))))::DOUBLE
         |          / len(tk) AS topfrac
         |      FROM t)
         |SELECT doc_id,
         |  CAST(n_words AS BIGINT) AS n_words,
         |  round(mwl, 4) AS mean_wlen,
         |  CAST(n_stop AS BIGINT) AS n_stop,
         |  round(topfrac, 4) AS top_frac,
         |  CAST(CASE WHEN n_words >= 20 AND n_words <= 80
         |    THEN 1 ELSE 0 END AS BIGINT) AS r_wordcount,
         |  CAST(CASE WHEN mwl >= 3.9 AND mwl <= 5.0
         |    THEN 1 ELSE 0 END AS BIGINT) AS r_meanlen,
         |  CAST(CASE WHEN n_stop >= 2
         |    THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
         |  CAST(CASE WHEN topfrac <= 0.15
         |    THEN 1 ELSE 0 END AS BIGINT) AS r_topword,
         |  CAST(CASE WHEN n_words >= 20 AND n_words <= 80
         |    AND mwl >= 3.9 AND mwl <= 5.0 AND n_stop >= 2
         |    AND topfrac <= 0.15
         |    THEN 1 ELSE 0 END AS BIGINT) AS gopher_pass
         |FROM s ORDER BY doc_id LIMIT 1000""".stripMargin),
      "Gopher rule-set quality gate: 4 fixture-calibrated rules + verdict, one row-local projection"),

    "q_csv_roundtrip" -> DeclaredQuery(
      (s, dir) => {
        // A1/A2/B32 through the driver gate: encode 100 fixture vectors in
        // the reference CSV contract, read them back, aggregate — the
        // oracle computes the same aggregate straight from the parquet, so
        // any round-trip loss breaks the hash match
        // unique temp dir per invocation (a shared fixed path would race
        // under concurrent runs); the round-trip is materialized eagerly
        // so the directory can be deleted before returning
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-csvrt")
        try {
          val tmp = s"$tmpRoot/corpus"
          val src = T(s, dir, "embeddings").filter(col("vec_id") < 100)
            .select(col("vec_id").as("chunk_id"),
              lit("fixture").as("document_id"),
              concat(lit("chunk "), col("vec_id")).as("chunk_text"),
              col("embedding").as("vector_embedding"))
          graft.sources.EmbeddingCsv.write(src, tmp)
          localFrame(graft.sources.EmbeddingCsv.read(s, tmp)
            .agg(count(lit(1)).as("n"),
              r4(dbl(decSum(element_at(col("vector_embedding"), 1)))).as("sum_e1"),
              max(col("chunk_id")).as("max_id")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""SELECT count(*) AS n,
         |  round(CAST(sum(CAST(embedding[1] AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_e1,
         |  max(vec_id) AS max_id
         |FROM embeddings WHERE vec_id < 100""".stripMargin),
      "A1/A2/B32: reference CSV codec round-trip vs parquet ground truth"),

    "q_skew_salted" -> DeclaredQuery(
      // the salted join is result-identical to the plain join (each big
      // row meets each matching small row exactly once), so the oracle
      // is simply the UNSALTED join — a green row proves the multiset
      // equivalence through the driver gate, not just in SkewSpec
      (s, dir) => {
        val joined = graft.operators.Skew.saltedJoin(
          T(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          "l_orderkey", Seq("l_orderkey", "l_linenumber"),
          T(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderpriority")),
          "o_orderkey", factor = 4)
        joined.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            r4(dbl(decSum(col("l_quantity")))).as("sum_qty"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
         |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      "skew-salted join ≡ plain join (deterministic content-derived salt)"),

    "q_bucketed_join" -> DeclaredQuery(
      // co-located join through the driver gate: both sides written
      // bucketed+sorted by the join key (in-memory catalog), joined with
      // zero exchanges (asserted in BucketingSpec), result ≡ plain join
      (s, dir) => {
        val tag = java.util.UUID.randomUUID().toString.replace("-", "")
        val lt = s"li_bkt_$tag"
        val ot = s"ord_bkt_$tag"
        // writes INSIDE the try: a failure between them must still drop
        // the first table (catalog entry + warehouse files)
        try {
          graft.sources.Bucketing.writeBucketed(
            T(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
              .select(col("l_orderkey"), col("l_extendedprice")),
            lt, "l_orderkey", buckets = 8)
          graft.sources.Bucketing.writeBucketed(
            T(s, dir, "orders").filter(col("o_orderkey") < 2000)
              .select(col("o_orderkey"), col("o_orderpriority")),
            ot, "o_orderkey", buckets = 8)
          localFrame(
            s.table(lt).join(s.table(ot),
              col("l_orderkey") === col("o_orderkey"))
              .groupBy(col("o_orderpriority"))
              .agg(count(lit(1)).as("n"),
                r4(dbl(decSum(col("l_extendedprice")))).as("sum_price"))
              .orderBy(col("o_orderpriority")))
        } finally {
          s.sql(s"DROP TABLE IF EXISTS $lt")
          s.sql(s"DROP TABLE IF EXISTS $ot")
        }
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_orderkey < 2000 AND o_orderkey < 2000
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      "bucketed co-located join (zero-exchange SMJ) ≡ plain join"),

    "q_zorder_roundtrip" -> DeclaredQuery(
      // layout ops must be content-neutral: write a lineitem slice
      // Z-ordered by (l_partkey, l_suppkey), read it back, aggregate —
      // the oracle aggregates the unordered parquet directly, so any
      // row lost/duplicated by the clustering write breaks the match
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-zort")
        try {
          val path = s"$tmpRoot/zo"
          graft.sources.Layout.writeZOrdered(
            T(s, dir, "lineitem").filter(col("l_orderkey") < 3000)
              .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
                col("l_quantity")),
            path, "l_partkey", "l_suppkey", numFiles = 4)
          localFrame(s.read.parquet(path)
            .agg(count(lit(1)).as("n"),
              r4(dbl(decSum(col("l_quantity")))).as("sum_qty"),
              countDistinct(col("l_partkey")).as("n_parts")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""SELECT count(*) AS n,
         |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
         |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
         |FROM lineitem WHERE l_orderkey < 3000""".stripMargin),
      "Z-order clustered write is content-neutral (round-trip vs parquet truth)"),

    "q_partitioned_prune" -> DeclaredQuery(
      // hive-partitioned write + pruned read through the driver gate:
      // only the filtered partition's files are listed/scanned (asserted
      // plan-side in PartitionPruningSpec); the oracle filters the flat
      // parquet
      (s, dir) => {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-part")
        try {
          val path = s"$tmpRoot/events_by_type"
          T(s, dir, "events")
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("value"))
            .write.partitionBy("event_type").parquet(path)
          localFrame(s.read.parquet(path)
            .filter(col("event_type") === "purchase")
            .agg(count(lit(1)).as("n"),
              r4(dbl(decSum(col("value")))).as("sum_value"),
              countDistinct(col("user_id")).as("n_users")))
        } finally org.apache.commons.io.FileUtils.deleteDirectory(tmpRoot.toFile)
      },
      Some("""SELECT count(*) AS n,
         |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM events WHERE event_type = 'purchase'""".stripMargin),
      "partitioned layout + partition-pruned read ≡ filtered flat scan"),

    "q_orc_roundtrip" -> DeclaredQuery(
      (s, dir) => formatRoundTrip(s, dir, "orc"),
      Some(formatRoundTripOracle),
      "B32: ORC source/sink round-trip vs parquet ground truth"),

    "q_jsonl_roundtrip" -> DeclaredQuery(
      (s, dir) => formatRoundTrip(s, dir, "json"),
      Some(formatRoundTripOracle),
      "B32: JSON-lines source/sink round-trip vs parquet ground truth"),

    "q_append" -> DeclaredQuery(
      (s, dir) => T(s, dir, "documents").select(col("doc_id"))
        .unionByName(s.range(1).select(lit(999999L).as("doc_id")))
        .agg(count(lit(1)).as("n"), max(col("doc_id")).as("max_id")),
      Some("""SELECT count(*) AS n, max(doc_id) AS max_id
         |FROM (SELECT doc_id FROM documents
         |      UNION ALL SELECT 999999 AS doc_id)""".stripMargin),
      "A6: append = lazy union of new rows (vs the reference's full-table copy, app.py:118)"),

    "q_datefns" -> DeclaredQuery(
      (s, dir) => T(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
            .cast("long").as("d_days"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey")).limit(300),
      Some("""SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
         |  day(o_orderdate) AS dom,
         |  date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS d_days,
         |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
         |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin),
      "B29: date/time scalar functions"),

    "q_format" -> DeclaredQuery(
      (s, dir) => Search.topK(T(s, dir, "embeddings"),
        "embedding", "vec_id", QueryVectors.q2, k = 5)
        .select(col("vec_id"),
          format_string("%.4f", col("sim")).as("sim_fmt")),
      Some(s"""SELECT vec_id, printf('%.4f', sim) AS sim_fmt FROM (
         |  SELECT vec_id, round(${duckDot("embedding", q2Sql)}, 4) AS sim
         |  FROM embeddings ORDER BY sim DESC, vec_id LIMIT 5)""".stripMargin),
      "A11: 4-decimal result formatting (reference app.py:91)"),

    // ----- non-SQL-expressible operators (driver does rows-only checks;
    // ----- correctness is covered by the ScalaTest invariants) ------------

    "ref_search" -> DeclaredQuery(
      (s, dir) => {
        // the complete reference flagship path in-engine (app.py:40-48):
        // embed corpus + query with the SAME embedder, dot-score, top-5.
        // Corpus embedding runs the BATCHED mapPartitions path — the
        // accelerator throughput shape (one embedAll call per 64 rows);
        // result-identical to the row-wise UDF by the embedAll contract
        // (EmbedderSpec). Input projected to (doc_id, text) first:
        // mapPartitions is an opaque column-pruning boundary.
        val e = Embedder.default
        val qvec = e.embed("table scan fast query").map(_.toDouble).toSeq
        Embedder.embedPartitions(
          T(s, dir, "documents").select(col("doc_id"), col("text")),
          "text", "emb", e)
          .select(col("doc_id"),
            round(VectorFunctions.dot(col("emb"), vecLit(qvec)), 4).as("sim"))
          .orderBy(desc("sim"), asc("doc_id")).limit(5)
      },
      None,
      "A3→A4→A5: embed + brute-force search, hashing embedder (no SQL analog)"),

    "ref_embed_model" -> DeclaredQuery(
      // ref_search with a REAL MULTI-LAYER MODEL in the embed seat —
      // the reference's actual model path (`app.py:16-37`: tokenize →
      // DistilBERT encoder → mean-pool) re-expressed as the engine's
      // TransformerEmbedder: token+position embedding, 2 transformer
      // layers (multi-head self-attention, add&norm, GELU FFN), mean
      // pool, output projection — a real forward pass per document, not
      // a featurizer. Corpus embedding rides the BATCHED mapPartitions
      // path (one embedAll per 32 rows — the accelerator shape); the
      // weight artifact is deterministic-seeded (zero-egress stands in
      // for a trained checkpoint; byte-for-byte swap to deploy one) and
      // loads ONCE per executor JVM via the companion session cache
      // (load-count asserted in EmbedderSpec). Rows-only per the A3
      // contract: float model inference has no SQL analog.
      (s, dir) => {
        val e = new TransformerEmbedder(transformerArtifactPath, dim = 64)
        val qvec = e.embed("table scan fast query").map(_.toDouble).toSeq
        Embedder.embedPartitions(
          T(s, dir, "documents").select(col("doc_id"), col("text")),
          "text", "emb", e, batchSize = 32)
          .select(col("doc_id"),
            round(VectorFunctions.dot(col("emb"), vecLit(qvec)), 4)
              .as("sim"))
          .orderBy(desc("sim"), asc("doc_id")).limit(5)
      },
      None,
      "A3 with a real multi-layer transformer (MHA+LN+GELU FFN, mean-pool) — model inference, no SQL analog"),

    "ivf_probe" -> DeclaredQuery(
      (s, dir) => {
        // probes the shared corpus-scaled iters=3 index (quality
        // certified by the declared `ivf_recall` row + IvfIndexSpec's
        // recall tests — the build's own nprobe reads ~15 % of the
        // corpus at recall@10 ≥ 0.9). The build + partitioned-table
        // write is shared with ivf_probe_part (sharedIvfIndex) — a
        // declared-set pass runs both probes and must not pay k-means
        // twice. This probe exercises the SEMI-JOIN shape (assignments ⋈
        // broadcast(near clusters) → candidate-id prune of the corpus)
        // over the distributed index relation — no corpus-sized rows
        // ever touch the driver.
        val ivf = sharedIvfIndex(s, dir)
        val assign = s.read.parquet(ivf.indexPath)
          .select(col("vec_id"), col("cluster_id"))
        localFrame(
          IvfIndex.probe(T(s, dir, "embeddings"), "vec_id", "embedding",
            assign, ivf.centroids, QueryVectors.q1, k = 10,
            nprobe = ivf.nprobe)
            .select(col("vec_id"), col("sim")))
      },
      None,
      "B5/B6: IVF build (k-means as DataFrame ops) + semi-join probe (float-iterative, no oracle)"),

    "ivf_probe_part" -> DeclaredQuery(
      // the AT-SCALE IVF layout, driver-exercised end-to-end: corpus
      // written PARTITIONED BY cluster_id (once per fixture dir, shared
      // with ivf_probe), probe = `cluster_id IN (…)` partition pruning
      // (only nprobe/k of the files are opened — the pruning itself is
      // asserted in IvfIndexSpec). Float-iterative like ivf_probe →
      // rows-only per the contract.
      (s, dir) => {
        val ivf = sharedIvfIndex(s, dir)
        localFrame(
          IvfIndex.probePartitioned(s, ivf.indexPath, "vec_id",
            "embedding", ivf.centroids, QueryVectors.q1, k = 10,
            nprobe = ivf.nprobe)
            .select(col("vec_id"), col("sim")))
      },
      None,
      "B6 at-scale layout: IVF corpus partitioned by cluster_id, probe = partition pruning"),

    "ivf_assign" -> DeclaredQuery(
      // the ORACLE-ABLE slice of B5, exactly where SURVEY §2 says the
      // contract allows it: the nearest-centroid ASSIGNMENT step under
      // FIXED centroids is SQL-expressible (no float iteration — the
      // centroids are the k smallest-id vectors, the build's own
      // deterministic init rule, so DuckDB can reconstruct the identical
      // centroid set from the table alone). Runs the REAL maintenance
      // path (`IvfIndex.assignTo` → the native codegen'd NearestCentroid
      // zero-shuffle projection) over the whole corpus and hash-matches
      // a DuckDB argmin-over-list_distance replay — the first
      // oracle-green row in the ivf_* family, certifying the assignment
      // arithmetic every probe/build/append in that family rides on.
      // Tie rule on both sides: smallest distance, then smallest
      // cluster_id (argmin positions are cid-sorted in withCluster).
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        // 8 seed rows — driver-bounded by construction (k rows, same
        // class as IvfIndex.build's init collect)
        import s.implicits._
        val seeds = emb.orderBy("vec_id").limit(8)
          .select(transform(col("embedding"), _.cast("double")).as("c"))
          .collect().toIndexedSeq.zipWithIndex
          .map { case (r, i) => (i, r.getSeq[Double](0)) }
        val cents = seeds.toDF("cluster_id", "centroid")
        IvfIndex.assignTo(emb, "vec_id", "embedding", cents)
          // BIGINT on both sides (engine-wide convention: DuckDB
          // row_number yields BIGINT, Spark's assignment is int)
          .select(col("vec_id"), col("cluster_id").cast("long").as("cluster_id"))
          .orderBy("vec_id")
      },
      Some("""
        WITH cents AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster_id,
                 CAST(embedding AS DOUBLE[]) AS centroid
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
        ), d AS (
          SELECT e.vec_id, c.cluster_id,
                 list_distance(CAST(e.embedding AS DOUBLE[]), c.centroid) AS dist
          FROM embeddings e CROSS JOIN cents c
        )
        SELECT vec_id, cluster_id FROM (
          SELECT vec_id, cluster_id,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id) AS rn
          FROM d) WHERE rn = 1 ORDER BY vec_id
      """),
      "B5 assignment step under fixed centroids — the SQL-expressible slice, oracle-green"),

    "ivf_probe_many" -> DeclaredQuery(
      // BATCHED multi-query probe: both fixed probe vectors answered in
      // ONE job through the shared partitioned index — per-query probe
      // sets are a zero-shuffle projection over the plan-constant
      // centroids, the exploded (query, cluster) relation broadcasts
      // into the partitioned scan, per-query top-k is the map-side
      // bounded TopKAggregator. Per-query results ≡ probePartitioned
      // (IvfIndexSpec). Float-iterative → rows-only per the contract.
      (s, dir) => {
        val ivf = sharedIvfIndex(s, dir)
        import s.implicits._
        val qs = Seq((1L, QueryVectors.q1), (2L, QueryVectors.q2))
          .toDF("qid", "qvec")
        localFrame(
          IvfIndex.probeMany(s, ivf.indexPath, "vec_id", "embedding",
            ivf.centroids, qs, "qid", "qvec", k = 10, nprobe = ivf.nprobe)
            .select(col("qid"), col("vec_id"), col("sim"), col("rank"))
            .orderBy(col("qid"), col("rank")))
      },
      None,
      "B6 batched: multi-query IVF probe in one job (broadcast probe sets + map-side top-k)"),

    "ivf_probe_many_fixed" -> DeclaredQuery(
      // the BATCHED probe under the BYTE-EXACT ORACLE — ivf_probe_fixed's
      // seed-centroid rule applied to probeMany, which puts the batched
      // kernel itself behind the hash gate: the per-query probe-set
      // projection over the plan-constant centroids, the broadcast
      // (query, cluster) relation joined into the CLUSTER-PARTITIONED
      // on-disk index (written per invocation with the fixed
      // assignment — the real deployed layout, partition pruning
      // included), and the map-side bounded TopKAggregator whose tie
      // discipline (sim DESC, id ASC, per query) must reproduce
      // DuckDB's partitioned row_number exactly. The rows-only
      // ivf_probe_many adds only the float-iterated centroids.
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        import s.implicits._
        val seeds = emb.orderBy("vec_id").limit(8)
          .select(transform(col("embedding"), _.cast("double")).as("c"))
          .collect().toIndexedSeq.zipWithIndex
          .map { case (r, i) => (i, r.getSeq[Double](0)) }
        val cents = seeds.toDF("cluster_id", "centroid")
        val assign = IvfIndex.assignTo(emb, "vec_id", "embedding", cents)
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-ivfmf")
        try {
          val path = s"$tmpRoot/ivf"
          IvfIndex.writePartitioned(emb, "vec_id", assign, path)
          val qs = Seq((1L, QueryVectors.q1), (2L, QueryVectors.q2))
            .toDF("qid", "qvec")
          localFrame(
            IvfIndex.probeMany(s, path, "vec_id", "embedding", cents, qs,
                "qid", "qvec", k = 10, nprobe = 3)
              .select(col("qid"), col("vec_id"), col("sim"),
                col("rank").cast("long").as("rank"))
              .orderBy(col("qid"), col("rank")))
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(tmpRoot.toFile)
      },
      Some(s"""WITH cents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster_id,
         |         CAST(embedding AS DOUBLE[]) AS centroid
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
         |q AS (SELECT 1 AS qid, $q1Sql AS qv
         |      UNION ALL SELECT 2, $q2Sql),
         |assign AS (
         |  SELECT vec_id, cluster_id FROM (
         |    SELECT e.vec_id, c.cluster_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
         |                               c.centroid),
         |          c.cluster_id) AS rn
         |    FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
         |near AS (
         |  SELECT qid, cluster_id FROM (
         |    SELECT q.qid, c.cluster_id,
         |      row_number() OVER (PARTITION BY q.qid
         |        ORDER BY list_distance(c.centroid, q.qv), c.cluster_id)
         |        AS rn
         |    FROM q CROSS JOIN cents c) WHERE rn <= 3),
         |scored AS (
         |  SELECT n.qid, e.vec_id,
         |    round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv),
         |      4) AS sim
         |  FROM embeddings e JOIN assign a USING (vec_id)
         |  JOIN near n ON n.cluster_id = a.cluster_id
         |  JOIN q ON q.qid = n.qid)
         |SELECT CAST(qid AS BIGINT) AS qid, vec_id, sim, rank FROM (
         |  SELECT qid, vec_id, sim, row_number() OVER (PARTITION BY qid
         |    ORDER BY sim DESC, vec_id) AS rank
         |  FROM scored WHERE sim IS NOT NULL)
         |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin),
      "batched multi-query IVF probe (partitioned scan + map-side top-k) under the byte-exact oracle at fixed centroids"),

    "sq_topk_many" -> DeclaredQuery(
      // BATCHED multi-query quantized search — ONE scan of the SQ8
      // codes table answers the whole query batch (the ivf_probe_many
      // amortization over the compressed relation): the batch rides in
      // by broadcast with precomputed per-query ADC terms, per-query
      // top-r is the map-side bounded TopKAggregator (the shuffle
      // carries ≤ r rows per task×query, never the corpus), and the
      // bounded candidates re-rank exactly through a broadcast join.
      // Per-query results ≡ one searchRerank per query (SqIndexSpec).
      // Grid placement is float min/max → rows-only per the contract.
      (s, dir) => {
        val sq = sharedSqIndex(s, dir)
        import s.implicits._
        val qs = Seq((1L, QueryVectors.q1), (2L, QueryVectors.q2))
          .toDF("qid", "qvec")
        localFrame(
          SqIndex.searchManyRerank(s.read.parquet(sq.codesPath),
            T(s, dir, "embeddings"), "vec_id", "embedding",
            qs, "qid", "qvec", sq.params, k = 10, r = sq.rerank)
            .select(col("qid"), col("vec_id"), col("sim"), col("rank"))
            .orderBy(col("qid"), col("rank")))
      },
      None,
      "B6h batched: multi-query SQ8 search in one codes scan (broadcast ADC terms + map-side top-k)"),

    "sq_topk_many_fixed" -> DeclaredQuery(
      // the BATCHED SQ8 path under the byte-exact oracle — the
      // sq_topk_fixed trick applied to searchManyRerank, which puts the
      // map-side bounded TopKAggregator arithmetic itself behind the
      // hash gate (its tie discipline — score DESC, id ASC — must
      // reproduce DuckDB's row_number ordering exactly, per query, at
      // BOTH the candidate cut and the final top-k). Same shared codes
      // table and grid as the calibrated row; depth pinned at 50 so
      // the replay is a static SQL string.
      (s, dir) => {
        val sq = sharedSqIndex(s, dir)
        import s.implicits._
        val qs = Seq((1L, QueryVectors.q1), (2L, QueryVectors.q2))
          .toDF("qid", "qvec")
        localFrame(
          SqIndex.searchManyRerank(s.read.parquet(sq.codesPath),
            T(s, dir, "embeddings"), "vec_id", "embedding",
            qs, "qid", "qvec", sq.params, k = 10, r = 50)
            .select(col("qid"), col("vec_id"), col("sim"),
              col("rank").cast("long").as("rank"))
            .orderBy(col("qid"), col("rank")))
      },
      Some(s"""WITH grid AS (
         |  SELECT i, min(embedding[i]::DOUBLE) AS lo,
         |    (max(embedding[i]::DOUBLE) - min(embedding[i]::DOUBLE)) / 127
         |      AS dlt
         |  FROM embeddings, (SELECT unnest(range(1,65)) AS i) d
         |  GROUP BY i),
         |g AS (SELECT list(lo ORDER BY i) AS vmin,
         |             list(dlt ORDER BY i) AS dlt FROM grid),
         |q AS (SELECT 1 AS qid, $q1Sql AS qv
         |      UNION ALL SELECT 2, $q2Sql),
         |scored AS (
         |  SELECT q.qid, e.vec_id,
         |    round(list_dot_product(qv, vmin)
         |      + list_sum(list_transform(range(1,65), i ->
         |          qv[i] * dlt[i] * (CASE WHEN dlt[i] = 0 THEN 0
         |            ELSE least(127, greatest(0,
         |              CAST(round((e.embedding[i]::DOUBLE - vmin[i])
         |                / dlt[i]) AS INT))) END))), 4) AS sq
         |  FROM embeddings e CROSS JOIN g CROSS JOIN q),
         |cand AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY sq DESC, vec_id) AS rn FROM scored)
         |  WHERE rn <= 50),
         |rer AS (
         |  SELECT c.qid, c.vec_id,
         |    round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv), 4)
         |      AS sim
         |  FROM cand c
         |  JOIN embeddings e ON e.vec_id = c.vec_id
         |  JOIN q ON q.qid = c.qid)
         |SELECT CAST(qid AS BIGINT) AS qid, vec_id, sim, rank FROM (
         |  SELECT qid, vec_id, sim, row_number() OVER (PARTITION BY qid
         |    ORDER BY sim DESC, vec_id) AS rank FROM rer)
         |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin),
      "batched SQ8 search under the byte-exact oracle: per-query aggregator tie discipline ≡ row_number replay at a pinned depth"),

    "q_cluster_mix" -> DeclaredQuery(
      // DIVERSITY-AWARE sampling: up to m rows from EVERY embedding
      // cluster (the shared IVF assignment relation) — the
      // embedding-space twin of per-source stratification: the sampled
      // subset spans semantic regions instead of mirroring cluster-size
      // skew (the public cluster-based data-selection recipe).
      // Selection is the deterministic Knuth-hash rank within each
      // cluster; per-cluster top-m is the map-side bounded
      // TopKAggregator (≤ m rows per task×cluster shuffle — the window
      // formulation would shuffle the corpus). Emits the per-cluster
      // accounting next to the sample so coverage is auditable in-row.
      // Float-iterative clusters → rows-only per the contract;
      // hash-rank selection itself is exactly SamplingSpec's naive
      // ground truth.
      (s, dir) => {
        val ivf = sharedIvfIndex(s, dir)
        val idx = s.read.parquet(ivf.indexPath)
          .select(col("vec_id"), col("cluster_id"))
        val sampled = Sampling.clusterBalanced(idx, "vec_id",
          "cluster_id", m = 5)
        val sizes = idx.groupBy(col("cluster_id").as("cluster"))
          .agg(count(lit(1)).as("n_members"))
        localFrame(sampled.join(sizes, "cluster")
          .select(col("cluster"), col("n_members"), col("vec_id"),
            col("pos"))
          .orderBy(col("cluster"), col("pos")))
      },
      None,
      "diversity-aware sampling: deterministic per-cluster top-m over the IVF assignment relation"),

    "q_cluster_mix_cat" -> DeclaredQuery(
      // q_cluster_mix's ORACLE twin, the `semantic_dedup` trick applied
      // to sampling: swap the float-iterative IVF clusters for a
      // CATEGORICAL label (lang) and the whole selection pipeline —
      // Knuth-hash rank, map-side bounded per-cluster top-m, size
      // accounting — becomes SQL-expressible and hash-matches a DuckDB
      // row_number replay. Same operator (`Sampling.clusterBalanced`),
      // same plan shape (TopKAggregator partial agg, ≤ m rows per
      // task×cluster cross the exchange); only the cluster column
      // differs, so this row certifies the selection arithmetic that
      // q_cluster_mix runs over the IVF relation.
      (s, dir) => {
        val docs = T(s, dir, "documents")
          .select(col("doc_id"), col("lang"))
        val sampled = Sampling.clusterBalanced(docs, "doc_id", "lang", m = 5)
        val sizes = docs.groupBy(col("lang").as("cluster"))
          .agg(count(lit(1)).as("n_members"))
        sampled.join(sizes, "cluster")
          .select(col("cluster"), col("n_members"), col("doc_id"),
            // BIGINT on both sides (DuckDB row_number yields BIGINT)
            col("pos").cast("long").as("pos"))
          .orderBy(col("cluster"), col("pos"))
      },
      Some("""
        WITH ranked AS (
          SELECT lang AS cluster, doc_id,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY ((doc_id % 1000003) * 2654435761) % 1000000,
                            doc_id) AS pos
          FROM documents
        ), sizes AS (
          SELECT lang AS cluster, count(*) AS n_members
          FROM documents GROUP BY lang
        )
        SELECT r.cluster, s.n_members, r.doc_id, r.pos
        FROM ranked r JOIN sizes s USING (cluster)
        WHERE r.pos <= 5 ORDER BY r.cluster, r.pos
      """),
      "cluster-balanced sampling over a categorical label — the selection arithmetic oracle-green"),

    "pq_topk" -> DeclaredQuery(
      // PQ-accelerated top-k at the CALIBRATED operating point: ADC scan
      // of the shared 8-byte-code table → top-`rerank` candidates →
      // exact re-rank of that bounded set via broadcast join back to the
      // raw vectors. The compressed representation is the 100 TB story
      // (codes stay RAM-resident where raw vectors spill); float-
      // iterative k-means codebooks → rows-only per the contract, with
      // full-depth-rerank ≡ exact brute force asserted in PqIndexSpec
      // and the operating point certified by `pq_recall`.
      (s, dir) => {
        val pq = sharedPqIndex(s, dir)
        PqIndex.searchRerank(s.read.parquet(pq.codesPath),
            T(s, dir, "embeddings"), "vec_id", "embedding",
            QueryVectors.q1, pq.codebooks, k = 10, r = pq.rerank)
          .orderBy(col("rank"))
      },
      None,
      "PQ ADC top-k + exact re-rank at the calibrated depth (8-byte codes, 32x compression)"),

    "pq_recall" -> DeclaredQuery(
      // driver-visible PQ QUALITY evidence, the `ivf_recall` pattern:
      // recall@10 of the re-ranked ADC search vs the exact brute-force
      // top-10, across a candidate-depth dial anchored at the calibrated
      // point (half, the declared depth — THE certified row, which must
      // meet PqRecallTarget — and double, capped at PqMaxRerank). Each
      // recall is |exact10 ∩ adcTop(r)| / 10 — equal to searchRerank's
      // recall by the bounded-candidates argument in sharedPqIndex's
      // scaladoc — so the whole dial costs ONE bounded ADC ordering per
      // query, not a probe job per dial point. The full-depth
      // completeness check (r = corpus ⇒ recall 1.0 exactly) lives in
      // PqIndexSpec — it would need a corpus-order collect here.
      (s, dir) => {
        val pq = sharedPqIndex(s, dir)
        val emb = T(s, dir, "embeddings")
        val enc = s.read.parquet(pq.codesPath)
        val rMax = math.min(emb.count(), PqMaxRerank.toLong).toInt
        val dial = Seq(math.max(10, pq.rerank / 2), pq.rerank,
          math.min(rMax, pq.rerank * 2)).distinct.sorted
        val calib = Seq((1L, QueryVectors.q1), (2L, QueryVectors.q2))
        val rows = for {
          (qid, q) <- calib
          adc = enc.select(col("vec_id"),
              round(PqIndex.adcScore(col("codes"), q, pq.codebooks), 4)
                .as("sim"))
            .orderBy(desc("sim"), asc("vec_id")).limit(dial.max)
            .collect().map(_.getLong(0)).toIndexedSeq
          exact = Search.topK(emb, "embedding", "vec_id", q, k = 10)
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet
          r <- dial
        } yield {
          val hit = (adc.take(r).toSet & exact).size
          (qid, r, hit.toLong,
            math.rint(hit.toDouble / exact.size * 10000) / 10000)
        }
        import s.implicits._
        rows.toDF("qid", "rerank_depth", "n_hit", "recall_at_10")
          .orderBy(col("qid"), col("rerank_depth"))
      },
      None,
      "PQ quality: recall@10 of re-ranked ADC search vs exact top-k across the rerank-depth dial"),

    "sq_topk" -> DeclaredQuery(
      // SQ8-accelerated top-k at the CALIBRATED operating point:
      // quantized scan of the shared per-dimension-affine codes table
      // (4× fewer bytes than the raw vectors) → top-`rerank` candidates
      // → exact re-rank of that bounded set. The low-loss end of the
      // compression dial: 127 levels/dim keep the quantized ordering
      // nearly exact, so the calibrated depth lands near the ladder
      // floor where PQ's 32× compression needs a much deeper sweep —
      // measured side by side via `sq_recall` vs `pq_recall`. Grid
      // placement is float min/max → rows-only per the contract;
      // full-depth-rerank ≡ exact brute force asserted in SqIndexSpec.
      (s, dir) => {
        val sq = sharedSqIndex(s, dir)
        SqIndex.searchRerank(s.read.parquet(sq.codesPath),
            T(s, dir, "embeddings"), "vec_id", "embedding",
            QueryVectors.q1, sq.params, k = 10, r = sq.rerank)
          .orderBy(col("rank"))
      },
      None,
      "SQ8 quantized top-k + exact re-rank at the calibrated depth (int8 codes, 4x compression)"),

    "sq_recall" -> DeclaredQuery(
      // driver-visible SQ QUALITY evidence, the `pq_recall` pattern:
      // recall@10 of the re-ranked quantized search vs the exact
      // brute-force top-10 across the candidate-depth dial anchored at
      // the calibrated point (half / declared / double). Each recall is
      // |exact10 ∩ sqTop(r)| / 10 — equal to searchRerank's recall by
      // the bounded-candidates argument in sharedSqIndex's scaladoc —
      // so the dial costs ONE bounded quantized ordering per query.
      (s, dir) => {
        val sq = sharedSqIndex(s, dir)
        val emb = T(s, dir, "embeddings")
        val enc = s.read.parquet(sq.codesPath)
        val rMax = math.min(emb.count(), PqMaxRerank.toLong).toInt
        val dial = Seq(math.max(10, sq.rerank / 2), sq.rerank,
          math.min(rMax, sq.rerank * 2)).distinct.sorted
        val calib = Seq((1L, QueryVectors.q1), (2L, QueryVectors.q2))
        val rows = for {
          (qid, q) <- calib
          top = enc.select(col("vec_id"),
              round(SqIndex.sqScore(col("codes"), q, sq.params), 4)
                .as("sim"))
            .orderBy(desc("sim"), asc("vec_id")).limit(dial.max)
            .collect().map(_.getLong(0)).toIndexedSeq
          exact = Search.topK(emb, "embedding", "vec_id", q, k = 10)
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet
          r <- dial
        } yield {
          val hit = (top.take(r).toSet & exact).size
          (qid, r, hit.toLong,
            math.rint(hit.toDouble / exact.size * 10000) / 10000)
        }
        import s.implicits._
        rows.toDF("qid", "rerank_depth", "n_hit", "recall_at_10")
          .orderBy(col("qid"), col("rerank_depth"))
      },
      None,
      "SQ8 quality: recall@10 of re-ranked quantized search vs exact top-k across the rerank-depth dial"),

    "sq_topk_fixed" -> DeclaredQuery(
      // the SQ8 pipeline under the BYTE-EXACT ORACLE — the ivf_assign
      // pattern applied to the quantization family: unlike the
      // float-iterative k-means codebooks, the SQ grid is pure
      // per-dimension min/max (no accumulation, no iteration), so the
      // ENTIRE pipeline — train → encode → quantized scan → top-50
      // candidate cut → exact re-rank — is SQL-expressible and DuckDB
      // replays it from the raw table (grid CTE → code arithmetic →
      // same candidate cut → same re-rank). The rerank depth is pinned
      // at 50 instead of the shared handle's runtime-calibrated value
      // (a static SQL string cannot read the calibration); `sq_topk`
      // stays the calibrated operating point. Codes and grid come from
      // the SAME shared build the calibrated row uses, so this row
      // certifies the deployed artifact, not a parallel re-derivation.
      (s, dir) => {
        val sq = sharedSqIndex(s, dir)
        SqIndex.searchRerank(s.read.parquet(sq.codesPath),
            T(s, dir, "embeddings"), "vec_id", "embedding",
            QueryVectors.q1, sq.params, k = 10, r = 50)
          .withColumn("rank", col("rank").cast("long"))
          .orderBy(col("rank"))
      },
      Some(s"""WITH grid AS (
         |  SELECT i, min(embedding[i]::DOUBLE) AS lo,
         |    (max(embedding[i]::DOUBLE) - min(embedding[i]::DOUBLE)) / 127
         |      AS dlt
         |  FROM embeddings, (SELECT unnest(range(1,65)) AS i) d
         |  GROUP BY i),
         |g AS (SELECT list(lo ORDER BY i) AS vmin,
         |             list(dlt ORDER BY i) AS dlt FROM grid),
         |scored AS (
         |  SELECT e.vec_id,
         |    round(list_dot_product($q1Sql, vmin)
         |      + list_sum(list_transform(range(1,65), i ->
         |          ($q1Sql)[i] * dlt[i] * (CASE WHEN dlt[i] = 0 THEN 0
         |            ELSE least(127, greatest(0,
         |              CAST(round((e.embedding[i]::DOUBLE - vmin[i])
         |                / dlt[i]) AS INT))) END))), 4) AS sq
         |  FROM embeddings e CROSS JOIN g),
         |cand AS (SELECT vec_id FROM scored ORDER BY sq DESC, vec_id
         |         LIMIT 50)
         |SELECT vec_id, sim,
         |  row_number() OVER (ORDER BY sim DESC, vec_id) AS rank
         |FROM (
         |  SELECT e.vec_id,
         |    round(${duckDot("e.embedding", q1Sql)}, 4) AS sim
         |  FROM embeddings e JOIN cand USING (vec_id))
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin),
      "SQ8 train+encode+scan+rerank under the byte-exact oracle at a pinned depth (the grid is min/max — no float iteration to hide)"),

    "pq_topk_fixed" -> DeclaredQuery(
      // the PQ pipeline under the BYTE-EXACT ORACLE — the ivf_probe_fixed
      // trick applied to product quantization: swap the float-iterative
      // k-means codebooks for the train's DETERMINISTIC INIT alone (the
      // 16 smallest-id vectors' subvectors — what trainCodebooks starts
      // from), and the whole pipeline — per-subspace argmin encode, the
      // driver-side ADC lookup-table fold, the top-50 candidate cut, the
      // exact re-rank — is SQL-expressible and DuckDB replays it stage
      // by stage (codeword argmin ≡ row_number over (subspace distance,
      // code); ADC fold ≡ ordered list_sum of per-subspace dot
      // products). The only thing the rows-only pq_topk adds over this
      // row is the Lloyd-iterated codewords themselves; the ENCODE/ADC/
      // re-rank arithmetic it runs is exactly what this row hash-gates.
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        val seeds = emb.orderBy("vec_id").limit(16)
          .select(transform(col("embedding"), _.cast("double")).as("v"))
          .collect().map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
        val cb: PqIndex.Codebooks = IndexedSeq.tabulate(8) { mi =>
          seeds.zipWithIndex.map { case (v, c) =>
            (c, v.slice(mi * 8, mi * 8 + 8)) }
        }
        val encoded = PqIndex.encode(emb, "vec_id", "embedding", cb)
        PqIndex.searchRerank(encoded, emb, "vec_id", "embedding",
            QueryVectors.q1, cb, k = 10, r = 50)
          .withColumn("rank", col("rank").cast("long"))
          .orderBy(col("rank"))
      },
      Some(s"""WITH seeds AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
         |         CAST(embedding AS DOUBLE[]) AS v
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
         |m AS (SELECT unnest(range(0,8)) AS mi),
         |codes AS (
         |  SELECT vec_id, mi, code FROM (
         |    SELECT e.vec_id, m.mi, s.code,
         |      row_number() OVER (PARTITION BY e.vec_id, m.mi
         |        ORDER BY list_distance(
         |            list_slice(CAST(e.embedding AS DOUBLE[]),
         |                       m.mi*8+1, m.mi*8+8),
         |            list_slice(s.v, m.mi*8+1, m.mi*8+8)),
         |          s.code) AS rn
         |    FROM embeddings e CROSS JOIN m CROSS JOIN seeds s)
         |  WHERE rn = 1),
         |cl AS (SELECT vec_id, list(code ORDER BY mi) AS codes_l
         |       FROM codes GROUP BY vec_id),
         |cells AS (SELECT list(v ORDER BY code) AS cs FROM seeds),
         |adc AS (
         |  SELECT vec_id, round(list_sum(list_transform(range(0,8), i ->
         |      list_dot_product(list_slice($q1Sql, i*8+1, i*8+8),
         |        list_slice(cs[codes_l[i+1]+1], i*8+1, i*8+8)))), 4) AS a
         |  FROM cl CROSS JOIN cells),
         |cand AS (SELECT vec_id FROM adc ORDER BY a DESC, vec_id LIMIT 50)
         |SELECT vec_id, sim,
         |  row_number() OVER (ORDER BY sim DESC, vec_id) AS rank
         |FROM (SELECT e.vec_id,
         |        round(${duckDot("e.embedding", q1Sql)}, 4) AS sim
         |      FROM embeddings e JOIN cand USING (vec_id))
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin),
      "PQ encode+ADC+rerank under the byte-exact oracle at fixed (init) codebooks — the arithmetic pq_topk runs, hash-gated"),

    "ivfpq_topk_fixed" -> DeclaredQuery(
      // the COMPOSED residual index under the BYTE-EXACT ORACLE: fixed
      // seed centroids (the ivf_probe_fixed rule) × fixed residual
      // codebooks (the 16 smallest-id RESIDUALS' subvectors — residual
      // computation is pure float subtraction, so the artifact chain
      // stays deterministic end to end). The row exercises the REAL
      // deployed path — encodeResidual → cluster-partitioned codes
      // table on disk → probeIvfPq's partition-pruned ADC scan with the
      // per-cluster coarse term → exact re-rank — and DuckDB replays
      // every stage: assignment argmin, residual arithmetic, codeword
      // argmin per subspace, coarse+ADC scoring restricted to the
      // 3 probed clusters, the top-50 cut, the re-rank. The rows-only
      // ivfpq_topk differs ONLY in where the centroids/codewords come
      // from (two stacked k-means).
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        import s.implicits._
        val seeds = emb.orderBy("vec_id").limit(8)
          .select(transform(col("embedding"), _.cast("double")).as("c"))
          .collect().toIndexedSeq.zipWithIndex
          .map { case (r, i) => (i, r.getSeq[Double](0)) }
        val cents = seeds.toDF("cluster_id", "centroid")
        val assign = IvfIndex.assignTo(emb, "vec_id", "embedding", cents)
        val res = PqIndex.residuals(emb, "vec_id", "embedding", assign, cents)
        val rseeds = res.orderBy("vec_id").limit(16).select("res")
          .collect().map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
        val cb: PqIndex.Codebooks = IndexedSeq.tabulate(8) { mi =>
          rseeds.zipWithIndex.map { case (v, c) =>
            (c, v.slice(mi * 8, mi * 8 + 8)) }
        }
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-ivfpqf")
        try {
          val path = s"$tmpRoot/codes"
          PqIndex.encodeResidual(emb, "vec_id", "embedding", assign,
              cents, cb)
            .repartition(col("cluster_id"))
            .write.partitionBy("cluster_id").mode("overwrite").parquet(path)
          localFrame(
            PqIndex.probeIvfPq(s, path, "vec_id", cents, QueryVectors.q1,
                cb, k = 10, nprobe = 3,
                rerank = Some((emb, "embedding", 50)))
              .withColumn("rank", col("rank").cast("long"))
              .orderBy(col("rank")))
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(tmpRoot.toFile)
      },
      Some(s"""WITH cents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster_id,
         |         CAST(embedding AS DOUBLE[]) AS centroid
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
         |assign AS (
         |  SELECT vec_id, cluster_id FROM (
         |    SELECT e.vec_id, c.cluster_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
         |                               c.centroid),
         |          c.cluster_id) AS rn
         |    FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
         |res AS (
         |  SELECT e.vec_id, a.cluster_id,
         |    list_transform(range(1,65),
         |      i -> e.embedding[i]::DOUBLE - c.centroid[i]) AS r
         |  FROM embeddings e JOIN assign a USING (vec_id)
         |  JOIN cents c ON c.cluster_id = a.cluster_id),
         |rseeds AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, r AS v
         |  FROM (SELECT * FROM res ORDER BY vec_id LIMIT 16)),
         |m AS (SELECT unnest(range(0,8)) AS mi),
         |codes AS (
         |  SELECT vec_id, mi, code FROM (
         |    SELECT r.vec_id, m.mi, s.code,
         |      row_number() OVER (PARTITION BY r.vec_id, m.mi
         |        ORDER BY list_distance(
         |            list_slice(r.r, m.mi*8+1, m.mi*8+8),
         |            list_slice(s.v, m.mi*8+1, m.mi*8+8)),
         |          s.code) AS rn
         |    FROM res r CROSS JOIN m CROSS JOIN rseeds s) WHERE rn = 1),
         |cl AS (SELECT vec_id, list(code ORDER BY mi) AS codes_l
         |       FROM codes GROUP BY vec_id),
         |cells AS (SELECT list(v ORDER BY code) AS cs FROM rseeds),
         |near AS (SELECT cluster_id FROM cents
         |         ORDER BY list_distance(centroid, $q1Sql), cluster_id
         |         LIMIT 3),
         |scored AS (
         |  SELECT a.vec_id,
         |    round(list_dot_product($q1Sql, c.centroid)
         |      + list_sum(list_transform(range(0,8), i ->
         |          list_dot_product(list_slice($q1Sql, i*8+1, i*8+8),
         |            list_slice(cs[codes_l[i+1]+1], i*8+1, i*8+8)))), 4)
         |      AS sim
         |  FROM assign a JOIN near n USING (cluster_id)
         |  JOIN cents c ON c.cluster_id = a.cluster_id
         |  JOIN cl ON cl.vec_id = a.vec_id CROSS JOIN cells),
         |cand AS (SELECT vec_id FROM scored ORDER BY sim DESC, vec_id
         |         LIMIT 50)
         |SELECT vec_id, sim,
         |  row_number() OVER (ORDER BY sim DESC, vec_id) AS rank
         |FROM (SELECT e.vec_id,
         |        round(${duckDot("e.embedding", q1Sql)}, 4) AS sim
         |      FROM embeddings e JOIN cand USING (vec_id))
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin),
      "residual IVF-PQ (partition-pruned ADC + coarse term + rerank) under the byte-exact oracle at fixed artifacts"),

    "ivfpq_topk" -> DeclaredQuery(
      // the COMPOSED index at its calibrated operating point: IVF
      // partition pruning (only the shared nprobe's cluster partitions
      // are read) × residual-PQ compressed scan (1-byte codes, ADC
      // lookup fold + per-cluster coarse term) → exact re-rank of the
      // bounded candidate set. This is the canonical 100 TB ANN layout:
      // read nprobe/k of the corpus AND read it 32× smaller. Rows-only
      // (float-iterative, two stacked k-means); exhaustive-probe +
      // lossless-codebook ≡ exact is asserted in PqIndexSpec, the
      // operating point is certified by `ivfpq_recall`.
      (s, dir) => {
        val ix = sharedIvfPqIndex(s, dir)
        val ivf = sharedIvfIndex(s, dir)
        PqIndex.probeIvfPq(s, ix.codesPath, "vec_id", ivf.centroids,
          QueryVectors.q1, ix.codebooks, k = 10, nprobe = ix.nprobe,
          rerank = Some((T(s, dir, "embeddings"), "embedding", ix.rerank)))
          .orderBy(col("rank"))
      },
      None,
      "residual IVF-PQ probe: partition-pruned compressed scan + exact re-rank at the calibrated point"),

    "ivfpq_recall" -> DeclaredQuery(
      // quality evidence for the composed index: recall@10 vs the exact
      // brute-force top-10 across the rerank dial at the SHARED nprobe —
      // prices in BOTH approximations at once (skipped cells + residual
      // quantization). One bounded partition-pruned probe per query
      // evaluates the whole dial (bounded-candidates argument,
      // sharedPqIndex scaladoc); the declared depth must meet
      // PqRecallTarget by construction of the calibration.
      (s, dir) => {
        val ix = sharedIvfPqIndex(s, dir)
        val ivf = sharedIvfIndex(s, dir)
        val emb = T(s, dir, "embeddings")
        val rMax = math.min(emb.count(), PqMaxRerank.toLong).toInt
        val dial = Seq(math.max(10, ix.rerank / 2), ix.rerank,
          math.min(rMax, ix.rerank * 2)).distinct.sorted
        val calib = Seq((1L, QueryVectors.q1), (2L, QueryVectors.q2))
        val rows = for {
          (qid, q) <- calib
          adc = PqIndex.probeIvfPq(s, ix.codesPath, "vec_id",
              ivf.centroids, q, ix.codebooks, k = dial.max,
              nprobe = ix.nprobe)
            .select(col("vec_id")).collect().map(_.getLong(0)).toIndexedSeq
          exact = Search.topK(emb, "embedding", "vec_id", q, k = 10)
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet
          r <- dial
        } yield {
          val hit = (adc.take(r).toSet & exact).size
          (qid, r, hit.toLong,
            math.rint(hit.toDouble / exact.size * 10000) / 10000)
        }
        import s.implicits._
        rows.toDF("qid", "rerank_depth", "n_hit", "recall_at_10")
          .orderBy(col("qid"), col("rerank_depth"))
      },
      None,
      "residual IVF-PQ quality: recall@10 vs exact across the rerank dial at the shared nprobe"),

    "incr_ivfpq_append" -> DeclaredQuery(
      // INCREMENTAL MAINTENANCE OF THE COMPRESSED INDEX, driver-visible
      // end-to-end (the incr_ivf_append story, composed with PQ): a
      // day-1 codes table (the shared residual-codes table MINUS the
      // incoming slice — no re-train, no re-encode of existing rows)
      // receives the incoming batch via assign-to-frozen-centroids +
      // residual-encode-under-the-frozen-codebooks + partition append
      // (only touched cells gain files). Evidence: an EXHAUSTIVE probe
      // (nprobe = k) of the appended table, exact-re-ranked at full
      // depth, degenerates to exact brute force over whatever the index
      // CONTAINS — so its top-10 must equal the exact top-10 over the
      // whole corpus; a vector lost (or double-appended) by the append
      // path breaks the match column. Rows-only per the contract.
      (s, dir) => {
        val ix = sharedIvfPqIndex(s, dir)
        val ivf = sharedIvfIndex(s, dir)
        val emb = T(s, dir, "embeddings")
        // memoized day-1 codes slice, file-copied fresh (append mutates)
        val path = day1SliceCopy(s, ix.codesPath, "ivfpqapp")
        try {
          val incoming = emb.filter(col("vec_id") % 10 === 0)
          PqIndex.encodeResidual(incoming, "vec_id", "embedding",
              IvfIndex.assignTo(incoming, "vec_id", "embedding",
                ivf.centroids),
              ivf.centroids, ix.codebooks)
            .repartition(col("cluster_id"))
            .write.partitionBy("cluster_id").mode("append").parquet(path)
          val n = emb.count().toInt
          val probed = PqIndex.probeIvfPq(s, path, "vec_id", ivf.centroids,
              QueryVectors.q1, ix.codebooks, k = 10, nprobe = ivf.k,
              rerank = Some((emb, "embedding", math.max(10, n))))
            .select(col("vec_id"), col("sim"))
          val exact = Search.topK(emb, "embedding", "vec_id",
              QueryVectors.q1, k = 10)
            .select(col("vec_id"), col("sim").as("sim_exact"))
          localFrame(probed.join(exact, Seq("vec_id"), "full_outer")
            .select(col("vec_id"), col("sim"), col("sim_exact"),
              (col("sim") === col("sim_exact")).as("matches"))
            .orderBy(desc("sim"), asc("vec_id")))
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(path).getParentFile)
      },
      None,
      "incremental IVF-PQ append: frozen centroids + frozen codebooks + partition append; exhaustive probe ≡ exact top-10"),

    "ivf_recall" -> DeclaredQuery(
      // driver-visible index QUALITY evidence: recall@10 of the shared
      // partitioned-index probe vs the exact brute-force top-10, for both
      // fixture query vectors. The collects are k-bounded (10 ids per
      // side per query — same class as localFrame's tiny-result rule);
      // at corpus scale the same number is one anti-join between two
      // k-row relations. Float-iterative k-means → rows-only per the
      // contract; the VALUE the row carries is the point: the
      // corpus-scaled operating point (ivfSizing: k ≈ √n, nprobe reading
      // ~15 % of the corpus) must keep recall@10 ≥ 0.9, and a collapsed
      // index would surface here as a driver-visible drop, not a
      // spec-only one.
      (s, dir) => {
        val ivf = sharedIvfIndex(s, dir)
        val emb = T(s, dir, "embeddings")
        // the accelerate-vs-recall dial, anchored to the build's chosen
        // point: half the declared nprobe (the cheap end), the declared
        // nprobe itself (what ivf_probe/_part/_many actually run — THE
        // certified row), and nprobe = k, which probes every cluster and
        // MUST be exactly 1.0 — the index-completeness self-check (a
        // vector lost by the partitioned layout would surface here).
        // The dial's INDEX side is measured by ONE distributed job
        // (IvfIndex.calibrationTopK): per-(query, cluster) top-10 rows,
        // from which the driver reads every nprobe's answer with
        // probePartitioned's exact scoring and tie-breaks (equivalence
        // asserted in IvfIndexSpec) — instead of two probe jobs per
        // dial point. The EXACT side deliberately stays a brute-force
        // scan of the SOURCE table, never the index: deriving "exact"
        // from the index itself would hide exactly the lost-vector
        // failure the nprobe = k row exists to catch.
        val dial = Seq(math.max(2, ivf.nprobe / 2), ivf.nprobe, ivf.k)
          .distinct
        val centsSeq = ivf.centroids.collect().toIndexedSeq
          .map(r => (r.getInt(0), r.getSeq[Double](1).toIndexedSeq))
        val calib = Seq((1L, QueryVectors.q1), (2L, QueryVectors.q2))
        val sweep = IvfIndex.calibrationTopK(s, ivf.indexPath, "vec_id",
          "embedding", centsSeq, calib, k = 10)
        def topAt(qid: Long, np: Int): Set[Long] =
          sweep.iterator.filter(t => t._1 == qid && t._2 < np).toSeq
            .sortBy(t => (-t._4, t._3)).take(10).map(_._3).toSet
        val rows = for {
          (qid, q) <- calib
          exact = Search.topK(emb, "embedding", "vec_id", q, k = 10)
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet
          nprobe <- dial
        } yield {
          val probed = topAt(qid, nprobe)
          val recall = math.rint(
            (exact & probed).size.toDouble / exact.size * 10000) / 10000
          (qid, nprobe, (exact & probed).size.toLong, recall)
        }
        import s.implicits._
        rows.toDF("qid", "nprobe", "n_hit", "recall_at_10")
          .orderBy(col("qid"), col("nprobe"))
      },
      None,
      "B6 quality: recall@10 of the shared IVF probe vs exact top-k across the nprobe dial"),

    "incr_ivf_append" -> DeclaredQuery(
      // INCREMENTAL IVF MAINTENANCE, driver-visible end-to-end: a day-1
      // index (the shared partitioned table MINUS the incoming slice —
      // reusing the shared build's rows and assignments, no second
      // k-means) receives the incoming batch via IvfIndex.assignTo
      // (zero-shuffle projection-argmin against the EXISTING centroids)
      // + appendPartitioned (only touched partitions gain files). The
      // emitted evidence is the completeness check: probing the appended
      // table at nprobe = k is exhaustive over the index, so its top-10
      // must EQUAL the exact brute-force top-10 over the whole corpus —
      // a vector lost (or double-appended) by the append path would
      // break the match column. Float-iterative centroids → rows-only
      // per the contract; byte-level append ≡ rebuild-with-same-
      // centroids equivalence is asserted in IvfIndexSpec.
      (s, dir) => {
        val ivf = sharedIvfIndex(s, dir)
        val emb = T(s, dir, "embeddings")
        // day-1 index: shared table rows NOT in the incoming slice
        // (cluster_id rides along from the existing assignment) — a
        // memoized slice, file-copied fresh since the append mutates it
        val path = day1SliceCopy(s, ivf.indexPath, "ivfapp")
        try {
          // day-2: assign incoming against the FROZEN centroids, append
          val incoming = emb.filter(col("vec_id") % 10 === 0)
          IvfIndex.appendPartitioned(incoming, "vec_id",
            IvfIndex.assignTo(incoming, "vec_id", "embedding", ivf.centroids),
            path)
          val probed = IvfIndex.probePartitioned(s, path, "vec_id",
            "embedding", ivf.centroids, QueryVectors.q1, k = 10,
            nprobe = ivf.k)
            .select(col("vec_id"), col("sim"))
          val exact = graft.operators.Search
            .topK(emb, "embedding", "vec_id", QueryVectors.q1, k = 10)
            .select(col("vec_id"), col("sim").as("sim_exact"))
          localFrame(probed.join(exact, Seq("vec_id"), "full_outer")
            .select(col("vec_id"), col("sim"), col("sim_exact"),
              (col("sim") === col("sim_exact")).as("matches"))
            .orderBy(desc("sim"), asc("vec_id")))
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(path).getParentFile)
      },
      None,
      "incremental IVF append: assign-to-existing-centroids + partition append; probe@k ≡ exact top-10"),

    "incr_sq_append" -> DeclaredQuery(
      // INCREMENTAL SQ8 MAINTENANCE — the third index family's
      // ingestion-side completion (incr_ivf_append / incr_ivfpq_append
      // are the other two): the incoming batch is encoded under the
      // FROZEN day-1 grid (a pure projection — no re-train, no re-encode
      // of existing rows, no corpus touch) and appended to the codes
      // table. SQ's drift hazard is CLIPPING, not cell assignment: an
      // incoming value outside the day-1 [vmin, vmax] saturates at the
      // grid edge, so the emitted evidence is the re-ranked probe at a
      // modest fixed depth (r = 5k) vs the exact top-10 over
      // corpus ∪ batch with a per-row match column — grid drift shows up
      // as false rows here long before it hurts a deep sweep
      // (rebuild-when-quality-decays, the incr_ivf_append recipe).
      // Grid placement is float min/max → rows-only per the contract;
      // append ≡ full re-encode byte equality is asserted in SqIndexSpec.
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        val day1 = emb.filter(col("vec_id") % 10 =!= 0)
        val incoming = emb.filter(col("vec_id") % 10 === 0)
        // day-1 grid, trained WITHOUT the incoming slice
        val p = SqIndex.trainParams(day1, "vec_id", "embedding")
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-sqapp")
        try {
          val path = s"$tmpRoot/codes"
          SqIndex.encode(day1, "vec_id", "embedding", p)
            .write.mode("overwrite").parquet(path)
          // day-2: encode under the FROZEN grid, append — only new files
          SqIndex.encode(incoming, "vec_id", "embedding", p)
            .write.mode("append").parquet(path)
          val probed = SqIndex.searchRerank(s.read.parquet(path), emb,
            "vec_id", "embedding", QueryVectors.q1, p, k = 10, r = 50)
            .select(col("vec_id"), col("sim"))
          val exact = graft.operators.Search
            .topK(emb, "embedding", "vec_id", QueryVectors.q1, k = 10)
            .select(col("vec_id"), col("sim").as("sim_exact"))
          localFrame(probed.join(exact, Seq("vec_id"), "full_outer")
            .select(col("vec_id"), col("sim"), col("sim_exact"),
              (col("sim") === col("sim_exact")).as("matches"))
            .orderBy(desc("sim"), asc("vec_id")))
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(tmpRoot.toFile)
      },
      // PROMOTED (round 10): the grid is pure min/max over the day-1
      // slice, so the whole frozen-grid maintenance cycle — including
      // the clipping drift hazard — replays as static SQL
      Some(incrSqAppendOracleSql),
      "incremental SQ8 append: frozen-grid encode + file append; rerank vs exact top-10 (full DuckDB replay incl. edge clipping)"),

    "ann_lsh" -> DeclaredQuery(
      // PROMOTED to the byte-exact oracle: the hyperplanes are
      // deterministic exact-6-decimal values (HyperplaneLsh.planes —
      // chosen that way so driver and executors agree bit-for-bit),
      // which means the same decimal literals parse to identical
      // doubles in DuckDB and the whole bucket fold — sign(dot) bit
      // per plane, multi-probe IN-set, exact re-rank — replays as
      // static SQL. One engine hiding a flipped sign bit or a wrong
      // probe bucket breaks the hash.
      (s, dir) => graft.operators.HyperplaneLsh.annSearch(
        T(s, dir, "embeddings"), "vec_id", "embedding",
        QueryVectors.q1, k = 10, nBits = 6)
        .select(col("vec_id"), col("sim")),
      Some(annLshOracleSql),
      "LSH-bucketed ANN: sign-random-projection buckets + multi-probe + exact rerank (deterministic planes -> full DuckDB replay)"),

    "jl_topk" -> DeclaredQuery(
      // JOHNSON–LINDENSTRAUSS dimensionality reduction (Achlioptas 2003
      // ±1 form), byte-exact oracle: project 64-dim embeddings to 16
      // dims through the deterministic ±0.25 Rademacher matrix (every
      // entry an exact binary fraction — both engines parse identical
      // doubles) and rank by the PROJECTED dot against the projected
      // query. dot(Px, Pq) ≈ dot(x, q) is the JL contract; this row
      // certifies the projection arithmetic itself, the spec certifies
      // the distortion bound. One row-local projection per row — 16
      // native dots over plan literals, no UDF, no shuffle; at scale
      // the projected corpus is materialized once and every downstream
      // pass reads k/d of the bytes.
      (s, dir) => T(s, dir, "embeddings")
        .select(col("vec_id"),
          r4(dot(VectorFunctions.project(col("embedding"), jlM),
            vecLit(jlQ1))).as("psim"))
        .orderBy(desc("psim"), asc("vec_id")).limit(10),
      Some(s"""SELECT vec_id, $jlPsimSql AS psim
         |FROM embeddings ORDER BY psim DESC, vec_id LIMIT 10""".stripMargin),
      "JL random projection 64→16: top-k by projected dot, matrix + projected query replayed as SQL literals"),

    "jl_search_rerank" -> DeclaredQuery(
      // the JL PREFILTER ANN tier, end-to-end under the oracle: rank
      // by projected dot in 16-dim space (4× fewer bytes than the raw
      // scan), keep the top-50 candidates, then re-rank the survivors
      // by the EXACT 64-dim dot — the classic reduce-then-refine shape
      // (same as PQ's ADC + exact re-rank, but with a closed-form
      // transform the oracle can replay: both the candidate cut —
      // rounded psim with vec_id tiebreak — and the final exact
      // ordering must reproduce DuckDB's row_number replay exactly).
      (s, dir) => {
        val scored = T(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            r4(dot(VectorFunctions.project(col("embedding"), jlM),
              vecLit(jlQ1))).as("psim"))
        scored.orderBy(desc("psim"), asc("vec_id")).limit(50)
          .select(col("vec_id"),
            r4(dot(col("embedding"), vecLit(QueryVectors.q1))).as("sim"))
          .orderBy(desc("sim"), asc("vec_id")).limit(10)
      },
      Some(s"""WITH scored AS (
         |  SELECT vec_id, $jlPsimSql AS psim,
         |    round(${duckDot("embedding", q1Sql)}, 4) AS sim
         |  FROM embeddings),
         |cand AS (SELECT vec_id, sim FROM (
         |  SELECT vec_id, sim,
         |    row_number() OVER (ORDER BY psim DESC, vec_id) AS rn
         |  FROM scored) WHERE rn <= 50)
         |SELECT vec_id, sim FROM cand
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin),
      "JL-prefiltered ANN: projected-space candidate cut + exact full-dim re-rank, the whole reduce-then-refine pipeline hash-matched"),

    "minhash_pairs" -> DeclaredQuery(
      // the signature pass → band self-join → Jaccard verify chain,
      // served from the per-dir memo shared with dedup_pipeline_lsh
      // (one corpus-wide signature scan per declared-set pass; the memo
      // itself runs minHashCandidatesMaterialized + jaccardVerify, the
      // same chain this query always declared)
      (s, dir) => sharedMinhashVerified(s, dir)
        .filter(col("jaccard") >= 0.8)
        .orderBy(col("id_a"), col("id_b")),
      None,
      "B8: MinHash-LSH candidates + Jaccard verify (seeded xxhash64, no SQL analog)"),

    "near_dup_embed_lsh" -> DeclaredQuery(
      // the SCALE path for embedding near-dup (vs near_dup_embed's
      // bounded all-pairs verification tier): sign-LSH bucketed
      // candidates + exact-cosine verify, never corpus×corpus
      (s, dir) => {
        // THREE serial jobs end-to-end (was four): one persisted (id, vec)
        // working set whose materializing aggregation IS the (count, dim)
        // metadata fetch; buckets and the verify side are projections over
        // that cache, so no second cache-populating count is needed
        val base = T(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // job 1: populate the cache + fetch corpus size and dimension
          val meta = base.agg(count(lit(1)).as("n"),
            first(size(col("embedding"))).as("d")).head()
          // jobs 2-3: bucket self-join → local pair set → cosine verify,
          // everything reading from the cached base
          localFrame(lshNearDupVerify(base, meta.getLong(0), meta.getInt(1))
            .orderBy(col("id_a"), col("id_b")))
        } finally base.unpersist()
      },
      // PROMOTED (round 10): deterministic exact-decimal planes + a
      // table-derived nbits make the whole chain — banding formula,
      // bucket fold, multiprobe rule, cosine verify — a static SQL
      // replay; see nearDupEmbedLshOracleSql
      Some(nearDupEmbedLshOracleSql),
      "embedding near-dup, bucketed: sign-LSH candidates + exact cosine verify (full DuckDB replay incl. the banding formula)"),

    "simhash_pairs" -> DeclaredQuery(
      // materialized variant: the banded signature relation is persisted
      // across the self-join so the corpus-wide SimHash pass runs once,
      // not once per join side
      (s, dir) => NearDup.simHashCandidatesMaterialized(
        T(s, dir, "documents").filter(col("doc_id") < 2000),
        "doc_id", "text", maxHamming = 12)
        .orderBy(col("id_a"), col("id_b")),
      None,
      "B8: SimHash banded near-dup candidates (no SQL analog)"),

    "winnow_pairs" -> DeclaredQuery(
      // winnowing fingerprints as the candidate generator: docs meet only
      // inside a shared fingerprint bucket (explode + equi-join on the
      // fingerprint hash), never all-pairs; n_shared ≥ 2 filters
      // single-hash accidents
      (s, dir) => NearDup.winnowCandidatesMaterialized(
        T(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("id_a"), col("id_b")),
      None,
      "B8: winnowing-fingerprint near-dup candidates (seeded hash, no SQL analog)"),

    "q_approx_distinct" -> DeclaredQuery(
      (s, dir) => T(s, dir, "lineitem")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts")),
      None,
      "B24: HLL approx distinct (sketch-impl-specific, sanity-tested vs exact)"),

    "incr_vocab_sketch" -> DeclaredQuery(
      // incremental corpus statistics by MERGEABLE SKETCH — the
      // evolving-corpus completion of corpus_stats: each ingestion
      // batch (pmod(doc_id, 4)) contributes one per-lang
      // distinct-token HLL sketch, and corpus vocabulary is answered
      // by unioning the batch sketches — no rescan of earlier batches,
      // kilobytes of state per (lang, batch). The row carries its own
      // audit: exact distinct count alongside the merged estimate, the
      // relative error, and a second merge under a DIFFERENT batching
      // (pmod 2) whose estimate must be identical — the register-wise
      // union is associative, so how history was batched cannot matter.
      // Sketch-impl-specific per contract → rows-only; invariants
      // pinned in SketchSpec.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        def merged(nb: Int) = Sketch.mergeSketches(
            Sketch.vocabSketches(docs, "lang", "text",
              pmod(col("doc_id"), lit(nb))),
            Seq(col("lang")))
          .select(col("lang"), Sketch.estimate(col("sketch")).as(s"est_$nb"))
        val exact = docs.select(col("lang"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy("lang").agg(countDistinct(col("tok")).as("exact_vocab"))
        exact.join(merged(4), "lang").join(merged(2), "lang")
          .select(col("lang"), col("exact_vocab"),
            col("est_4").as("merged_est"),
            (col("est_4") === col("est_2")).as("grouping_invariant"),
            round(abs(col("est_4") - col("exact_vocab")) / col("exact_vocab"), 4)
              .as("rel_err"))
          .orderBy(col("lang"))
      },
      None,
      "incremental corpus stats: per-batch HLL vocab sketches union-merged; grouping-invariance audited in-row"),

    "incr_heavy_hitters" -> DeclaredQuery(
      // the FREQUENCY twin of incr_vocab_sketch: per-batch count-min
      // sketches of token occurrences, merged by counter addition —
      // which is EXACT, so unlike the HLL row the audit here is strict
      // equality: the per-language top-10 estimated under a pmod-3
      // batching must carry the identical estimate under a pmod-5
      // batching (est === est_alt), and the CMS one-sided guarantee
      // (est >= exact, always) rides in-row as well. Candidates come
      // from each batch's local top-30 (a sketch can answer lookups,
      // not enumerate). Seeded-sketch-impl row per contract →
      // rows-only; byte-exact merge + bound invariants in SketchSpec.
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val hh = Sketch.heavyHitters(docs, "lang", "text",
          pmod(col("doc_id"), lit(3)))
        // the alternate-batching estimate is a DIRECT lookup of hh's own
        // tokens against the pmod-5-merged sketch (not the alt run's
        // candidate list), so every row audits the merge invariance
        val altMerged = Sketch.mergeFreqSketches(
          Sketch.tokenFreqSketches(docs, "lang", "text",
            pmod(col("doc_id"), lit(5))),
          Seq(col("lang")))
        val exact = docs.select(col("lang"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy("lang", "tok").agg(count(lit(1)).as("exact_n"))
        hh.join(broadcast(altMerged), "lang")
          .withColumn("est_alt",
            Sketch.freqEstimate(col("cms"), col("tok")))
          .drop("cms")
          .join(exact, Seq("lang", "tok"))
          .select(col("lang"), col("rank"), col("tok"), col("est"),
            col("exact_n"),
            (col("est") === col("est_alt")).as("batching_invariant"),
            (col("est") >= col("exact_n")).as("one_sided"))
          .orderBy(col("lang"), col("rank"))
      },
      None,
      "incremental heavy hitters: candidate-tracked count-min top-10 per lang; exact-merge and one-sided-bound audits in-row"),

    "q_approx_percentile" -> DeclaredQuery(
      // sketch family alongside HLL (q_approx_distinct): approximate
      // percentiles are sketch-impl-specific (Spark uses a KLL-style
      // summary, DuckDB t-digest), so no cross-engine oracle — the exact
      // percentile runs alongside for in-row sanity, invariant-checked
      // in QueriesSpec determinism runs
      (s, dir) => T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          r4(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)))
            .as("approx_median"),
          r4(percentile(col("l_extendedprice"), lit(0.5))).as("exact_median"))
        .orderBy(col("l_returnflag")),
      None,
      "B24-adjacent: approx percentile sketch (exact column alongside for sanity)"),

    "media_decode" -> DeclaredQuery(
      (s, dir) => {
        val decoded = Multimodal.decodeAll(Multimodal.syntheticMedia(s, 300)).toDF()
        decoded.groupBy(col("kind"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("width")), 4).as("avg_w"),
            round(avg(col("n_frames")), 4).as("avg_frames"))
          .orderBy(col("kind"))
      },
      None,
      "multimodal FALLBACK tiers: header-parse dims for corrupt-stream payloads, stub for container-less ones"),

    "media_decode_hdr" -> DeclaredQuery(
      // the REAL-header slice of media_decode, promoted to the oracle:
      // image + audio synthetic rows carry byte-valid PNG IHDR / RIFF
      // WAVE headers written with KNOWN dimension formulas, so a DuckDB
      // replay of those formulas over `range()` is an exact expected
      // value — a green row proves the header PARSE inverts the header
      // WRITE end-to-end through the binary payload (the same round-trip
      // logic as q_extract_chunks). Video rows are the stub fallback
      // (hash-derived dims) and stay excluded — media_decode keeps them.
      (s, dir) => {
        val decoded =
          Multimodal.decodeAll(Multimodal.syntheticMedia(s, 300)).toDF()
        decoded.filter(col("kind") =!= "video")
          .select(col("media_id"), col("kind"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_frames").cast("long").as("n_frames"))
          .orderBy(col("media_id"))
      },
      Some("""
        SELECT i AS media_id,
          CASE WHEN i % 3 = 0 THEN 'image' ELSE 'audio' END AS kind,
          CASE WHEN i % 3 = 0 THEN 64 + i % 128 ELSE 12000 END AS width,
          CASE WHEN i % 3 = 0 THEN 48 + i % 96 ELSE 1 + i % 2 END AS height,
          CASE WHEN i % 3 = 0 THEN 1 ELSE 256 + i % 512 END AS n_frames
        FROM range(0, 300) t(i) WHERE i % 3 <> 2 ORDER BY media_id
      """),
      "multimodal header decode, oracle-checked: PNG/WAV write → parse round trip vs the generation formulas"),

    "media_pixels" -> DeclaredQuery(
      // REAL pixel decode, oracle-checked: the fixture's image rows are
      // genuine PNG encodings (zlib-deflated rasters) of solid colors
      // with closed-form dims/RGB, so JvmCodec's full decode — inflate,
      // raster walk, integer-sum features — must reproduce the color
      // formulas EXACTLY. Feature sums are integer-exact and each
      // feature is one double expression mirrored verbatim in the SQL
      // (then FLOAT-cast on both sides), so the hash match is bit-exact,
      // not tolerance-based.
      (s, dir) => {
        val dec = Multimodal.decodeAll(Multimodal.syntheticMediaReal(s, 240)).toDF()
        dec.filter(col("kind") === "image")
          .select(col("media_id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            round(element_at(col("features"), 1).cast("double"), 4).as("f_r"),
            round(element_at(col("features"), 2).cast("double"), 4).as("f_g"),
            round(element_at(col("features"), 3).cast("double"), 4).as("f_b"),
            round(element_at(col("features"), 4).cast("double"), 4).as("f_luma"),
            round(element_at(col("features"), 5).cast("double"), 4).as("f_std"),
            round(element_at(col("features"), 6).cast("double"), 4).as("f_grad"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH px AS (
          SELECT i, 32 + i % 32 AS w, 24 + i % 24 AS h,
                 (i * 17) % 256 AS r, (i * 29) % 256 AS g, (i * 43) % 256 AS b
          FROM range(0, 240) t(i) WHERE i % 3 = 0)
        SELECT i AS media_id, w::BIGINT AS width, h::BIGINT AS height,
          round(cast((w * h * r) / (w * h * 255.0) AS FLOAT)::DOUBLE, 4) AS f_r,
          round(cast((w * h * g) / (w * h * 255.0) AS FLOAT)::DOUBLE, 4) AS f_g,
          round(cast((w * h * b) / (w * h * 255.0) AS FLOAT)::DOUBLE, 4) AS f_b,
          round(cast((w * h * (299 * r + 587 * g + 114 * b)) / (w * h * 255000.0)
                AS FLOAT)::DOUBLE, 4) AS f_luma,
          0.0::DOUBLE AS f_std,
          0.0::DOUBLE AS f_grad
        FROM px ORDER BY media_id
      """),
      "multimodal REAL pixel decode: PNG encode → full JDK decode → exact integer-sum features vs the color formulas"),

    "media_wave" -> DeclaredQuery(
      // REAL PCM sample decode, oracle-checked: audio rows carry genuine
      // 16-bit PCM WAV of a constant (DC) signal, so RMS = peak = amp
      // and crossings = 0 are EXACT (perfect-square sqrt, power-of-two
      // divides — no rounding anywhere), replayable from the amp
      // formula.
      (s, dir) => {
        val dec = Multimodal.decodeAll(Multimodal.syntheticMediaReal(s, 240)).toDF()
        dec.filter(col("kind") === "audio")
          .select(col("media_id"),
            col("width").cast("long").as("sample_rate"),
            col("height").cast("long").as("channels"),
            col("n_frames").cast("long").as("n_frames"),
            round(element_at(col("features"), 1).cast("double"), 4).as("rms"),
            round(element_at(col("features"), 2).cast("double"), 4).as("zcr"),
            round(element_at(col("features"), 3).cast("double"), 4).as("peak"),
            round(element_at(col("features"), 5).cast("double"), 4).as("dur_s"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH au AS (
          SELECT i, 8000 + (i % 5) * 2000 AS rate, 1 + i % 2 AS ch,
                 400 + i % 256 AS frames, (i * 37) % 20000 AS amp
          FROM range(0, 240) t(i) WHERE i % 3 = 1)
        SELECT i AS media_id, rate::BIGINT AS sample_rate, ch::BIGINT AS channels,
          frames::BIGINT AS n_frames,
          round(cast(amp / 32768.0 AS FLOAT)::DOUBLE, 4) AS rms,
          0.0::DOUBLE AS zcr,
          round(cast(amp / 32768.0 AS FLOAT)::DOUBLE, 4) AS peak,
          round(cast(frames::DOUBLE / rate::DOUBLE AS FLOAT)::DOUBLE, 4) AS dur_s
        FROM au ORDER BY media_id
      """),
      "multimodal REAL PCM decode: WAV write → sample pass → exact RMS/peak/zcr vs the DC-amp formula"),

    "media_wave_adpcm" -> DeclaredQuery(
      // the COMPRESSED audio tier made real and oracle-checked: IMA/DVI
      // ADPCM (WAV format 17) decoded through the full public-spec
      // block state machine — per-channel headers, nibble groups, the
      // 89-entry step table, predictor clamps. The fixture signal is
      // the DC trick carried into the compressed domain: the block
      // header stores the amp as the initial predictor and every
      // nibble's reconstruction step resolves to +0 (index 0 → step 7 →
      // 7>>3), so the decoder does all the real work while RMS = peak =
      // amp and zcr = 0 stay EXACT closed forms. Nonzero-nibble decode
      // correctness (quantizer round-trip SNR, stereo de-interleave,
      // state carry across blocks) is JvmCodecAdpcmSpec's job.
      (s, dir) => {
        val dec = Multimodal.decodeAll(
          Multimodal.syntheticMediaAdpcm(s, 80)).toDF()
        dec.select(col("media_id"),
            col("width").cast("long").as("sample_rate"),
            col("height").cast("long").as("channels"),
            col("n_frames").cast("long").as("n_frames"),
            round(element_at(col("features"), 1).cast("double"), 4).as("rms"),
            round(element_at(col("features"), 2).cast("double"), 4).as("zcr"),
            round(element_at(col("features"), 3).cast("double"), 4).as("peak"),
            round(element_at(col("features"), 5).cast("double"), 4).as("dur_s"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH au AS (
          SELECT i, 8000 + (i % 5) * 2000 AS rate, 1 + i % 2 AS ch,
                 401 + (i % 13) * 8 AS frames, (i * 53) % 18000 AS amp
          FROM range(0, 80) t(i))
        SELECT i AS media_id, rate::BIGINT AS sample_rate,
          ch::BIGINT AS channels, frames::BIGINT AS n_frames,
          round(cast(amp / 32768.0 AS FLOAT)::DOUBLE, 4) AS rms,
          0.0::DOUBLE AS zcr,
          round(cast(amp / 32768.0 AS FLOAT)::DOUBLE, 4) AS peak,
          round(cast(frames::DOUBLE / rate::DOUBLE AS FLOAT)::DOUBLE, 4) AS dur_s
        FROM au ORDER BY media_id
      """),
      "multimodal REAL IMA ADPCM decode: compressed WAV → block state machine → exact DC stats vs the amp formula"),

    "media_phash" -> DeclaredQuery(
      // REAL perceptual hash, oracle-checked BIT-FOR-BIT: 9×8 genuine
      // PNGs make the dHash area-average grid the identity map, so each
      // of the 64 comparison bits is a pure integer formula the SQL
      // replays (bit 63 via the min-BIGINT literal — DuckDB's << checks
      // overflow). Proves decode → luma → grid → hash end-to-end.
      (s, dir) => {
        val dec = Multimodal.decodeAll(
          Multimodal.syntheticGridMedia(s, nGroups = 24, perGroup = 5)).toDF()
        dec.select(col("media_id"), col("phash")).orderBy(col("media_id"))
      },
      Some("""
        SELECT i AS media_id,
          bit_or(CASE WHEN ((i // 5) * 31 + (x + 1) * (7 + (i // 5) % 5) + y * 13) % 17
                        > ((i // 5) * 31 + x * (7 + (i // 5) % 5) + y * 13) % 17
                 THEN CASE WHEN y * 8 + x = 63 THEN (-9223372036854775807 - 1)
                      ELSE (1::BIGINT << (y * 8 + x)) END
                 ELSE 0 END) AS phash
        FROM range(0, 120) t(i), range(0, 8) u(x), range(0, 8) v(y)
        GROUP BY i ORDER BY media_id
      """),
      "multimodal perceptual dHash, bit-exact oracle: 9×8 PNG decode → grid compare vs the pixel formula"),

    "media_phash_dedup" -> DeclaredQuery(
      // Perceptual near-dup by dHash, oracle-checked through the
      // categorical trick: groups differ by pattern, members within a
      // group only by a uniform brightness shift (the canonical
      // re-exported-image near-dup) — dHash's strict adjacent compare is
      // shift-invariant, so grouping by hash must recover EXACTLY the
      // construction groups (distinct-hash guarantee across ≤85 groups
      // per the fixture's coefficient argument).
      (s, dir) => {
        val dec = Multimodal.decodeAll(
          Multimodal.syntheticGridMedia(s, nGroups = 24, perGroup = 5)).toDF()
        dec.groupBy(col("phash"))
          .agg(min(col("media_id")).as("rep"), count(lit(1)).as("n"))
          .select(col("rep"), col("n"))
          .orderBy(col("rep"))
      },
      Some("""
        SELECT (g * 5)::BIGINT AS rep, 5::BIGINT AS n
        FROM range(0, 24) t(g) ORDER BY rep
      """),
      "perceptual near-dup: brightness-shifted image groups collapse to one dHash each, grouping oracle-checked"),

    "media_resize_pixels" -> DeclaredQuery(
      // REAL resize end-to-end, oracle-checked: decode genuine PNGs,
      // area-average downscale to maxSide 16, PNG re-encode, then DECODE
      // THE RESIZED PAYLOAD AGAIN — target dims replay the
      // floor(side·scale + ½) formula and the solid color survives the
      // round trip exactly (area-average of a constant is the constant).
      // Certifies decode → resample → encode → decode as one loop.
      (s, dir) => {
        import s.implicits._
        val real = Multimodal.syntheticMediaReal(s, 120)
        val rz = Multimodal.resizeImages(Multimodal.decodeAll(real), real, maxSide = 16)
        val asMedia = rz.map(r => Multimodal.MediaRow(
          r.media_id, "image", r.payload, "png", r.payload.length.toLong))
        Multimodal.decodeAll(asMedia).toDF()
          .select(col("media_id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            round(element_at(col("features"), 1).cast("double"), 4).as("f_r"),
            round(element_at(col("features"), 4).cast("double"), 4).as("f_luma"),
            round(element_at(col("features"), 5).cast("double"), 4).as("f_std"))
          .orderBy(col("media_id"))
      },
      Some("""
        WITH src AS (
          SELECT i, 32 + i % 32 AS w, 24 + i % 24 AS h,
                 (i * 17) % 256 AS r, (i * 29) % 256 AS g, (i * 43) % 256 AS b
          FROM range(0, 120) t(i) WHERE i % 3 = 0),
        dims AS (
          SELECT i, r, g, b,
            greatest(cast(floor(w * (16.0 / greatest(w, h)) + 0.5) AS BIGINT), 1) AS nw,
            greatest(cast(floor(h * (16.0 / greatest(w, h)) + 0.5) AS BIGINT), 1) AS nh
          FROM src)
        SELECT i AS media_id, nw AS width, nh AS height,
          round(cast((nw * nh * r) / (nw * nh * 255.0) AS FLOAT)::DOUBLE, 4) AS f_r,
          round(cast((nw * nh * (299 * r + 587 * g + 114 * b)) / (nw * nh * 255000.0)
                AS FLOAT)::DOUBLE, 4) AS f_luma,
          0.0::DOUBLE AS f_std
        FROM dims ORDER BY media_id
      """),
      "multimodal REAL resize: decode → area-average → PNG re-encode → re-decode, dims and colors oracle-exact"),

    "media_phash_near" -> DeclaredQuery(
      // Banded Hamming near-dup over REAL perceptual hashes,
      // oracle-checked against the deliberately quadratic DuckDB ground
      // truth: Spark runs the scale shape (4×16-bit band bucket join,
      // never all-pairs) while DuckDB recomputes every phash from the
      // bit formula and compares ALL pairs. Equality holds because
      // recall at Hamming ≤ 3 is total by pigeonhole — 3 flipped bits
      // cannot touch all 4 bands — so the banded join must find exactly
      // the exhaustive answer.
      (s, dir) => {
        val dec = Multimodal.decodeAll(
          Multimodal.syntheticGridMedia(s, nGroups = 24, perGroup = 5)).toDF()
        NearDup.signatureCandidates(dec, "media_id", "phash", maxHamming = 3)
          .select(col("id_a"), col("id_b"),
            col("hamming").cast("long").as("hamming"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""
        WITH h AS (
          SELECT i AS media_id,
            bit_or(CASE WHEN ((i // 5) * 31 + (x + 1) * (7 + (i // 5) % 5) + y * 13) % 17
                          > ((i // 5) * 31 + x * (7 + (i // 5) % 5) + y * 13) % 17
                   THEN CASE WHEN y * 8 + x = 63 THEN (-9223372036854775807 - 1)
                        ELSE (1::BIGINT << (y * 8 + x)) END
                   ELSE 0 END) AS phash
          FROM range(0, 120) t(i), range(0, 8) u(x), range(0, 8) v(y)
          GROUP BY i)
        SELECT a.media_id AS id_a, b.media_id AS id_b,
          bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
        FROM h a, h b
        WHERE a.media_id < b.media_id
          AND bit_count(xor(a.phash, b.phash)) <= 3
        ORDER BY id_a, id_b
      """),
      "image near-dup at the scale shape: banded phash bucket join ≡ exhaustive Hamming pairs (pigeonhole recall)"),

    "media_admit" -> DeclaredQuery(
      // The perceptual ADMISSION DECISION oracle-checked end-to-end via
      // the categorical trick: the corpus hash index holds one rep per
      // pattern group 0-11; the incoming batch carries a
      // brightness-shifted member of EVERY group 0-15 under new ids.
      // admitMediaPerceptual must reject exactly the 12 indexed groups
      // (dHash is shift-invariant, the banded cross-join has total
      // recall at Hamming ≤ 3) and admit exactly the 4 novel ones — a
      // closed-form id set DuckDB replays from the group arithmetic
      // alone. Certifies decode → hash → banded cross-join → anti-join
      // as one decision.
      (s, dir) => {
        import s.implicits._
        val grid = Multimodal.syntheticGridMedia(s, nGroups = 16, perGroup = 5)
          .collect()
        val corpusMedia = s.createDataset(
          grid.filter(r => r.media_id % 5 == 0 && r.media_id < 60).toSeq)
        val index = Multimodal.mediaIndexProjection(
          Multimodal.decodeAll(corpusMedia).toDF()
            .join(corpusMedia.toDF().select(col("media_id"),
              xxhash64(col("payload")).as("payload_hash")), "media_id"))
        val incoming = s.createDataset(
          grid.filter(_.media_id % 5 == 2)
            .map(r => r.copy(media_id = r.media_id + 1000)).toSeq)
        val (admitted, _) = Multimodal.admitMediaPerceptual(incoming, index)
        admitted.select(col("media_id")).orderBy(col("media_id"))
      },
      Some("""
        SELECT (1000 + g * 5 + 2)::BIGINT AS media_id
        FROM range(12, 16) t(g) ORDER BY media_id
      """),
      "perceptual admission decision: indexed groups rejected, novel groups admitted — closed-form oracle"),

    "media_near_mixed" -> DeclaredQuery(
      // The degenerate-safe analysis join, oracle-checked over a MIXED
      // corpus — the hot-bucket fix certified end-to-end: 30 solid
      // images (all dHash 0 — the mega-bucket hazard) pair ONLY when
      // their quantized mean colors match, while 30 structured grid
      // images pair through the banded Hamming join; DuckDB replays
      // both rules from the fixture formulas (color buckets via the
      // same double expression, hashes via the bit formula) and takes
      // the exhaustive union.
      (s, dir) => {
        import s.implicits._
        val solids = Multimodal.syntheticMediaReal(s, 90)
          .filter(col("kind") === "image")
        val grid = Multimodal.syntheticGridMedia(s, nGroups = 6, perGroup = 5)
          .map(r => r.copy(media_id = r.media_id + 10000))
        val dec = Multimodal.decodeAll(solids.unionByName(grid)).toDF()
        Multimodal.imageNearDup(dec, maxHamming = 3)
          .select(col("id_a"), col("id_b"),
            col("hamming").cast("long").as("hamming"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""
        WITH solid AS (
          SELECT i AS id, 32 + i % 32 AS w, 24 + i % 24 AS h,
                 (i * 17) % 256 AS r, (i * 29) % 256 AS g, (i * 43) % 256 AS b
          FROM range(0, 90) t(i) WHERE i % 3 = 0),
        cb AS (
          SELECT id,
            (least(floor(cast((w * h * r) / (w * h * 255.0) AS FLOAT)::DOUBLE * 16), 15) * 16 +
             least(floor(cast((w * h * g) / (w * h * 255.0) AS FLOAT)::DOUBLE * 16), 15)) * 16 +
             least(floor(cast((w * h * b) / (w * h * 255.0) AS FLOAT)::DOUBLE * 16), 15) AS cbucket
          FROM solid),
        degpairs AS (
          SELECT a.id AS id_a, b.id AS id_b, 0::BIGINT AS hamming
          FROM cb a, cb b WHERE a.id < b.id AND a.cbucket = b.cbucket),
        ph AS (
          SELECT i + 10000 AS id,
            bit_or(CASE WHEN ((i // 5) * 31 + (x + 1) * (7 + (i // 5) % 5) + y * 13) % 17
                          > ((i // 5) * 31 + x * (7 + (i // 5) % 5) + y * 13) % 17
                   THEN CASE WHEN y * 8 + x = 63 THEN (-9223372036854775807 - 1)
                        ELSE (1::BIGINT << (y * 8 + x)) END
                   ELSE 0 END) AS h
          FROM range(0, 30) t(i), range(0, 8) u(x), range(0, 8) v(y)
          GROUP BY i),
        structpairs AS (
          SELECT a.id AS id_a, b.id AS id_b,
                 bit_count(xor(a.h, b.h))::BIGINT AS hamming
          FROM ph a, ph b
          WHERE a.id < b.id AND bit_count(xor(a.h, b.h)) <= 3)
        SELECT id_a, id_b, hamming FROM degpairs
        UNION ALL SELECT id_a, id_b, hamming FROM structpairs
        ORDER BY id_a, id_b
      """),
      "degenerate-safe image near-dup over a mixed corpus: color-bucket rule for featureless, banded Hamming for structured — exhaustive oracle"),

    "media_scan_meta" -> DeclaredQuery(
      // The header-only TRIAGE sweep (scanMetadata — the 100 TB
      // classify-before-decode pass), oracle-checked: real-payload
      // fixture, dims/frame counts must replay the generation formulas
      // without any pixel decode having run.
      (s, dir) => {
        val scanned =
          Multimodal.scanMetadata(Multimodal.syntheticMediaReal(s, 240)).toDF()
        scanned.filter(col("kind") =!= "video")
          .select(col("media_id"), col("kind"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_frames").cast("long").as("n_frames"))
          .orderBy(col("media_id"))
      },
      Some("""
        SELECT i AS media_id,
          CASE WHEN i % 3 = 0 THEN 'image' ELSE 'audio' END AS kind,
          CASE WHEN i % 3 = 0 THEN 32 + i % 32 ELSE 8000 + (i % 5) * 2000 END AS width,
          CASE WHEN i % 3 = 0 THEN 24 + i % 24 ELSE 1 + i % 2 END AS height,
          CASE WHEN i % 3 = 0 THEN 1 ELSE 400 + i % 256 END AS n_frames
        FROM range(0, 240) t(i) WHERE i % 3 <> 2 ORDER BY media_id
      """),
      "header-only triage sweep over real payloads, oracle-checked vs the generation formulas"),

    "media_mp4_meta" -> DeclaredQuery(
      // REAL MP4 metadata decode, oracle-checked: byte-valid ISO-BMFF
      // skeletons (ftyp + moov/mvhd/trak/tkhd/stts with true big-endian
      // box layout and 16.16 fixed-point dims) written from closed-form
      // formulas, walked back by the real box parser — the VIDEO triage
      // tier at 100 TB (classify and size assets from header bytes; the
      // pixel tier honestly still needs codecs the JVM lacks).
      (s, dir) => {
        import s.implicits._
        val media = s.range(120L).map { i =>
          val p = Multimodal.syntheticMp4(
            (320 + (i % 16) * 8).toInt, (240 + (i % 8) * 8).toInt,
            timescale = 1000, duration = 1000 + (i % 50) * 200,
            samples = (240 + (i % 60)).toInt)
          Multimodal.MediaRow(i, "video", p, "mp4", p.length.toLong)
        }
        Multimodal.decodeAll(media).toDF()
          .select(col("media_id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_frames").cast("long").as("n_frames"))
          .orderBy(col("media_id"))
      },
      Some("""
        SELECT i AS media_id,
          (320 + (i % 16) * 8)::BIGINT AS width,
          (240 + (i % 8) * 8)::BIGINT AS height,
          (240 + i % 60)::BIGINT AS n_frames
        FROM range(0, 120) t(i) ORDER BY media_id
      """),
      "real MP4 box-walk metadata: ISO-BMFF write → parse round trip vs the generation formulas"),

    "media_mkv_meta" -> DeclaredQuery(
      // REAL Matroska metadata decode, oracle-checked: byte-valid EBML
      // documents (RFC 8794 varints, the published element IDs) written
      // from closed-form formulas, walked back by the real parser —
      // dims from Tracks/Video, duration from Info's float Duration ×
      // TimestampScale. Frame counts live in clusters, not headers:
      // n_frames is honestly 0 (unknown) and the row certifies what the
      // header CAN know.
      (s, dir) => {
        import s.implicits._
        val media = s.range(100L).map { i =>
          val p = Multimodal.syntheticMkv(
            (640 + (i % 10) * 2).toInt, (360 + (i % 6) * 2).toInt,
            durationMs = 5000 + (i % 40) * 100)
          Multimodal.MediaRow(i, "video", p, "mkv", p.length.toLong)
        }
        Multimodal.decodeAll(media).toDF()
          .select(col("media_id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("n_frames").cast("long").as("n_frames"))
          .orderBy(col("media_id"))
      },
      Some("""
        SELECT i AS media_id,
          (640 + (i % 10) * 2)::BIGINT AS width,
          (360 + (i % 6) * 2)::BIGINT AS height,
          0::BIGINT AS n_frames
        FROM range(0, 100) t(i) ORDER BY media_id
      """),
      "real Matroska EBML metadata: write → parse round trip vs the generation formulas"),

    "media_frames" -> DeclaredQuery(
      // REAL frame-sampled video-style decode, oracle-checked: genuine
      // multi-frame GIFs (6 full-frame solid rasters each, per-frame
      // colors from closed-form formulas), every 2nd stored frame
      // decoded to its own feature row — GIF palettes carry the exact
      // colors, so the per-frame means replay the (i, f) formulas with
      // the same integer-sum/FLOAT-cast discipline as media_pixels.
      // Certifies the multi-frame reader path (getNumImages + read(f))
      // frame by frame, not just the frame COUNT.
      (s, dir) => {
        val frames = Multimodal.extractFrames(
          Multimodal.syntheticAnimatedMedia(s, n = 60, framesPer = 6),
          stride = 2).toDF()
        frames.select(col("media_id"),
            col("frame_idx").cast("long").as("frame_idx"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            round(element_at(col("features"), 1).cast("double"), 4).as("f_r"),
            round(element_at(col("features"), 4).cast("double"), 4).as("f_luma"),
            round(element_at(col("features"), 5).cast("double"), 4).as("f_std"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some("""
        WITH fr AS (
          SELECT i, f, 16 + i % 8 AS w, 12 + i % 6 AS h,
                 (i * 17 + f * 31) % 256 AS r,
                 (i * 29 + f * 37) % 256 AS g,
                 (i * 43 + f * 41) % 256 AS b
          FROM range(0, 60) t(i), (VALUES (0), (2), (4)) u(f))
        SELECT i AS media_id, f::BIGINT AS frame_idx,
          w::BIGINT AS width, h::BIGINT AS height,
          round(cast((w * h * r) / (w * h * 255.0) AS FLOAT)::DOUBLE, 4) AS f_r,
          round(cast((w * h * (299 * r + 587 * g + 114 * b)) / (w * h * 255000.0)
                AS FLOAT)::DOUBLE, 4) AS f_luma,
          0.0::DOUBLE AS f_std
        FROM fr ORDER BY media_id, frame_idx
      """),
      "frame-sampled multi-frame decode: every 2nd GIF frame's features oracle-exact vs the (i, f) formulas"),

    "media_frame_near" -> DeclaredQuery(
      // VIDEO-SHAPE near-dup, oracle-checked against the exhaustive
      // ground truth: two multi-frame assets match when ANY frame of
      // one is within Hamming 3 of any frame of the other (re-encodes,
      // trims and splices share frames without any global signature
      // matching). Spark runs the scale shape — per-asset frame rows
      // into the 4×16-bit band bucket join, min frame-pair distance
      // per asset pair; DuckDB recomputes every frame hash from the
      // pattern bit formula and compares ALL frame pairs of ALL asset
      // pairs. Equality holds by the same pigeonhole-total-recall
      // argument as media_phash_near, lifted to frame multisets.
      (s, dir) => {
        val media = Multimodal.syntheticAnimatedGridMedia(
          s, n = 30, framesPer = 4, nPatterns = 10)
        Multimodal.frameNearDup(media, stride = 1, maxHamming = 3)
          .select(col("id_a"), col("id_b"),
            col("min_hamming").cast("long").as("min_hamming"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""
        WITH ph AS (
          SELECT p, bit_or(CASE WHEN (p * 31 + (x + 1) * (7 + p % 5) + y * 13) % 17
                                  > (p * 31 + x * (7 + p % 5) + y * 13) % 17
                   THEN CASE WHEN y * 8 + x = 63 THEN (-9223372036854775807 - 1)
                        ELSE (1::BIGINT << (y * 8 + x)) END
                   ELSE 0 END) AS h
          FROM range(0, 10) t(p), range(0, 8) u(x), range(0, 8) v(y)
          GROUP BY p),
        fr AS (
          SELECT i, (i + f) % 10 AS p
          FROM range(0, 30) t(i), range(0, 4) u(f)),
        pairs AS (
          SELECT a.i AS id_a, b.i AS id_b,
                 min(bit_count(xor(ha.h, hb.h))) AS min_hamming
          FROM fr a, ph ha, fr b, ph hb
          WHERE a.p = ha.p AND b.p = hb.p AND a.i < b.i
          GROUP BY a.i, b.i)
        SELECT id_a, id_b, min_hamming::BIGINT AS min_hamming
        FROM pairs WHERE min_hamming <= 3
        ORDER BY id_a, id_b
      """),
      "video-shape near-dup: any-frame banded match ≡ exhaustive min frame-pair Hamming (oracle)"),

    "media_ann" -> DeclaredQuery(
      // IMAGE similarity search end-to-end, oracle-checked: decode the
      // real-payload fixture, score every image's pixel-feature vector
      // against the (deterministically decoded) features of asset 6 by
      // the SAME dot-product machinery as the flagship knn_topk, take
      // top-10. DuckDB rebuilds each feature vector from the closed-form
      // fixture formulas (FLOAT-cast per component, the media_pixels
      // discipline) and replays list_dot_product against the literal
      // query — the image-retrieval pipeline (decode → featurize →
      // search) certified as one chain.
      (s, dir) => {
        val dec = Multimodal.decodeAll(Multimodal.syntheticMediaReal(s, 240))
          .toDF().filter(col("kind") === "image")
          .select(col("media_id"), col("features"))
        Search.topK(dec, "features", "media_id",
            mediaAnnQuery.map(_.toDouble).toSeq, k = 10)
          .select(col("media_id"), col("sim"))
      },
      Some(s"""
        WITH px AS (
          SELECT i, 32 + i % 32 AS w, 24 + i % 24 AS h,
                 (i * 17) % 256 AS r, (i * 29) % 256 AS g, (i * 43) % 256 AS b
          FROM range(0, 240) t(i) WHERE i % 3 = 0),
        fv AS (
          SELECT i, list_value(
            cast((w * h * r) / (w * h * 255.0) AS FLOAT)::DOUBLE,
            cast((w * h * g) / (w * h * 255.0) AS FLOAT)::DOUBLE,
            cast((w * h * b) / (w * h * 255.0) AS FLOAT)::DOUBLE,
            cast((w * h * (299 * r + 587 * g + 114 * b)) / (w * h * 255000.0)
              AS FLOAT)::DOUBLE,
            0.0::DOUBLE, 0.0::DOUBLE,
            cast(w::DOUBLE / (w::DOUBLE + h::DOUBLE) AS FLOAT)::DOUBLE,
            CASE WHEN 2 * (299 * r + 587 * g + 114 * b) > 255000
                 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END) AS fvec
          FROM px)
        SELECT i AS media_id,
               round(list_dot_product(fvec, ${mediaAnnQuerySql}), 4) AS sim
        FROM fv ORDER BY sim DESC, media_id LIMIT 10
      """),
      "image similarity search: decode → featurize → dot top-10, oracle vs formula-built vectors"),

    "q_expect_metrics" -> DeclaredQuery(
      // Data-quality EXPECTATIONS, metrics face: four named constraints
      // evaluated in ONE partial+final aggregate pass (no per-rule
      // scan), per-rule violation counts + the row total. NULL
      // predicate results count as violations on both engines (the
      // conservative side).
      (s, dir) => Expectations.metrics(T(s, dir, "documents"), docRules),
      Some("""
        SELECT rule, n_violations::BIGINT AS n_violations FROM (
          SELECT '_rows' AS rule, count(*) AS n_violations FROM documents
          UNION ALL SELECT 'len_max', count(*) FROM documents
            WHERE NOT coalesce(n_chars <= 400, FALSE)
          UNION ALL SELECT 'lang_known', count(*) FROM documents
            WHERE NOT coalesce(lang IN ('en', 'de', 'fr'), FALSE)
          UNION ALL SELECT 'text_nonempty', count(*) FROM documents
            WHERE NOT coalesce(length(text) > 0, FALSE)
          UNION ALL SELECT 'len_consistent', count(*) FROM documents
            WHERE NOT coalesce(length(text) = n_chars, FALSE)
        ) ORDER BY rule
      """),
      "expectation gate metrics: per-rule violation counts in one aggregate pass, oracle-checked"),

    "q_expect_quarantine" -> DeclaredQuery(
      // The quarantine face: rows failing any constraint, each carrying
      // WHICH rules it violated in declaration order — the triage
      // payload a production gate writes alongside the clean commit.
      (s, dir) => {
        val (_, bad) = Expectations.split(T(s, dir, "documents"), docRules)
        bad.select(col("doc_id"),
            array_join(col("_violations"), ",").as("violated"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, array_to_string(list_filter([
            CASE WHEN NOT coalesce(n_chars <= 400, FALSE) THEN 'len_max' END,
            CASE WHEN NOT coalesce(lang IN ('en', 'de', 'fr'), FALSE) THEN 'lang_known' END,
            CASE WHEN NOT coalesce(length(text) > 0, FALSE) THEN 'text_nonempty' END,
            CASE WHEN NOT coalesce(length(text) = n_chars, FALSE) THEN 'len_consistent' END
          ], x -> x IS NOT NULL), ',') AS violated
        FROM documents
        WHERE NOT coalesce(n_chars <= 400, FALSE)
           OR NOT coalesce(lang IN ('en', 'de', 'fr'), FALSE)
           OR NOT coalesce(length(text) > 0, FALSE)
           OR NOT coalesce(length(text) = n_chars, FALSE)
        ORDER BY doc_id
      """),
      "expectation gate quarantine: violating rows with their rule lists, oracle-checked"),

    "ivf_probe_fixed" -> DeclaredQuery(
      // the WHOLE IVF probe pipeline under FIXED centroids, oracle-green:
      // ivf_assign certifies the assignment arithmetic; this row chains
      // it through the probe's full shape — nearest-nprobe centroid
      // selection, the assignments ⋈ broadcast(near clusters) semi-join
      // candidate prune, and the exact dot-product top-k re-rank — and
      // hash-matches a DuckDB replay of every stage. Same seed-vector
      // centroid rule as ivf_assign (the build's deterministic init), so
      // the only thing the rows-only ivf_probe adds over this row is the
      // float-iterated centroids themselves.
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        import s.implicits._
        val seeds = emb.orderBy("vec_id").limit(8)
          .select(transform(col("embedding"), _.cast("double")).as("c"))
          .collect().toIndexedSeq.zipWithIndex
          .map { case (r, i) => (i, r.getSeq[Double](0)) }
        val cents = seeds.toDF("cluster_id", "centroid")
        val assign = IvfIndex.assignTo(emb, "vec_id", "embedding", cents)
        IvfIndex.probe(emb, "vec_id", "embedding", assign, cents,
          QueryVectors.q1, k = 10, nprobe = 3)
          .select(col("vec_id"), col("sim"))
      },
      Some(s"""WITH cents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster_id,
         |         CAST(embedding AS DOUBLE[]) AS centroid
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
         |), near AS (
         |  SELECT cluster_id FROM cents
         |  ORDER BY list_distance(centroid, $q1Sql), cluster_id LIMIT 3
         |), assign AS (
         |  SELECT vec_id, cluster_id FROM (
         |    SELECT e.vec_id, c.cluster_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.centroid),
         |                 c.cluster_id) AS rn
         |    FROM embeddings e CROSS JOIN cents c) WHERE rn = 1
         |)
         |SELECT e.vec_id, round(${duckDot("e.embedding", q1Sql)}, 4) AS sim
         |FROM embeddings e
         |WHERE e.vec_id IN
         |  (SELECT a.vec_id FROM assign a JOIN near n USING (cluster_id))
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin),
      "B6 probe pipeline under fixed centroids: centroid select + semi-join prune + exact top-k, all oracle-checked")
  )
}
