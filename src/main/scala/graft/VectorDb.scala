package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Embedder, VectorFunctions}
import graft.operators.Search
import graft.sources.EmbeddingCsv

/** The reference application's complete user-facing surface — its four
  * verbs *load, embed, search, append* (reference `app.py`: load
  * 51-58/145-152, embed 27-37, search 40-48, append 105-118) plus the
  * stats sidebar (A8/A9) — as a thin facade over the engine operators. A
  * user of the reference maps 1:1:
  *
  * | reference                           | here                     |
  * |-------------------------------------|--------------------------|
  * | upload CSV (replaces table)         | `load(path)`             |
  * | predefined file at startup          | `VectorDb.open(...)`     |
  * | "Add New Data" form                 | `add(chunkId, text)`     |
  * | "Search" button                     | `search(query, topK)`    |
  * | sidebar count / empty warning       | `count` / `isEmpty`      |
  * | (implied) persist                   | `save(path)`             |
  *
  * Deliberate semantic upgrades carried over from SURVEY.md §1.5: search
  * never mutates the stored corpus (vs `app.py:45`), ties break on
  * chunk_id, malformed CSV fails fast, and `add` is a lazy union instead
  * of a full-table copy (`app.py:118`).
  *
  * The session-scoped mutable corpus mirrors the reference's
  * `st.session_state` lifecycle (SURVEY.md §1.4); at scale the same calls
  * run against a parquet/Delta-style table root instead.
  */
final class VectorDb(spark: SparkSession,
                     embedder: Embedder = Embedder.default) {

  @volatile private var corpus: DataFrame = VectorDb.emptyCorpus(spark)
  // the handle that was actually cached — `corpus` may later wrap it in
  // unions (add), and unpersist matches by plan, so releasing must go
  // through the original cached plan, not the current corpus
  @volatile private var cached: Option[DataFrame] = None

  /** A9 — `df.empty` guard. */
  def isEmpty: Boolean = corpus.isEmpty

  /** A8 — sidebar count. */
  def count: Long = corpus.count()

  /** current corpus (read-only view). */
  def table: DataFrame = corpus

  /** A1/A2/A7 — read the reference CSV contract, REPLACING the corpus
    * (and releasing the previous corpus' cache).
    *
    * The new path is VALIDATED before the served handle is touched:
    * `read` is lazy, so a readable-but-malformed file would otherwise
    * pass the swap and then poison every subsequent `count`/`search`
    * with the old corpus already released — one bad `/load` request
    * permanently breaking the server (r13 advice). Validation is the
    * cache POPULATE itself (`fresh.count()` on the cached frame): cache
    * build materializes every column, which a bare `count()` would not
    * (CSV count pushdown skips field conversion, so a FAILFAST parse
    * error in an unreferenced column would sail through). A failed
    * populate releases the fresh entry and rethrows with the old corpus
    * still serving, cache intact — EXCEPT on a same-path reload: cache
    * entries match by plan, so there `.cache()` would silently no-op
    * against the old entry and "validation" would count the STALE rows
    * without ever touching the changed file (r14 advice). Same-path
    * reloads therefore drop the old entry FIRST (blocking, so the
    * populate below re-reads and re-validates the disk bytes); the
    * validate-before-swap ordering survives only for distinct paths,
    * where the two plans cache independently. The narrowed guarantee is
    * honest: once the file at the served path has been replaced on
    * disk, "keep serving the old bytes on a failed reload" is not a
    * promise the lazy CSV source could keep anyway. */
  def load(path: String): this.type = {
    // drop any cached file listing/status for the path (the shared
    // FileStatusCache outlives the plan cache, and a replaced file's
    // stale LENGTH would truncate or over-read the new bytes)
    spark.catalog.refreshByPath(path)
    val plan = EmbeddingCsv.read(spark, path)
    val samePath = cached.exists(_.queryExecution.analyzed
      .sameResult(plan.queryExecution.analyzed))
    if (samePath) {
      cached.foreach(_.unpersist(blocking = true))
      cached = None
    }
    val fresh = plan.cache()
    try fresh.count()
    catch { case t: Throwable => fresh.unpersist(); throw t }
    cached.foreach(_.unpersist())
    cached = Some(fresh)
    corpus = fresh
    this
  }

  /** B32 — persist in the reference CSV contract. */
  def save(path: String): Unit = EmbeddingCsv.write(corpus, path)

  /** A6 — append one chunk, embedding computed with the engine embedder;
    * `document_id` is pinned to "user_added" exactly like `app.py:112`.
    * Lazy union — no table copy. */
  def add(chunkId: Long, text: String): this.type = {
    val row = Row(chunkId, "user_added", text, embedder.embed(text).toSeq)
    val newRow = spark.createDataFrame(
      java.util.List.of(row), VectorDb.schema)
    corpus = corpus.unionByName(newRow)
    this
  }

  /** A3→A4→A5 — the flagship query: embed the text, raw-dot score every
    * chunk (NOT cosine — reference semantics, `app.py:45`), top-k with
    * deterministic tie-break. Returns (chunk_id, chunk_text, sim). */
  def search(query: String, topK: Int = 5): DataFrame = {
    require(query != null && query.nonEmpty, "empty query (A14 guard, app.py:95)")
    val q = embedder.embed(query).map(_.toDouble).toSeq
    Search.topK(corpus, "vector_embedding", "chunk_id", q, topK)
      .select(col("chunk_id"), col("chunk_text"), col("sim"))
  }

  /** A11 — results with the reference's 4-decimal display format. */
  def searchFormatted(query: String, topK: Int = 5): DataFrame =
    search(query, topK)
      .withColumn("sim", format_string("%.4f", col("sim")))
}

object VectorDb {
  /** A10 — the canonical 4-column schema (SURVEY.md §1.1). */
  val schema: StructType = StructType(Seq(
    StructField("chunk_id", LongType),
    StructField("document_id", StringType),
    StructField("chunk_text", StringType),
    StructField("vector_embedding", ArrayType(FloatType))))

  def emptyCorpus(spark: SparkSession): DataFrame =
    spark.createDataFrame(java.util.List.of[Row](), schema)

  /** A13 — open a predefined file if present, else start empty
    * (`app.py:66-73`). */
  def open(spark: SparkSession, predefinedPath: Option[String] = None): VectorDb = {
    val db = new VectorDb(spark)
    predefinedPath.filter { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      // resolve the FS from the path itself — the session's default FS
      // may be a different scheme (hdfs vs s3a vs file)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
    }.foreach(db.load)
    db
  }
}
