package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Pluggable text embedder — the reference's only "type constructor"
  * (reference `app.py:27-37`: tokenize → DistilBERT → mean-pool, yielding
  * an UNNORMALIZED fixed-dim dense float vector).
  *
  * The engine keeps the *capability* behind this trait: any
  * `String => Array[Float]` of fixed dim. The default implementation is a
  * deterministic feature-hashing bag-of-words (no torch on the JVM — see
  * SURVEY.md §7.3 "Embedder parity"). A heavy-model variant would be a
  * per-executor lazy singleton (the standard Spark pattern mirroring the
  * reference's `@st.cache_resource` at `app.py:13-14`), documented but not
  * shipped here.
  *
  * Instances must be Serializable: they are closed over by executor-side
  * UDFs and shipped with the task closure — cheap, stateless objects, not
  * per-row allocations.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]

  /** Embed a whole batch in one call — the seam an accelerator-backed
    * model overrides to run one forward pass per batch instead of per
    * row (the default just loops). Contract: `embedAll(ts)(i) ==
    * embed(ts(i))` for every i — asserted for the hashing embedder in
    * EmbedderSpec, and required of any override so
    * [[Embedder.embedPartitions]] stays result-identical to the row-wise
    * UDF path. */
  def embedAll(texts: Seq[String]): Seq[Array[Float]] = texts.map(embed)
}

/** Deterministic feature-hashing embedder.
  *
  * Tokenizes on whitespace (mirroring the fixture corpus), hashes each
  * token with a portable 31-polynomial rolling hash (documented so it can
  * be re-expressed in SQL if an oracle ever needs it), and adds ±1 into
  * `hash mod dim` with a sign bit — the classic hashing trick. Like the
  * reference's embedder the output is intentionally NOT normalized
  * (`app.py:37` — no L2 normalization; SURVEY.md §1.2).
  *
  * Mirrors the reference's input truncation semantics (`app.py:29`,
  * `max_length=512`): at most `maxTokens` tokens contribute.
  */
final class HashingEmbedder(val dim: Int = 64, val maxTokens: Int = 512)
    extends Embedder {

  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    if (text == null) return v
    var i = 0
    var tok = 0
    val n = text.length
    while (i < n && tok < maxTokens) {
      // skip whitespace
      while (i < n && text.charAt(i) == ' ') i += 1
      if (i < n) {
        var h = 0
        while (i < n && text.charAt(i) != ' ') {
          h = h * 31 + text.charAt(i)
          i += 1
        }
        val bucket = java.lang.Math.floorMod(h, dim)
        val sign = if (java.lang.Math.floorMod(h >> 16, 2) == 0) 1f else -1f
        v(bucket) += sign
        tok += 1
      }
    }
    v
  }
}

object Embedder {
  /** Default engine embedder: 64-dim to match the `embeddings.parquet`
    * fixture dimension (FIXTURES.md §2). */
  val default: Embedder = new HashingEmbedder(64)

  /** ==Heavy-model variant (design sketch — not shipped: no inference
    * runtime in this environment)==
    *
    * The reference embeds with DistilBERT (`app.py:16-37`). On Spark the
    * equivalent is an ONNX-exported encoder behind this same trait, with
    * the session held as a PER-EXECUTOR lazy singleton — the JVM-wide
    * mirror of the reference's `@st.cache_resource` (`app.py:13-14`) —
    * so the model loads once per executor, never per task or per row:
    *
    * {{{
    * final class OnnxEmbedder(modelPath: String, val dim: Int)
    *     extends Embedder {
    *   // The instance itself is a cheap Serializable handle; the session
    *   // lives in a companion-object cache keyed by modelPath, created on
    *   // first use ON THE EXECUTOR. modelPath points at a cluster-visible
    *   // file (distributed via `SparkContext.addFile` or a shared store);
    *   // what ships in the task closure is the STRING, never the weights.
    *   def embed(text: String): Array[Float] = {
    *     val (env, session, tokenizer) = OnnxEmbedder.sessionFor(modelPath)
    *     val ids = tokenizer.encode(text, maxLen = 512)   // app.py:29
    *     val out = session.run(Map("input_ids" -> ids))   // one forward pass
    *     meanPool(out, ids.attentionMask)                 // app.py:33-37
    *   }
    * }
    * object OnnxEmbedder {
    *   // one entry per (executor JVM, model) — concurrent first-call races
    *   // collapse via computeIfAbsent; sessions are never serialized
    *   private val cache =
    *     new java.util.concurrent.ConcurrentHashMap[String, SessionBundle]
    *   private def sessionFor(path: String) =
    *     cache.computeIfAbsent(path, p => loadOnnxSession(p))
    * }
    * }}}
    *
    * Throughput shape: wrap with [[Embedder.asUdf]] for row-at-a-time, or
    * batch via `mapPartitions` grouping `batchSize` rows per forward pass
    * (the same per-partition-init pattern as
    * `graft.operators.Multimodal.decodeAll`) — batching is what keeps an
    * accelerator-backed session busy. Everything downstream (scoring,
    * top-k, IVF/LSH indexing) is embedder-agnostic: swapping this in
    * changes no plan shape, which is the point of the trait.
    */

  /** Scala UDF wrapping an embedder. The embedder is serialized into the
    * closure once per task, not per row. */
  def asUdf(e: Embedder): UserDefinedFunction =
    udf((s: String) => e.embed(s))

  def embedCol(e: Embedder)(text: Column): Column = asUdf(e)(text)

  /** Batched embedding over partitions — the throughput shape the
    * heavy-model scaladoc above promises: `mapPartitions` groups
    * `batchSize` rows per [[Embedder.embedAll]] call, so an
    * accelerator-backed override pays one forward pass per batch (the
    * embedder instance itself still initializes lazily per executor via
    * its companion cache — what ships in the closure is the cheap
    * Serializable handle). Appends `outCol` (`array<float>`) to every
    * row; result-identical to `withColumn(outCol, embedCol(e)(col))` by
    * the `embedAll` contract (asserted in EmbedderSpec).
    *
    * Plan note: `mapPartitions` is an opaque codegen boundary — columns
    * are not pruned through it, so project the input down to what the
    * output needs BEFORE calling (the per-partition batching is the
    * point here; the built-in-function path stays preferable for
    * anything expressible without a model). */
  def embedPartitions(df: org.apache.spark.sql.DataFrame, textCol: String,
                      outCol: String, e: Embedder,
                      batchSize: Int = 64): org.apache.spark.sql.DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add(outCol,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val embs = e.embedAll(batch.map(r =>
          if (r.isNullAt(idx)) null else r.getString(idx)))
        // a broken embedAll override that drops failed inputs would
        // otherwise truncate the zip below — silent row loss; enforce
        // the one-embedding-per-text contract loudly
        require(embs.length == batch.length,
          s"embedAll contract violation: ${batch.length} texts in, " +
            s"${embs.length} embeddings out")
        batch.iterator.zip(embs.iterator).map { case (r, v) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
