package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable VERSIONED corpus store — generation-manifest parquet, the
  * minimal log-structured table the incremental-ingestion loop needs to
  * survive restarts (the reference keeps its whole corpus in process
  * RAM and loses inserts on rerun, `app.py:65-73,118`; the in-memory
  * evolving corpus in [[graft.streaming.Streams]] is explicitly
  * single-start — this is its on-disk completion).
  *
  * Layout under one root directory:
  * {{{
  *   <root>/gen=<N>/part-*.parquet     data files, written FIRST
  *   <root>/_manifest/<N>.json         commit record, written LAST
  * }}}
  *
  * The manifest write is the commit point: readers resolve a snapshot
  * from `_manifest/` alone and read exactly the committed generation
  * directories. A writer that dies after the data write but before the
  * manifest leaves an orphan `gen=` directory no reader ever sees, and
  * the next append skips past orphan ids so the directory is never
  * reused ([[nextGen]] takes the max over committed AND on-disk ids).
  *
  * Why this scales where directory listing does not: a snapshot read
  * lists `_manifest/` — O(generations) driver-side records, each a few
  * bytes — and hands Spark the exact data paths; the 100 TB of parquet
  * underneath is never enumerated to answer "what is the table now".
  * On an object store the single-manifest PUT is atomic, which is the
  * same single-small-file commit discipline Delta/Iceberg use.
  *
  * History semantics (log-structured, Delta-like):
  *   - [[append]] adds a generation; [[snapshot]] with `asOf` unions
  *     committed generations `<= asOf` — time travel to any commit;
  *   - [[compact]] rewrites the current snapshot as ONE new `base`
  *     generation. Compaction is content-neutral and does NOT drop
  *     history: earlier generations stay readable until [[vacuum]];
  *   - [[vacuum]] deletes data superseded by the newest base
  *     generation. Only after vacuum does `asOf` before that base
  *     fail (with an explicit error, never a silent partial read).
  *
  * Single-writer contract: appends are not coordinated; the ingestion
  * loop that owns the directory is the one writer (the micro-batch
  * sequencing Structured Streaming already guarantees). Readers are
  * unrestricted.
  */
object VersionedCorpus {

  /** One committed generation, as recorded in its manifest. */
  final case class Commit(gen: Long, rows: Long, base: Boolean)

  private def manifestDir(root: String) =
    java.nio.file.Paths.get(root, "_manifest")
  private def dataDir(root: String, gen: Long) =
    java.nio.file.Paths.get(root, s"gen=$gen")

  /** All committed generations, ascending. Driver-side: one listing of
    * `_manifest/`, a few bytes per generation. */
  def commits(root: String): Seq[Commit] = {
    val dir = manifestDir(root)
    if (!java.nio.file.Files.isDirectory(dir)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[Commit]()
    val stream = java.nio.file.Files.list(dir)
    try {
      stream.forEach { p =>
        val name = p.getFileName.toString
        // commit records are strictly <gen>.json; _schema.json and any
        // in-flight .tmp files are not commits
        if (name.matches("\\d+\\.json")) {
          val s = new String(
            java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8)
          // fixed single-line shape written by us; no JSON lib needed
          def field(k: String): String = {
            val m = (s""""$k":""" + """\s*([^,}\s]+)""").r
              .findFirstMatchIn(s)
            m.map(_.group(1)).getOrElse(
              sys.error(s"malformed manifest $p: missing $k"))
          }
          out += Commit(field("gen").toLong, field("rows").toLong,
            field("base").toBoolean)
        }
      }
    } finally stream.close()
    out.sortBy(_.gen).toSeq
  }

  /** Newest committed generation id, if any. */
  def latest(root: String): Option[Long] = commits(root).lastOption.map(_.gen)

  /** Next safe generation id: past every COMMITTED id and every on-disk
    * `gen=` directory, so an orphan directory from a crashed append is
    * never written into again. */
  private def nextGen(root: String): Long = {
    val committed = latest(root).getOrElse(-1L)
    val rootPath = java.nio.file.Paths.get(root)
    val onDisk =
      if (!java.nio.file.Files.isDirectory(rootPath)) -1L
      else {
        val stream = java.nio.file.Files.list(rootPath)
        try {
          var mx = -1L
          stream.forEach { p =>
            val n = p.getFileName.toString
            if (n.startsWith("gen="))
              scala.util.Try(n.stripPrefix("gen=").toLong)
                .foreach(g => mx = math.max(mx, g))
          }
          mx
        } finally stream.close()
      }
    math.max(committed, onDisk) + 1L
  }

  /** The store's schema contract, pinned at the first commit: every
    * later append must carry the same column names and types (nullability
    * and metadata are ignored — parquet round-trips legitimately flip
    * them). Without this, one mis-shaped append poisons every later
    * snapshot read with a union-of-mismatched-schemas failure — better
    * to refuse at the write, naming the divergence. */
  private def schemaFile(root: String) =
    manifestDir(root).resolve("_schema.json")

  private def shape(s: org.apache.spark.sql.types.StructType)
      : Seq[(String, String)] =
    s.fields.toSeq.map(f => (f.name, f.dataType.sql))

  private def checkOrPinSchema(root: String,
                               s: org.apache.spark.sql.types.StructType): Unit = {
    val f = schemaFile(root)
    if (java.nio.file.Files.exists(f)) {
      val pinned = org.apache.spark.sql.types.DataType.fromJson(
        new String(java.nio.file.Files.readAllBytes(f),
          java.nio.charset.StandardCharsets.UTF_8))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      require(shape(pinned) == shape(s),
        s"append schema ${shape(s).mkString(", ")} does not match the " +
          s"store's pinned schema ${shape(pinned).mkString(", ")} under $root")
    } else {
      java.nio.file.Files.createDirectories(manifestDir(root))
      java.nio.file.Files.write(f,
        s.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  private def writeManifest(root: String, c: Commit): Unit = {
    val dir = manifestDir(root)
    java.nio.file.Files.createDirectories(dir)
    val body = s"""{"gen":${c.gen},"rows":${c.rows},"base":${c.base}}"""
    val tmp = dir.resolve(s".${c.gen}.json.tmp")
    java.nio.file.Files.write(tmp,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, dir.resolve(s"${c.gen}.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Append `df` as the next generation. Data is written before the
    * manifest commit; an empty frame commits nothing (no empty
    * generations in the log). Returns the committed generation id, or
    * -1 if `df` was empty. The count is one distributed pass; the
    * parquet write it gates is the real work, so this is not an extra
    * scan of anything large — and the row count lands in the manifest
    * where snapshot readers get it for free. */
  def append(df: DataFrame, root: String): Long = {
    checkOrPinSchema(root, df.schema)
    val gen = nextGen(root)
    val path = dataDir(root, gen)
    df.write.mode("overwrite").parquet(path.toString)
    val rows = df.sparkSession.read.parquet(path.toString).count()
    if (rows == 0L) {
      org.apache.commons.io.FileUtils.deleteDirectory(path.toFile)
      return -1L
    }
    writeManifest(root, Commit(gen, rows, base = false))
    gen
  }

  /** The table as of generation `asOf` (default: newest commit).
    *
    * Resolution from manifests only: take the newest BASE generation
    * `b <= asOf` (if any) plus every non-base generation in
    * `(b, asOf]`; with no base, every non-base `<= asOf`. Spark gets
    * the explicit path list — generation dirs outside the snapshot are
    * never listed, let alone read. */
  def snapshot(spark: SparkSession, root: String,
               asOf: Long = Long.MaxValue): DataFrame = {
    val all = commits(root)
    require(all.nonEmpty, s"no committed generations under $root")
    val visible = all.filter(_.gen <= asOf)
    require(visible.nonEmpty,
      s"asOf=$asOf predates the first commit (gen ${all.head.gen}) under $root")
    val baseGen = visible.filter(_.base).lastOption.map(_.gen)
    val wanted = baseGen match {
      case Some(b) => visible.filter(c => c.gen == b || (!c.base && c.gen > b))
      case None    => visible.filterNot(_.base)
    }
    val paths = wanted.map(c => dataDir(root, c.gen).toString)
    val missing = paths.filterNot(p =>
      java.nio.file.Files.isDirectory(java.nio.file.Paths.get(p)))
    require(missing.isEmpty,
      s"asOf=$asOf needs vacuumed generations: ${missing.mkString(", ")} " +
        "(history before the newest base generation was dropped by vacuum)")
    spark.read.parquet(paths: _*)
  }

  /** Rewrite the CURRENT snapshot as one new base generation.
    * Content-neutral (asserted by the oracle-checked round trip) and
    * history-preserving — earlier generations remain readable for time
    * travel until [[vacuum]]. Returns the base generation id. */
  def compact(spark: SparkSession, root: String): Long = {
    val gen = nextGen(root)
    val path = dataDir(root, gen)
    val snap = snapshot(spark, root)
    snap.write.mode("overwrite").parquet(path.toString)
    val rows = spark.read.parquet(path.toString).count()
    writeManifest(root, Commit(gen, rows, base = true))
    gen
  }

  /** [[compact]] when the tail of small generations has grown past
    * `every` commits since the last base (or since the start) — the
    * maintenance valve an unattended ingestion loop needs: without it a
    * long-lived stream accretes one small parquet directory per batch,
    * and at scale the snapshot read fans out over thousands of tiny
    * files. With `vacuumAfter` the superseded tail is reclaimed too
    * (trading pre-base time travel for space, the standard retention
    * decision). No-op (`None`) while the tail is short. */
  def maybeCompact(spark: SparkSession, root: String, every: Int,
                   vacuumAfter: Boolean = false): Option[Long] = {
    if (every <= 0) return None
    val all = commits(root)
    val sinceBase = all.reverse.takeWhile(!_.base).size
    if (sinceBase < every) None
    else {
      val g = compact(spark, root)
      if (vacuumAfter) vacuum(root)
      Some(g)
    }
  }

  /** Delete generation data superseded by the NEWEST base generation
    * (everything older than it). After vacuum, [[snapshot]] with
    * `asOf` before that base fails explicitly. Manifests are kept, so
    * the log still records what existed; only data is reclaimed. No-op
    * when no base generation exists. */
  def vacuum(root: String): Unit = {
    val all = commits(root)
    all.filter(_.base).lastOption.foreach { b =>
      all.filter(_.gen < b.gen).foreach { c =>
        val p = dataDir(root, c.gen)
        if (java.nio.file.Files.isDirectory(p))
          org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
      }
    }
  }
}
