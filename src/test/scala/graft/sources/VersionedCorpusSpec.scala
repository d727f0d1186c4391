package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class VersionedCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-vcspec").toString + "/corpus"

  private def docs(ids: Range, tag: String) =
    ids.map(i => (i.toLong, s"$tag text number $i", "en"))
      .toDF("doc_id", "text", "lang")

  test("append + snapshot round-trips content; manifests carry row counts") {
    val root = freshRoot()
    val g0 = VersionedCorpus.append(docs(0 until 10, "a"), root)
    val g1 = VersionedCorpus.append(docs(10 until 25, "b"), root)
    assert(g0 === 0L && g1 === 1L)
    assert(VersionedCorpus.commits(root).map(c => (c.gen, c.rows, c.base))
      === Seq((0L, 10L, false), (1L, 15L, false)))
    val snap = VersionedCorpus.snapshot(spark, root)
    assert(snap.count() === 25L)
    assert(snap.agg(sum("doc_id")).as[Long].head === (0L until 25L).sum)
  }

  test("time travel: asOf sees exactly the commits <= asOf") {
    val root = freshRoot()
    val g0 = VersionedCorpus.append(docs(0 until 5, "a"), root)
    VersionedCorpus.append(docs(5 until 9, "b"), root)
    assert(VersionedCorpus.snapshot(spark, root, g0).count() === 5L)
    assert(VersionedCorpus.snapshot(spark, root).count() === 9L)
    // before the first commit is an explicit error, not an empty frame
    intercept[IllegalArgumentException] {
      VersionedCorpus.snapshot(spark, root, -1L)
    }
  }

  test("empty appends commit nothing") {
    val root = freshRoot()
    VersionedCorpus.append(docs(0 until 3, "a"), root)
    val g = VersionedCorpus.append(
      docs(0 until 3, "a").filter(col("doc_id") < 0), root)
    assert(g === -1L)
    assert(VersionedCorpus.commits(root).size === 1)
    assert(VersionedCorpus.snapshot(spark, root).count() === 3L)
  }

  test("a crashed append (data dir, no manifest) is invisible and its id is never reused") {
    val root = freshRoot()
    VersionedCorpus.append(docs(0 until 4, "a"), root)
    // simulate a writer that died between the data write and the commit
    docs(100 until 105, "orphan").write.parquet(s"$root/gen=7")
    assert(VersionedCorpus.snapshot(spark, root).count() === 4L)
    // the next append must skip PAST the orphan directory, not reuse it
    val g = VersionedCorpus.append(docs(4 until 6, "b"), root)
    assert(g === 8L)
    val snap = VersionedCorpus.snapshot(spark, root)
    assert(snap.count() === 6L)
    assert(!snap.select("text").as[String].collect().exists(_.contains("orphan")))
  }

  test("compact is content-neutral and preserves time travel; vacuum drops only superseded data") {
    val root = freshRoot()
    val g0 = VersionedCorpus.append(docs(0 until 6, "a"), root)
    VersionedCorpus.append(docs(6 until 10, "b"), root)
    val base = VersionedCorpus.compact(spark, root)
    VersionedCorpus.append(docs(10 until 12, "c"), root)

    assert(VersionedCorpus.commits(root).filter(_.base).map(_.gen) === Seq(base))
    // latest = base + post-base appends, exactly once each
    val latest = VersionedCorpus.snapshot(spark, root)
    assert(latest.count() === 12L)
    assert(latest.select("doc_id").as[Long].collect().sorted
      === (0L until 12L).toArray)
    // history BEFORE the base is still readable (compaction != vacuum)
    assert(VersionedCorpus.snapshot(spark, root, g0).count() === 6L)

    VersionedCorpus.vacuum(root)
    // latest unchanged; pre-base time travel now fails loudly
    assert(VersionedCorpus.snapshot(spark, root).count() === 12L)
    val ex = intercept[IllegalArgumentException] {
      VersionedCorpus.snapshot(spark, root, g0)
    }
    assert(ex.getMessage.contains("vacuum"))
  }

  test("a mis-shaped append is refused at the write, not discovered at a later snapshot") {
    val root = freshRoot()
    VersionedCorpus.append(docs(0 until 3, "a"), root)
    // wrong column name
    val renamed = docs(3 until 5, "b").withColumnRenamed("lang", "language")
    val ex = intercept[IllegalArgumentException] {
      VersionedCorpus.append(renamed, root)
    }
    assert(ex.getMessage.contains("pinned schema"))
    // wrong type
    val retyped = docs(3 until 5, "b")
      .withColumn("doc_id", col("doc_id").cast("int"))
    intercept[IllegalArgumentException] {
      VersionedCorpus.append(retyped, root)
    }
    // the refusals committed nothing and the store still reads cleanly
    assert(VersionedCorpus.commits(root).size === 1)
    assert(VersionedCorpus.snapshot(spark, root).count() === 3L)
    // nullability alone is NOT a divergence (parquet round-trips flip it)
    val g = VersionedCorpus.append(
      docs(3 until 5, "b").withColumn("lang", lit("en")), root)
    assert(g === 1L)
  }

  test("maybeCompact bounds the generation tail; with vacuum, live data dirs stay bounded") {
    val root = freshRoot()
    def liveDataDirs: Int = {
      val f = new java.io.File(root)
      if (!f.isDirectory) 0
      else f.listFiles.count(_.getName.startsWith("gen="))
    }
    var ids = 0
    for (_ <- 1 to 9) {
      VersionedCorpus.append(docs(ids until ids + 3, "b"), root)
      VersionedCorpus.maybeCompact(spark, root, every = 3, vacuumAfter = true)
      ids += 3
      // tail of non-base commits never exceeds the valve setting, and
      // vacuumed data dirs never pile up (tail + one base at most)
      val tail = VersionedCorpus.commits(root).reverse.takeWhile(!_.base).size
      assert(tail < 3)
      assert(liveDataDirs <= 4, s"$liveDataDirs live dirs")
    }
    // compaction + vacuum never lost or duplicated a row
    val snap = VersionedCorpus.snapshot(spark, root)
    assert(snap.count() === 27L)
    assert(snap.select("doc_id").as[Long].collect().sorted
      === (0L until 27L).toArray)
  }

  test("durable admission replay is idempotent: re-admitting a committed batch appends nothing") {
    val root = freshRoot()
    VersionedCorpus.append(docs(0 until 20, "corpus"), root)
    val incoming = docs(20 until 30, "fresh")
      .union(docs(0 until 3, "corpus")) // exact dups of the corpus
    def admitOnce(): Long = {
      val admitted = graft.operators.Dedup.admitIncoming(
        incoming,
        VersionedCorpus.snapshot(spark, root).select("doc_id", "text"),
        "doc_id", "text")
      VersionedCorpus.append(admitted, root)
    }
    val g1 = admitOnce()
    assert(g1 > 0L)
    assert(spark.read.parquet(s"$root/gen=$g1").count() === 10L)
    // failure-replay of the same batch: everything it admitted is now in
    // the snapshot, so the exact tier rejects all of it -> no commit
    assert(admitOnce() === -1L)
    assert(VersionedCorpus.commits(root).map(_.gen) === Seq(0L, g1))
  }

  test("declared incr_admit_durable row-matches the in-memory incr_admit_seq replay") {
    val durable = graft.Queries.all("incr_admit_durable")
      .build(spark, TestSpark.sf0001).collect().toSeq
    val inMem = graft.Queries.all("incr_admit_seq")
      .build(spark, TestSpark.sf0001).collect().toSeq
    assert(durable === inMem)
  }
}
