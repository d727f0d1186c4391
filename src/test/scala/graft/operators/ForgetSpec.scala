package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.sources.VersionedCorpus

/** The composed right-to-be-forgotten call: every artifact forgets the
  * same ids, double-forget is a no-op, and the apply variant leaves no
  * tombstone machinery behind. */
class ForgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("forget tombstones all three artifacts; idempotent; forgetAndApply erases physically") {
    val tmp = Files.createTempDirectory("graft-forgetspec")
    val corpus = s"$tmp/corpus"; val tix = s"$tmp/tix"; val vix = s"$tmp/vix"
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    VersionedCorpus.append(docs, corpus)
    VersionedCorpus.pinKey(corpus, "doc_id")
    TextIndex.build(docs, "doc_id", "text", tix, shards = 8)
    val (assign, cents) = IvfIndex.build(emb, "vec_id", "embedding",
      k = 4, iters = 2)
    IvfIndex.writePartitioned(emb, "vec_id", assign, vix)
    val ids = spark.range(40L, 90L).select(col("id").as("doc_id"))

    val removed = Forget.forget(spark, ids,
      corpusRoot = Some(corpus), textIndexDir = Some(tix),
      vectorIndexPath = Some(vix))
    assert(removed === Map("corpus" -> 50L, "text_index" -> 50L,
      "vector_index" -> 50L))
    // every surface excludes the slab
    assert(VersionedCorpus.snapshot(spark, corpus)
      .filter(col("doc_id").between(40, 89)).count() === 0L)
    assert(TextIndex.bm25(spark, tix, Seq("data"))
      .filter(col("doc_id").between(40, 89)).count() === 0L)
    assert(IvfIndex.probePartitioned(spark, vix, "vec_id", "embedding",
        cents, graft.QueryVectors.q1, k = 500, nprobe = 4)
      .filter(col("vec_id").between(40, 89)).count() === 0L)
    // double forget: corpus re-tombstones the keys (a no-op at read
    // time), the indexes report nothing left to remove
    val again = Forget.forget(spark, ids,
      corpusRoot = Some(corpus), textIndexDir = Some(tix),
      vectorIndexPath = Some(vix))
    assert(again("text_index") === 0L)
    assert(VersionedCorpus.snapshot(spark, corpus).count() === 450L)

    // the apply variant leaves no merge machinery behind
    Forget.forgetAndApply(spark,
      spark.range(0L, 10L).select(col("id").as("doc_id")),
      corpusRoot = Some(corpus), textIndexDir = Some(tix),
      vectorIndexPath = Some(vix))
    assert(VersionedCorpus.snapshot(spark, corpus).count() === 440L)
    assert(!new java.io.File(s"$vix/_tombstones").exists())
    val liveTix = new java.io.File(tix).list().filter(_.startsWith("batch="))
    assert(liveTix.length === 1, liveTix.toSeq)
    assert(TextIndex.bm25(spark, tix, Seq("data"))
      .filter(col("doc_id") < 10).count() === 0L)
    assert(spark.read.parquet(vix).filter(col("vec_id") < 10).count() === 0L)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }
}
