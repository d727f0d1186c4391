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

  test("extraStores legs: media-pair erasure forgets the hash too, so re-consented content re-admits") {
    val tmp = Files.createTempDirectory("graft-forgetmedia")
    val payloads = s"$tmp/payloads"; val index = s"$tmp/index"
    val grid = Multimodal.syntheticGridMedia(spark, nGroups = 4, perGroup = 5)
      .collect()
    val reps = spark.createDataset(grid.filter(_.media_id % 5 == 0).toSeq)
    VersionedCorpus.append(reps.toDF(), payloads)
    assert(Multimodal.reconcileMediaIndex(spark, payloads, index) === 4L)
    // erase group 0's rep (id 0) from BOTH stores in one composed call
    val removed = Forget.forget(spark, Seq(0L).toDF("media_id"),
      extraStores = Seq(payloads -> "media_id", index -> "media_id"))
    assert(removed === Map(payloads -> 1L, index -> 1L))
    assert(VersionedCorpus.snapshot(spark, payloads)
      .filter(col("media_id") === 0L).count() === 0L)
    val idx = VersionedCorpus.snapshot(spark, index)
    assert(idx.filter(col("media_id") === 0L).count() === 0L)
    // the dedup memory is gone with the hash: a brightness-shifted
    // re-submission of the erased content is ADMITTED again, while a
    // shift of a RETAINED group is still rejected
    val resubmit = spark.createDataset(Seq(
      grid.find(_.media_id === 1L).get.copy(media_id = 700L),  // group 0 (erased)
      grid.find(_.media_id === 6L).get.copy(media_id = 701L))) // group 1 (retained)
    val (admitted, _) = Multimodal.admitMediaPerceptual(resubmit, idx)
    assert(admitted.select(col("media_id")).collect()
      .map(_.getLong(0)).toSet === Set(700L))
    // double-forget re-tombstones the requested keys (the store-leg
    // count contract: keys requested, not live rows) and stays a
    // read-time no-op — the snapshots are unchanged
    val again = Forget.forget(spark, Seq(0L).toDF("media_id"),
      extraStores = Seq(payloads -> "media_id", index -> "media_id"))
    assert(again === Map(payloads -> 1L, index -> 1L))
    assert(VersionedCorpus.snapshot(spark, payloads).count() === 3L)
    assert(VersionedCorpus.snapshot(spark, index).count() === 3L)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }
}
