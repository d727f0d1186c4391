package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Incremental materialized-view maintenance off the change feed:
  * view ≡ full-recompute at every refresh point, groups move / empty /
  * resurrect correctly, untouched groups are never rewritten (asserted
  * through the view store's OWN change feed), and a crashed refresh
  * replays idempotently. */
class IncrementalViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(ids: Seq[Int], tag: String) =
    ids.map(i => (i.toLong, i.toLong % 5, s"$tag text $i"))
      .toDF("doc_id", "bucket", "text")

  private def aggs = Seq(count(lit(1)).as("n"),
    sum(length(col("text")).cast("long")).as("chars"))

  private def fullRecompute(src: String) =
    VersionedCorpus.snapshot(spark, src)
      .groupBy(col("bucket")).agg(aggs.head, aggs.tail: _*)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  private def viewRows(view: String) =
    IncrementalView.read(spark, view)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("view ≡ full aggregate across moves, emptied groups, resurrections; untouched groups never rewritten; crash replay converges") {
    val tmp = Files.createTempDirectory("graft-ivspec")
    val src = s"$tmp/src"; val view = s"$tmp/view"
    val cursor = s"$tmp/cursor.txt"
    def refresh() = IncrementalView.refresh(spark, src, view, cursor,
      "doc_id", "bucket", aggs)

    // wave 1: first build = one full aggregate
    VersionedCorpus.append(rows(0 until 50, "a"), src)
    VersionedCorpus.pinKey(src, "doc_id")
    val c1 = refresh()
    assert(viewRows(view) === fullRecompute(src))

    // wave 2: a row MOVES groups (doc 3: bucket 3 → 7), a row changes
    // in place (doc 8), group 2 is emptied outright, two appends land
    // in bucket 0 only
    VersionedCorpus.upsert(
      Seq((3L, 7L, "moved text 3")).toDF("doc_id", "bucket", "text"),
      src, "doc_id")
    VersionedCorpus.upsert(
      Seq((8L, 3L, "revised text 8 longer")).toDF("doc_id", "bucket", "text"),
      src, "doc_id")
    VersionedCorpus.delete(
      rows((0 until 50).filter(_ % 5 == 2), "x").select("doc_id"),
      src, "doc_id")
    VersionedCorpus.append(rows(Seq(100, 110), "b"), src)
    val viewGenBefore = VersionedCorpus.latest(view).get
    val c2 = refresh()
    assert(c2 > c1)
    assert(viewRows(view) === fullRecompute(src))
    assert(!viewRows(view).exists(_._1 == 2L), "emptied group must vanish")
    assert(viewRows(view).exists(_._1 == 7L), "moved-to group must appear")
    // untouched groups (1, 4) were never rewritten: the view's own
    // change feed for this refresh carries only the dirty buckets
    val viewFeed = VersionedCorpus
      .changesBetween(spark, view, viewGenBefore)
      .select("bucket").as[Long].collect().toSet
    assert(viewFeed === Set(0L, 2L, 3L, 7L), s"dirty set was $viewFeed")

    // wave 3: the moved-to group empties again (delete doc 3), and an
    // append resurrects group 2
    VersionedCorpus.delete(Seq(3L).toDF("doc_id"), src, "doc_id")
    VersionedCorpus.append(rows(Seq(7), "back"), src)
    val c3 = refresh()
    assert(c3 > c2)
    assert(viewRows(view) === fullRecompute(src))
    assert(!viewRows(view).exists(_._1 == 7L))
    assert(viewRows(view).exists(_._1 == 2L))

    // crashed refresh: apply wave 4, lose the cursor write, replay
    VersionedCorpus.upsert(
      Seq((100L, 0L, "final text 100")).toDF("doc_id", "bucket", "text"),
      src, "doc_id")
    refresh()
    VersionedCorpus.writeCursor(cursor, c3) // simulate the crash
    val c5 = refresh()
    assert(c5 > c3)
    assert(viewRows(view) === fullRecompute(src))

    // no-op refresh: cursor stable, no commits land on the view
    val nView = VersionedCorpus.commits(view).size
    assert(refresh() === c5)
    assert(VersionedCorpus.commits(view).size === nView)
  }

  test("join formulation (fuseLimit = 0) ≡ fused driver path on the same waves") {
    // the same move/empty/resurrect lifecycle as the main test, forced
    // through the large-window join formulation — proving the two
    // refresh paths compute the identical view
    val tmp = Files.createTempDirectory("graft-ivspec3")
    val src = s"$tmp/src"; val view = s"$tmp/view"
    val cursor = s"$tmp/cursor.txt"
    def refresh() = IncrementalView.refresh(spark, src, view, cursor,
      "doc_id", "bucket", aggs, fuseLimit = 0)
    VersionedCorpus.append(rows(0 until 50, "a"), src)
    VersionedCorpus.pinKey(src, "doc_id")
    refresh()
    assert(viewRows(view) === fullRecompute(src))
    VersionedCorpus.upsert(
      Seq((3L, 7L, "moved text 3")).toDF("doc_id", "bucket", "text"),
      src, "doc_id")
    VersionedCorpus.delete(
      rows((0 until 50).filter(_ % 5 == 2), "x").select("doc_id"),
      src, "doc_id")
    VersionedCorpus.append(rows(Seq(100, 110), "b"), src)
    refresh()
    assert(viewRows(view) === fullRecompute(src))
    assert(!viewRows(view).exists(_._1 == 2L), "emptied group must vanish")
    VersionedCorpus.delete(Seq(3L).toDF("doc_id"), src, "doc_id")
    VersionedCorpus.append(rows(Seq(7), "back"), src)
    refresh()
    assert(viewRows(view) === fullRecompute(src))
    assert(viewRows(view).exists(_._1 == 2L))
  }

  test("groupFromKey (key-derived groups) ≡ full recompute across revisions, deletes, inserts — with zero preimage read") {
    // bucket = doc_id % 5 is a pure function of the key, so the refresh
    // may derive every mutated key's old group locally; upserts revise
    // payloads in place (never move groups — the contract), deletes
    // empty a group, appends resurrect it
    val tmp = Files.createTempDirectory("graft-ivspec4")
    val src = s"$tmp/src"; val view = s"$tmp/view"
    val cursor = s"$tmp/cursor.txt"
    def refresh() = IncrementalView.refresh(spark, src, view, cursor,
      "doc_id", "bucket", aggs,
      groupFromKey = Some(col("doc_id") % 5))
    VersionedCorpus.append(rows(0 until 50, "a"), src)
    VersionedCorpus.pinKey(src, "doc_id")
    refresh()
    assert(viewRows(view) === fullRecompute(src))
    // revise two docs in place; empty bucket 2; append into bucket 0
    VersionedCorpus.upsert(
      Seq((8L, 3L, "revised text 8 longer"),
          (14L, 4L, "rev 14")).toDF("doc_id", "bucket", "text"),
      src, "doc_id")
    VersionedCorpus.delete(
      rows((0 until 50).filter(_ % 5 == 2), "x").select("doc_id"),
      src, "doc_id")
    VersionedCorpus.append(rows(Seq(100, 110), "b"), src)
    refresh()
    assert(viewRows(view) === fullRecompute(src))
    assert(!viewRows(view).exists(_._1 == 2L), "emptied group must vanish")
    // resurrect bucket 2, delete one more doc from bucket 4
    VersionedCorpus.append(rows(Seq(7), "back"), src)
    VersionedCorpus.delete(Seq(14L).toDF("doc_id"), src, "doc_id")
    refresh()
    assert(viewRows(view) === fullRecompute(src))
    assert(viewRows(view).exists(_._1 == 2L))
  }

  test("source compaction between refreshes is invisible to the view") {
    val tmp = Files.createTempDirectory("graft-ivspec2")
    val src = s"$tmp/src"; val view = s"$tmp/view"
    val cursor = s"$tmp/cursor.txt"
    def refresh() = IncrementalView.refresh(spark, src, view, cursor,
      "doc_id", "bucket", aggs)
    VersionedCorpus.append(rows(0 until 30, "a"), src)
    VersionedCorpus.pinKey(src, "doc_id")
    refresh()
    VersionedCorpus.upsert(
      Seq((5L, 1L, "rev")).toDF("doc_id", "bucket", "text"), src, "doc_id")
    VersionedCorpus.compact(spark, src) // no change rows, cursor must pass it
    VersionedCorpus.append(rows(Seq(40), "b"), src)
    refresh()
    assert(viewRows(view) === fullRecompute(src))
  }
}
