package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Embedder

/** End-to-end test of the reference's four verbs through the facade:
  * load → search → append → search-again (SURVEY.md §3 lifecycles). */
class VectorDbSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCsv(): String = {
    val dir = Files.createTempDirectory("graft-vdb").toString + "/corpus"
    val e = Embedder.default
    val df = Seq(
      (1L, "docA", "spark engine query plan", e.embed("spark engine query plan")),
      (2L, "docA", "cats and dogs play outside", e.embed("cats and dogs play outside")),
      (3L, "docB", "fast vector search engine", e.embed("fast vector search engine"))
    ).toDF("chunk_id", "document_id", "chunk_text", "vector_embedding")
    graft.sources.EmbeddingCsv.write(df, dir)
    dir
  }

  test("open without a predefined file starts empty with a usable schema (A9/A10/A13)") {
    val db = VectorDb.open(spark, Some("/nonexistent/path.csv"))
    assert(db.isEmpty)
    assert(db.table.columns.toSeq ===
      Seq("chunk_id", "document_id", "chunk_text", "vector_embedding"))
  }

  test("load → search → add → search again (the full reference lifecycle)") {
    val db = new VectorDb(spark).load(freshCsv())
    assert(db.count === 3)

    // same-token query embeds identically → its source chunk must win
    val top = db.search("spark engine query plan", 1)
      .select("chunk_id").as[Long].head
    assert(top === 1L)

    // append (A6) — document_id pinned like app.py:112, then findable
    db.add(99L, "totally novel appended chunk")
    assert(db.count === 4)
    assert(db.table.filter($"chunk_id" === 99L)
      .select("document_id").as[String].head === "user_added")
    val top2 = db.search("totally novel appended chunk", 1)
      .select("chunk_id").as[Long].head
    assert(top2 === 99L)
  }

  test("load replaces, not merges (A7)") {
    val db = new VectorDb(spark).load(freshCsv())
    db.add(50L, "extra")
    db.load(freshCsv())
    assert(db.count === 3)
  }

  test("search does not mutate the corpus and rejects empty queries (A14)") {
    val db = new VectorDb(spark).load(freshCsv())
    db.search("anything").collect()
    assert(db.table.columns.length === 4, "no similarity column may leak into the store")
    intercept[IllegalArgumentException](db.search(""))
  }

  test("formatted search renders 4-decimal strings (A11)") {
    val db = new VectorDb(spark).load(freshCsv())
    val s = db.searchFormatted("spark engine", 1).select("sim").as[String].head
    assert(s.matches("-?\\d+\\.\\d{4}"))
  }

  test("save round-trips through the CSV contract (B32)") {
    val db = new VectorDb(spark).load(freshCsv())
    val out = Files.createTempDirectory("graft-vdb-out").toString + "/saved"
    db.save(out)
    val back = new VectorDb(spark).load(out)
    assert(back.count === 3)
    assert(back.search("fast vector search engine", 1)
      .select("chunk_id").as[Long].head === 3L)
  }

  test("same-path reload re-reads the changed file, not the stale cache") {
    val e = Embedder.default
    val dir = Files.createTempDirectory("graft-vdb-reload").toString + "/corpus"
    val v1 = Seq((1L, "docA", "first version", e.embed("first version")))
      .toDF("chunk_id", "document_id", "chunk_text", "vector_embedding")
    graft.sources.EmbeddingCsv.write(v1, dir)
    val db = new VectorDb(spark).load(dir)
    assert(db.count === 1)
    // replace the file at the SAME path — the r14-advice hazard: the
    // plan cache matches by plan, so without the unpersist-first path
    // the reload validated and served the v1 rows
    val v2 = Seq(
      (10L, "docB", "second version row one", e.embed("second version row one")),
      (11L, "docB", "second version row two", e.embed("second version row two"))
    ).toDF("chunk_id", "document_id", "chunk_text", "vector_embedding")
    graft.sources.EmbeddingCsv.write(v2, dir)
    db.load(dir)
    assert(db.count === 2, "reload must serve the new file's rows")
    assert(db.table.select("chunk_id").as[Long].collect().sorted
      === Array(10L, 11L))
  }
}
