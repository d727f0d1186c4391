package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class EmbedderSpec extends AnyFunSuite {
  private val e = new HashingEmbedder(64)

  test("fixed dimension") {
    assert(e.embed("hello world").length === 64)
  }

  test("deterministic") {
    assert(e.embed("spark engine").toSeq === e.embed("spark engine").toSeq)
  }

  test("different texts give different vectors (overwhelmingly)") {
    assert(e.embed("alpha beta gamma").toSeq !== e.embed("delta epsilon").toSeq)
  }

  test("null and empty map to the zero vector") {
    assert(e.embed(null).toSeq === Seq.fill(64)(0f))
    assert(e.embed("").toSeq === Seq.fill(64)(0f))
    assert(e.embed("   ").toSeq === Seq.fill(64)(0f))
  }

  test("token order does not matter for bag-of-words hashing") {
    assert(e.embed("a b c").toSeq === e.embed("c b a").toSeq)
  }

  test("truncation: tokens beyond maxTokens are ignored (app.py:29 semantics)") {
    val small = new HashingEmbedder(8, maxTokens = 2)
    assert(small.embed("a b c d e").toSeq === small.embed("a b").toSeq)
  }

  test("mass equals token count in L1 (each token adds ±1 to one bucket)") {
    val v = e.embed("one two three four")
    assert(v.map(x => math.abs(x)).sum >= 1f) // signs may cancel within a bucket
    val single = e.embed("one")
    assert(single.map(x => math.abs(x)).sum === 1f)
  }

  test("embedAll contract: batch equals per-row embed elementwise") {
    val texts = Seq("alpha beta", "", null, "gamma delta epsilon", "alpha beta")
    val batched = e.embedAll(texts)
    assert(batched.map(_.toSeq) === texts.map(t => e.embed(t).toSeq))
  }

  test("embedPartitions: batched mapPartitions ≡ row-wise UDF on the fixture") {
    val spark = graft.TestSpark.spark
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.load(spark, graft.TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("text"))
    // batchSize 7 deliberately misaligns with partition sizes so the last
    // ragged batch of each partition is exercised
    val batched = Embedder.embedPartitions(docs, "text", "emb", e, batchSize = 7)
    assert(batched.columns.toSeq === Seq("doc_id", "text", "emb"))
    val viaUdf = docs.withColumn("emb", Embedder.embedCol(e)(col("text")))
    val got = batched.select("doc_id", "emb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val want = viaUdf.select("doc_id", "emb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(got.size === want.size)
    assert(got === want)
  }
}
