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
}
