package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import VectorFunctions._

class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eps = 1e-9

  private def eval(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double")).head.getDouble(0)

  private val a = vecLit(Seq(1.0, 2.0, 3.0))
  private val b = vecLit(Seq(-1.0, 0.5, 2.0))

  test("dot: hand-computed") {
    assert(math.abs(eval(dot(a, b)) - (1 * -1 + 2 * 0.5 + 3 * 2.0)) < eps)
  }

  test("dot: symmetric") {
    assert(eval(dot(a, b)) === eval(dot(b, a)))
  }

  test("l2Norm: hand-computed") {
    assert(math.abs(eval(l2Norm(a)) - math.sqrt(14.0)) < eps)
  }

  test("cosine: identical vectors = 1") {
    assert(math.abs(eval(cosine(a, a)) - 1.0) < eps)
  }

  test("cosine: orthogonal vectors = 0") {
    val x = vecLit(Seq(1.0, 0.0))
    val y = vecLit(Seq(0.0, 3.0))
    assert(math.abs(eval(cosine(x, y))) < eps)
  }

  test("l2Dist: hand-computed") {
    val expected = math.sqrt(4.0 + 2.25 + 1.0)
    assert(math.abs(eval(l2Dist(a, b)) - expected) < eps)
  }

  test("l2Dist: zero to itself") {
    assert(eval(l2Dist(a, a)) === 0.0)
  }

  test("normalize: unit norm") {
    assert(math.abs(eval(l2Norm(normalize(a))) - 1.0) < eps)
  }

  test("native dot ≡ higher-order-function dot, bit-for-bit, on fixture data") {
    val emb = graft.Tables.load(spark, graft.TestSpark.sf0001, "embeddings")
    val q = vecLit(graft.QueryVectors.q1)
    val mismatches = emb.select(
      dot(col("embedding"), q).as("native"),
      dotHof(col("embedding"), q).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches === 0L)
  }

  test("native l2Dist ≡ higher-order-function l2Dist, bit-for-bit, on fixture data") {
    val emb = graft.Tables.load(spark, graft.TestSpark.sf0001, "embeddings")
    val q = vecLit(graft.QueryVectors.q1)
    val mismatches = emb.select(
      l2Dist(col("embedding"), q).as("native"),
      l2DistHof(col("embedding"), q).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches === 0L)
  }

  test("mismatched-length arrays yield NULL, native and HOF alike") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val r = df.select(
      dot(col("a"), col("b")).as("d"), dotHof(col("a"), col("b")).as("dh"),
      l2Dist(col("a"), col("b")).as("l"), l2DistHof(col("a"), col("b")).as("lh"))
      .head
    assert((0 until 4).forall(r.isNullAt),
      s"ragged pair must score NULL everywhere, got $r")
  }

  test("graft_l2 is callable from SQL once extensions are installed") {
    graft.GraftExtensions.install(spark)
    val got = spark.sql(
      "SELECT graft_l2(array(1.0f, 2.0f), array(cast(4.0 as double), cast(6.0 as double))) AS d")
      .head.getDouble(0)
    assert(got === 5.0)
  }

  test("graft_dot is callable from SQL once extensions are installed") {
    graft.GraftExtensions.install(spark)
    val got = spark.sql(
      "SELECT graft_dot(array(1.0f, 2.0f), array(cast(3.0 as double), cast(4.0 as double))) AS d")
      .head.getDouble(0)
    assert(got === 11.0)
  }

  test("dot works on FloatType arrays (fixture schema)") {
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    val got = df.select(dot(col("v"), vecLit(Seq(3.0, 4.0))).as("d"))
      .head.getDouble(0)
    assert(math.abs(got - 11.0) < eps)
  }
}
