package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.functions.VectorFunctions._

/** Johnson–Lindenstrauss random projection: the deterministic ±1/√k
  * Rademacher matrix, the column-level projection, the distortion
  * guarantee on the real fixture embeddings, and the prefilter recall
  * of the reduce-then-refine search tier (`jl_search_rerank`). */
class JlProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 16
  private val d = 64
  private lazy val m = jlMatrix(k, d)

  test("matrix: shape, exact ±1/√k entries, deterministic, sign-balanced") {
    assert(m.length === k)
    assert(m.forall(_.length === d))
    assert(m.flatten.forall(v => v == 0.25 || v == -0.25))
    assert(jlMatrix(k, d) === m) // stateless regeneration
    // signs should be roughly balanced (a degenerate all-+ matrix
    // would still "project" but preserve nothing)
    val plus = m.flatten.count(_ > 0)
    assert(plus > 400 && plus < 624, s"sign balance off: $plus/1024")
  }

  test("project column ≡ driver-side matrix multiply, bit-exact") {
    val vecs = Seq.tabulate(20)(i =>
      (i.toLong, Array.tabulate(d)(j => ((i * 31 + j * 7) % 19 - 9) / 4.0f)))
    val df = vecs.toDF("id", "vec")
    val got = df.select(col("id"), project(col("vec"), m).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    vecs.foreach { case (id, v) =>
      val want = m.map(row =>
        row.zip(v).map { case (a, b) => a * b.toDouble }.sum)
      assert(got(id) === want, s"row $id")
    }
  }

  test("JL distortion: projected pairwise sq-distances concentrate around the originals on fixture embeddings") {
    val rows = Tables.load(spark, TestSpark.sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(48)
      .as[(Long, Seq[Float])].collect()
    def sq(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val orig = rows.map(_._2.map(_.toDouble).toIndexedSeq)
    val proj = orig.map(v => m.map(r =>
      r.zip(v).map { case (a, b) => a * b }.sum).toIndexedSeq)
    val ratios = for {
      i <- orig.indices; j <- (i + 1) until orig.length
      o = sq(orig(i), orig(j)) if o > 1e-9
    } yield sq(proj(i), proj(j)) / o
    assert(ratios.nonEmpty)
    val sorted = ratios.sorted
    val median = sorted(sorted.length / 2)
    // E[ratio] = 1 for a Rademacher JL map; k=16 gives loose but real
    // concentration — the median must sit near 1 and the bulk of pairs
    // within a factor of 2
    assert(median > 0.7 && median < 1.4, s"median distortion $median")
    val within2 = ratios.count(r => r > 0.5 && r < 2.0).toDouble / ratios.size
    assert(within2 > 0.8, s"only ${within2 * 100}%% of pairs within 2x")
  }

  test("prefilter recall: JL top-50 candidates retain most of the exact top-10") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val q = graft.QueryVectors.q1
    val exact10 = emb
      .select(col("vec_id"), dot(col("embedding"), vecLit(q)).as("sim"))
      .orderBy(desc("sim"), asc("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSet
    val pq = m.map(r => r.zip(q).map { case (a, b) => a * b }.sum)
    val projected = emb
      .select(col("vec_id"),
        dot(project(col("embedding"), m), vecLit(pq)).as("psim"))
      .persist()
    try {
      def recallAt(depth: Int): Double = {
        val cand = projected
          .orderBy(desc("psim"), asc("vec_id")).limit(depth)
          .select("vec_id").as[Long].collect().toSet
        exact10.intersect(cand).size / 10.0
      }
      // candidate depth is the quality dial of reduce-then-refine
      // (same shape as pq_recall): recall must be monotone in depth
      // and real at the declared query's r=50. Measured on this
      // fixture: 0.5 @ 50, 0.7 @ 200 — a 64→16 raw-dot projection has
      // genuine variance (Var[dot(Px,Pq)] ~ (‖x‖²‖q‖²+dot²)/k), which
      // is why PQ/SQ8 are the production recall tiers and JL is the
      // cheap-scan prefilter; the floors pin the measured trade with
      // margin instead of pretending it away
      val r50 = recallAt(50)
      val r200 = recallAt(200)
      assert(r50 >= 0.4, s"prefilter recall@10 at depth 50 = $r50")
      assert(r200 >= r50, s"recall not monotone: $r50 -> $r200")
      assert(r200 >= 0.6, s"prefilter recall@10 at depth 200 = $r200")
    } finally projected.unpersist()
  }
}
