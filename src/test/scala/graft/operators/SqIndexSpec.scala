package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.functions.VectorFunctions

class SqIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val tiny = Seq(
    (0L, Seq(1.0, 0.0, 0.0, 0.0)),
    (1L, Seq(0.0, 1.0, 0.0, 0.0)),
    (2L, Seq(0.0, 0.0, 1.0, 0.0)),
    (3L, Seq(0.0, 0.0, 0.0, 1.0)),
    (4L, Seq(0.5, 0.5, 0.0, 0.0)),
    (5L, Seq(0.0, 0.0, 0.5, 0.5)),
    (6L, Seq(0.3, -0.2, 0.7, 0.1)),
    (7L, Seq(-0.4, 0.6, -0.1, 0.2))
  ).toDF("vec_id", "embedding")

  private val q = Seq(0.2, -0.1, 0.9, 0.3)

  test("encode emits length-d tinyint codes in [0, 127]") {
    val p = SqIndex.trainParams(tiny, "vec_id", "embedding")
    val enc = SqIndex.encode(tiny, "vec_id", "embedding", p)
    assert(enc.schema("codes").dataType.simpleString === "array<tinyint>")
    val rows = enc.select($"codes").as[Seq[Byte]].collect()
    assert(rows.forall(c =>
      c.length == 4 && c.forall(b => b >= 0 && b <= SqIndex.Levels)))
  }

  test("a constant dimension gets delta 0, code 0, exact reconstruction") {
    val const = Seq(
      (0L, Seq(5.0, 1.0)), (1L, Seq(5.0, 2.0)), (2L, Seq(5.0, 3.0))
    ).toDF("vec_id", "embedding")
    val p = SqIndex.trainParams(const, "vec_id", "embedding")
    assert(p.delta(0) === 0.0 && p.vmin(0) === 5.0)
    val enc = SqIndex.encode(const, "vec_id", "embedding", p)
    assert(enc.select($"codes").as[Seq[Byte]].collect()
      .forall(_.head == 0))
    // with dim 0 constant, sqScore's error comes only from dim 1
    val qc = Seq(1.0, 0.0) // touches only the constant dimension
    val got = enc.select($"vec_id",
        SqIndex.sqScore($"codes", qc, p).as("sim"))
      .as[(Long, Double)].collect().toMap
    got.foreach { case (_, s) => assert(math.abs(s - 5.0) < 1e-12) }
  }

  test("grid-aligned corpus quantizes losslessly: sqScore equals the exact dot") {
    // values are exact multiples of (max-min)/127 offsets from min:
    // min=0, max=127 => delta=1, every integer value is ON the grid
    val grid = Seq(
      (0L, Seq(0.0, 127.0)), (1L, Seq(127.0, 0.0)),
      (2L, Seq(64.0, 32.0)), (3L, Seq(1.0, 126.0))
    ).toDF("vec_id", "embedding")
    val p = SqIndex.trainParams(grid, "vec_id", "embedding")
    val enc = SqIndex.encode(grid, "vec_id", "embedding", p)
    val got = enc.select($"vec_id",
        SqIndex.sqScore($"codes", Seq(0.3, -0.7), p).as("sim"))
      .as[(Long, Double)].collect().toMap
    val exact = grid.select($"vec_id",
        VectorFunctions.dot($"embedding",
          VectorFunctions.vecLit(Seq(0.3, -0.7))).as("sim"))
      .as[(Long, Double)].collect().toMap
    exact.foreach { case (id, s) =>
      assert(math.abs(got(id) - s) < 1e-9, s"id $id: sq=${got(id)} exact=$s")
    }
  }

  test("sqScore error is bounded by sum(|q_i| * delta_i / 2) on the fixture") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val p = SqIndex.trainParams(emb, "vec_id", "embedding")
    val qv = graft.QueryVectors.q1
    val bound = qv.iterator.zip(p.delta.iterator)
      .map { case (a, d) => math.abs(a) * d / 2 }.sum
    val enc = SqIndex.encode(emb, "vec_id", "embedding", p)
    val joined = enc.join(emb, "vec_id")
      .select(
        SqIndex.sqScore($"codes", qv, p).as("sq"),
        VectorFunctions.dot($"embedding",
          VectorFunctions.vecLit(qv)).as("exact"))
      .select(max(abs($"sq" - $"exact")).as("maxErr"))
      .as[Double].head()
    assert(joined <= bound + 1e-9,
      s"max |sq - exact| = $joined exceeds bound $bound")
  }

  test("searchRerank at full depth equals exact brute-force top-k") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val p = SqIndex.trainParams(emb, "vec_id", "embedding")
    val enc = SqIndex.encode(emb, "vec_id", "embedding", p)
    val n = emb.count().toInt
    val got = SqIndex.searchRerank(enc, emb, "vec_id", "embedding",
      graft.QueryVectors.q1, p, k = 10, r = n)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().toSeq
    val want = Search.topK(emb, "embedding", "vec_id",
      graft.QueryVectors.q1, k = 10)
      .select($"vec_id", $"sim")
      .as[(Long, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) === want)
    assert(got.map(_._3) === (1 to 10))
  }

  test("recall is monotone in the rerank depth, and deep beats shallow") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val p = SqIndex.trainParams(emb, "vec_id", "embedding")
    val enc = SqIndex.encode(emb, "vec_id", "embedding", p)
    val exact = Search.topK(emb, "embedding", "vec_id",
      graft.QueryVectors.q1, k = 10)
      .select($"vec_id").as[Long].collect().toSet
    val top = enc.select($"vec_id",
        round(SqIndex.sqScore($"codes", graft.QueryVectors.q1, p), 4)
          .as("sim"))
      .orderBy(desc("sim"), asc("vec_id")).limit(200)
      .select($"vec_id").as[Long].collect().toIndexedSeq
    val recalls = Seq(10, 20, 50, 200).map { r =>
      (top.take(r).toSet & exact).size.toDouble / exact.size
    }
    assert(recalls.sliding(2).forall { case Seq(a, b) => a <= b })
    // 127 levels/dim is nearly lossless — the deepest dial point must
    // recover the exact top-10 on this fixture
    assert(recalls.last === 1.0)
  }

  test("searchManyRerank equals one searchRerank per query") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val p = SqIndex.trainParams(emb, "vec_id", "embedding")
    val enc = SqIndex.encode(emb, "vec_id", "embedding", p).persist()
    try {
      enc.count()
      val qs = Seq((1L, graft.QueryVectors.q1), (2L, graft.QueryVectors.q2))
      val batched = SqIndex.searchManyRerank(enc, emb, "vec_id",
          "embedding", qs.toDF("qid", "qvec"), "qid", "qvec",
          p, k = 10, r = 30)
        .select($"qid", $"vec_id", $"sim", $"rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      val single = qs.flatMap { case (qid, q) =>
        SqIndex.searchRerank(enc, emb, "vec_id", "embedding", q, p,
            k = 10, r = 30)
          .select($"vec_id", $"sim", $"rank")
          .as[(Long, Double, Int)].collect()
          .map { case (id, sim, rank) => (qid, id, sim, rank) }
      }.toSet
      assert(batched === single)
    } finally { enc.unpersist(); () }
  }

  test("frozen-grid append equals full re-encode, byte for byte") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val day1 = emb.filter(col("vec_id") % 10 =!= 0)
    val incoming = emb.filter(col("vec_id") % 10 === 0)
    val p = SqIndex.trainParams(day1, "vec_id", "embedding")
    val appended = SqIndex.encode(day1, "vec_id", "embedding", p)
      .unionByName(SqIndex.encode(incoming, "vec_id", "embedding", p))
      .as[(Long, Seq[Byte])].collect().toMap
    val full = SqIndex.encode(emb, "vec_id", "embedding", p)
      .as[(Long, Seq[Byte])].collect().toMap
    assert(appended === full)
  }

  test("values outside the frozen grid clip to the grid edges") {
    val day1 = Seq((0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 10.0)))
      .toDF("vec_id", "embedding")
    val p = SqIndex.trainParams(day1, "vec_id", "embedding")
    val wild = Seq((2L, Seq(-5.0, 25.0))).toDF("vec_id", "embedding")
    val codes = SqIndex.encode(wild, "vec_id", "embedding", p)
      .select($"codes").as[Seq[Byte]].head()
    assert(codes === Seq[Byte](0, SqIndex.Levels.toByte),
      "below-range must clip to 0, above-range to 127")
  }

  test("ragged and empty corpora fail loudly at train time") {
    val ragged = Seq(
      (0L, Seq(1.0, 2.0)), (1L, Seq(1.0, 2.0, 3.0))
    ).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      SqIndex.trainParams(ragged, "vec_id", "embedding")
    }
    assert(ex.getMessage.contains("ragged"))
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      SqIndex.trainParams(empty, "vec_id", "embedding")
    }
  }

  test("native sqScore kernel ≡ HOF twin bit-for-bit; codegen'd; null shapes match") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val p = SqIndex.trainParams(emb, "vec_id", "embedding")
    val enc = SqIndex.encode(emb, "vec_id", "embedding", p)
    val q64 = graft.QueryVectors.q1
    val both = enc.select($"vec_id",
      SqIndex.sqScore($"codes", q64, p).as("native"),
      SqIndex.sqScoreHof($"codes", q64, p).as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"row ${r.getLong(0)}: native ${r.getDouble(1)} != hof ${r.getDouble(2)}")
    }
    // the kernel stays inside whole-stage codegen over a MATERIALIZED
    // codes table — the deployed shape (the in-plan encode projection is
    // a HOF and CodegenFallback by Spark's own design, which is exactly
    // why the builds persist codes before the scan)
    val tmp = java.nio.file.Files.createTempDirectory("sqcodes").toString + "/c"
    enc.limit(8).write.parquet(tmp)
    val plan = spark.read.parquet(tmp)
      .select(SqIndex.sqScore($"codes", q64, p).as("s"))
      .queryExecution.executedPlan.toString
    // the `*(n)` star on the Project is Spark's whole-stage-codegen mark
    assert("""\*\(\d+\) Project \[sqscoreexpr""".r.findFirstIn(plan).isDefined,
      s"sqscoreexpr must sit inside a codegen'd (starred) Project:\n$plan")
    assert(!plan.toLowerCase.contains("aggregate(sequence"),
      "interpreted HOF fold must not be on the scan path")
    // short codes array -> NULL from the native kernel (one corrupt row
    // must not fail a corpus-wide scan); the ANSI element_at in the HOF
    // twin THROWS instead — the documented, deliberate divergence
    val shortCodes = Seq((0L, Seq[Byte](1, 2, 3))).toDF("vec_id", "codes")
    assert(shortCodes.select(SqIndex.sqScore($"codes", q64, p).as("s"))
      .select(isnull($"s")).head().getBoolean(0))
    intercept[Exception] {
      shortCodes.select(SqIndex.sqScoreHof($"codes", q64, p).as("s"))
        .collect()
    }
  }
}
