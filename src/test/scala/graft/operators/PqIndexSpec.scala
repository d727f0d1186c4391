package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Search

class PqIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 8 vectors in 4 dims; with ks = 8 every subvector is its own cell,
  // so quantization is lossless and ADC must equal the exact dot.
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

  test("encode emits length-m tinyint codes in [0, ks)") {
    val cb = PqIndex.trainCodebooks(tiny, "vec_id", "embedding",
      m = 2, ks = 4, iters = 2)
    val enc = PqIndex.encode(tiny, "vec_id", "embedding", cb)
    assert(enc.schema("codes").dataType.simpleString === "array<tinyint>")
    val rows = enc.select($"codes").as[Seq[Byte]].collect()
    assert(rows.forall(c => c.length == 2 && c.forall(b => b >= 0 && b < 4)))
  }

  test("ks >= distinct subvectors => ADC equals the exact dot") {
    val cb = PqIndex.trainCodebooks(tiny, "vec_id", "embedding",
      m = 2, ks = 8, iters = 3)
    val enc = PqIndex.encode(tiny, "vec_id", "embedding", cb)
    val adc = enc.select($"vec_id",
      PqIndex.adcScore($"codes", q, cb).as("sim"))
      .as[(Long, Double)].collect().toMap
    val exact = tiny.select($"vec_id",
      graft.functions.VectorFunctions.dot($"embedding",
        graft.functions.VectorFunctions.vecLit(q)).as("sim"))
      .as[(Long, Double)].collect().toMap
    exact.foreach { case (id, s) =>
      assert(math.abs(adc(id) - s) < 1e-9, s"id $id: adc=${adc(id)} exact=$s")
    }
  }

  test("searchRerank at full depth equals exact brute-force top-k") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val cb = PqIndex.trainCodebooks(emb, "vec_id", "embedding",
      m = 8, ks = 16, iters = 2)
    val enc = PqIndex.encode(emb, "vec_id", "embedding", cb)
    val n = emb.count().toInt
    val got = PqIndex.searchRerank(enc, emb, "vec_id", "embedding",
      graft.QueryVectors.q1, cb, k = 10, r = n)
      .select($"vec_id", $"sim", $"rank")
      .as[(Long, Double, Int)].collect().toSeq
    val want = Search.topK(emb, "embedding", "vec_id",
      graft.QueryVectors.q1, k = 10)
      .select($"vec_id", $"sim")
      .as[(Long, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) === want)
    assert(got.map(_._3) === (1 to 10))
  }

  test("ADC ordering is deterministic and rerank refines toward exact") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val cb = PqIndex.trainCodebooks(emb, "vec_id", "embedding",
      m = 8, ks = 16, iters = 2)
    val enc = PqIndex.encode(emb, "vec_id", "embedding", cb)
      .persist()
    try {
      enc.count()
      val a = PqIndex.search(enc, "vec_id", graft.QueryVectors.q2, cb, k = 10)
        .as[(Long, Double, Int)].collect().toSeq
      val b = PqIndex.search(enc, "vec_id", graft.QueryVectors.q2, cb, k = 10)
        .as[(Long, Double, Int)].collect().toSeq
      assert(a === b)
      val exact = Search.topK(emb, "embedding", "vec_id",
        graft.QueryVectors.q2, k = 10)
        .select($"vec_id").as[Long].collect().toSet
      def recall(r: Int): Double = {
        val ids = PqIndex.searchRerank(enc, emb, "vec_id", "embedding",
          graft.QueryVectors.q2, cb, k = 10, r = r)
          .select($"vec_id").as[Long].collect().toSet
        (ids & exact).size.toDouble / exact.size
      }
      // full-depth rerank is exact by construction; a practical depth
      // must do at least as well as the raw ADC cut at the same depth
      assert(recall(emb.count().toInt) === 1.0)
      assert(recall(100) >= recall(10))
    } finally { enc.unpersist(); () }
  }

  test("ragged corpus fails loudly during training") {
    val ragged = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0, 9.0, 9.0))
    ).toDF("vec_id", "embedding")
    // under ANSI (Spark 4 default) the out-of-range code lookup throws in
    // the job; with ANSI off the null-code guard fires driver-side with
    // the "ragged corpus" message — either way, loud, never silent
    intercept[Exception] {
      PqIndex.trainCodebooks(ragged, "vec_id", "embedding",
        m = 2, ks = 2, iters = 1)
    }
  }

  test("dim not divisible by m is rejected") {
    val e = intercept[IllegalArgumentException] {
      PqIndex.trainCodebooks(tiny, "vec_id", "embedding",
        m = 3, ks = 4, iters = 1)
    }
    assert(e.getMessage.contains("divisible"))
  }

  test("residual IVF-PQ: exhaustive probe with lossless codebooks = exact") {
    // 8 vectors, 2 IVF cells, residual codebook with ks = 8 (every
    // residual its own cell) → coarse term + lossless residual ADC must
    // reproduce the exact dot, so the full-probe top-k equals brute force
    val (assign, cents) = IvfIndex.build(tiny, "vec_id", "embedding",
      k = 2, iters = 2)
    try {
      val res = PqIndex.residuals(tiny, "vec_id", "embedding", assign, cents)
        .select($"vec_id", $"res")
      val cb = PqIndex.trainCodebooks(res, "vec_id", "res",
        m = 2, ks = 8, iters = 3)
      val enc = PqIndex.encodeResidual(tiny, "vec_id", "embedding",
        assign, cents, cb)
      val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq-spec")
      try {
        val path = s"$tmp/codes"
        enc.repartition($"cluster_id")
          .write.partitionBy("cluster_id").parquet(path)
        val got = PqIndex.probeIvfPq(spark, path, "vec_id", cents, q,
          cb, k = 4, nprobe = 2)
          .select($"vec_id", $"sim").as[(Long, Double)].collect().toSeq
        val want = Search.topK(tiny, "embedding", "vec_id", q, k = 4)
          .select($"vec_id", $"sim").as[(Long, Double)].collect().toSeq
        // ADC-only: same ids in the same order; sims agree to the
        // 4-decimal contract modulo a possible last-ulp rounding flip
        assert(got.map(_._1) === want.map(_._1))
        got.zip(want).foreach { case ((_, a), (_, b)) =>
          assert(math.abs(a - b) <= 1e-3, s"$a vs $b") }
        // the re-ranked form at full depth agrees too (and repairs any
        // last-ulp ADC rounding difference by construction)
        val rr = PqIndex.probeIvfPq(spark, path, "vec_id", cents, q,
          cb, k = 4, nprobe = 2, rerank = Some((tiny, "embedding", 8)))
          .select($"vec_id", $"sim").as[(Long, Double)].collect().toSeq
        assert(rr === want)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    } finally { assign.unpersist(); () }
  }

  test("residual append ≡ full re-encode under frozen centroids+codebooks") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val (assign, cents) = IvfIndex.build(emb, "vec_id", "embedding",
      k = 4, iters = 2)
    try {
      val res = PqIndex.residuals(emb, "vec_id", "embedding", assign, cents)
        .select($"vec_id", $"res")
      val cb = PqIndex.trainCodebooks(res, "vec_id", "res",
        m = 8, ks = 16, iters = 2)
      val full = PqIndex.encodeResidual(emb, "vec_id", "embedding",
        assign, cents, cb)
      val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq-app")
      try {
        val path = s"$tmp/codes"
        // day-1: everything except the slice; day-2: slice assigned to
        // the FROZEN centroids, encoded under the FROZEN codebooks
        full.filter($"vec_id" % 7 =!= 0)
          .repartition($"cluster_id")
          .write.partitionBy("cluster_id").parquet(path)
        val incoming = emb.filter($"vec_id" % 7 === 0)
        PqIndex.encodeResidual(incoming, "vec_id", "embedding",
            IvfIndex.assignTo(incoming, "vec_id", "embedding", cents),
            cents, cb)
          .repartition($"cluster_id")
          .write.partitionBy("cluster_id").mode("append").parquet(path)
        val back = spark.read.parquet(path)
          .select($"vec_id", $"cluster_id", $"codes")
          .as[(Long, Int, Seq[Byte])].collect().toSet
        val want = full.select($"vec_id", $"cluster_id", $"codes")
          .as[(Long, Int, Seq[Byte])].collect().toSet
        assert(back === want)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    } finally { assign.unpersist(); () }
  }

  test("residual IVF-PQ: nprobe=1 returns only the nearest cell's members") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val (assign, cents) = IvfIndex.build(emb, "vec_id", "embedding",
      k = 4, iters = 2)
    try {
      val res = PqIndex.residuals(emb, "vec_id", "embedding", assign, cents)
        .select($"vec_id", $"res")
      val cb = PqIndex.trainCodebooks(res, "vec_id", "res",
        m = 8, ks = 16, iters = 2)
      val enc = PqIndex.encodeResidual(emb, "vec_id", "embedding",
        assign, cents, cb)
      val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq-np1")
      try {
        val path = s"$tmp/codes"
        enc.repartition($"cluster_id")
          .write.partitionBy("cluster_id").parquet(path)
        val probe = PqIndex.probeIvfPq(spark, path, "vec_id", cents,
          graft.QueryVectors.q1, cb, k = 10, nprobe = 1)
        // the codes scan must be statically partition-pruned to the
        // probed cell — same contract as IvfIndex.probePartitioned
        val plan = probe.queryExecution.executedPlan.toString
        assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"),
          s"IVF-PQ probe must prune by partition:\n$plan")
        val got = probe.select($"vec_id").as[Long].collect().toSet
        // resolve the nearest cell exactly as the probe does
        val cs = cents.collect().map(r =>
          (r.getInt(0), r.getSeq[Double](1)))
        def l2(a: Seq[Double], b: Seq[Double]) =
          math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
        val nearest = cs.minBy { case (cid, c) =>
          (l2(c, graft.QueryVectors.q1), cid) }._1
        val members = assign.filter($"cluster_id" === nearest)
          .select($"vec_id").as[Long].collect().toSet
        assert(got.nonEmpty && got.subsetOf(members))
      } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    } finally { assign.unpersist(); () }
  }

  test("native adcScore kernel ≡ HOF twin bit-for-bit on valid codes; codegen'd; corrupt codes null out") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val seeds = emb.orderBy("vec_id").limit(16)
      .select(org.apache.spark.sql.functions.transform(
        $"embedding", _.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
    val cb: PqIndex.Codebooks = IndexedSeq.tabulate(8) { mi =>
      seeds.zipWithIndex.map { case (v, c) => (c, v.slice(mi * 8, mi * 8 + 8)) }
    }
    val enc = PqIndex.encode(emb, "vec_id", "embedding", cb)
    val q64 = graft.QueryVectors.q1
    val both = enc.select($"vec_id",
      PqIndex.adcScore($"codes", q64, cb).as("native"),
      PqIndex.adcScoreHof($"codes", q64, cb).as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"row ${r.getLong(0)}")
    }
    // codegen asserted over a MATERIALIZED codes table — the deployed
    // shape (the in-plan encode projection is a CodegenFallback HOF)
    val tmp = java.nio.file.Files.createTempDirectory("pqcodes").toString + "/c"
    enc.limit(8).write.parquet(tmp)
    val plan = spark.read.parquet(tmp)
      .select(PqIndex.adcScore($"codes", q64, cb).as("s"))
      .queryExecution.executedPlan.toString
    // the `*(n)` star on the Project is Spark's whole-stage-codegen mark
    assert("""\*\(\d+\) Project \[pqadcscoreexpr""".r.findFirstIn(plan).isDefined,
      s"pqadcscoreexpr must sit inside a codegen'd (starred) Project:\n$plan")
    // a code outside [0, ks) nulls the score (the safe divergence from
    // the HOF's neighboring-entry read, documented on the expression)
    val corrupt = Seq((0L, Seq[Byte](0, 1, 2, 3, 4, 5, 6, 127)))
      .toDF("vec_id", "codes")
    assert(corrupt.select(PqIndex.adcScore($"codes", q64, cb).as("s"))
      .select(isnull($"s")).head().getBoolean(0))
    // short codes array -> NULL from the native kernel (one corrupt row
    // must not fail a corpus-wide scan); the ANSI element_at in the HOF
    // twin THROWS instead — the documented, deliberate divergence
    val shortCodes = Seq((0L, Seq[Byte](1, 2))).toDF("vec_id", "codes")
    assert(shortCodes.select(PqIndex.adcScore($"codes", q64, cb).as("s"))
      .select(isnull($"s")).head().getBoolean(0))
    intercept[Exception] {
      shortCodes.select(PqIndex.adcScoreHof($"codes", q64, cb).as("s"))
        .collect()
    }
  }
}
