package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.operators.Search

/** Property-based invariants (SURVEY.md §5.2 item 3) over randomized
  * vectors and corpora, evaluated through the engine expressions. */
class PropertySpec extends AnyFunSuite {

  /** sample-based property runner (the scalatestplus bridge isn't in the
    * offline dependency cache; raw ScalaCheck generators are) */
  private def forAll[A](g: Gen[A], n: Int = 30)(f: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(f)
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))
  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecGen: Gen[List[Double]] =
    Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0))

  private def eval(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double")).head.getDouble(0)

  test("dot is symmetric and bilinear in scaling") {
    forAll(vecGen, vecGen, Gen.chooseNum(-3.0, 3.0)) { (a, b, s) =>
      val ab = eval(dot(vecLit(a), vecLit(b)))
      val ba = eval(dot(vecLit(b), vecLit(a)))
      assert(math.abs(ab - ba) < 1e-9)
      val scaled = eval(dot(vecLit(a.map(_ * s)), vecLit(b)))
      assert(math.abs(scaled - s * ab) < 1e-6)
    }
  }

  test("cauchy-schwarz: |dot| <= |a||b|; cosine in [-1, 1]") {
    forAll(vecGen, vecGen) { (a, b) =>
      val d = math.abs(eval(dot(vecLit(a), vecLit(b))))
      val na = eval(l2Norm(vecLit(a)))
      val nb = eval(l2Norm(vecLit(b)))
      assert(d <= na * nb + 1e-6)
      whenever(na > 1e-9 && nb > 1e-9) {
        val c = eval(cosine(vecLit(a), vecLit(b)))
        assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      }
    }
  }

  test("triangle inequality for l2Dist") {
    forAll(vecGen, vecGen, vecGen) { (a, b, c) =>
      val ab = eval(l2Dist(vecLit(a), vecLit(b)))
      val bc = eval(l2Dist(vecLit(b), vecLit(c)))
      val ac = eval(l2Dist(vecLit(a), vecLit(c)))
      assert(ac <= ab + bc + 1e-9)
    }
  }

  test("normalize is idempotent up to fp noise") {
    forAll(vecGen.suchThat(v => v.exists(_ != 0.0))) { a =>
      val n1 = eval(l2Norm(normalize(vecLit(a))))
      assert(math.abs(n1 - 1.0) < 1e-9)
    }
  }

  test("topK(k) is a prefix of topK(k+1) on the fixture corpus") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    for (k <- Seq(1, 3, 7)) {
      val small = Search.topK(emb, "embedding", "vec_id", QueryVectors.q1, k)
        .select("vec_id").as[Long].collect.toSeq
      val big = Search.topK(emb, "embedding", "vec_id", QueryVectors.q1, k + 3)
        .select("vec_id").as[Long].collect.toSeq
      assert(big.take(k) === small)
    }
  }

  private val tokenGen: Gen[List[String]] =
    Gen.listOfN(11, Gen.oneOf(
      Gen.oneOf("alpha", "beta", "gamma", "x", "yy", "", "ñü", "a b"),
      Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString)))
      .flatMap(l => Gen.chooseNum(0, l.length).map(l.take))

  test("property: native Shingles ≡ HOF shingles on random token lists (n=1..5)") {
    import graft.operators.NearDup
    forAll(tokenGen, Gen.oneOf(1, 2, 3, 4, 5)) { (toks, n) =>
      // drive both through the same text column so tokenization matches
      val text = toks.mkString(" ")
      val df = Seq(Tuple1(text)).toDF("text")
      val row = df.select(
        NearDup.shingles($"text", n).as("a"),
        NearDup.shinglesHof($"text", n).as("b")).head
      assert(row.getSeq[String](0) === row.getSeq[String](1),
        s"text='$text' n=$n")
    }
  }

  test("property: native MinHashSig ≡ HOF signature on random token arrays") {
    import graft.operators.NearDup
    val arrGen: Gen[List[String]] = Gen.listOfN(8,
      Gen.oneOf(Gen.const(null: String), Gen.alphaNumStr.map(_.take(6))))
      .flatMap(l => Gen.chooseNum(0, l.length).map(l.take))
    forAll(Gen.zip(arrGen, Gen.oneOf(8, 16, 32)), n = 20) { case (toks, h) =>
      val df = Seq(Tuple1(toks)).toDF("toks")
      val row = df.select(
        NearDup.minHashSignature($"toks", h).as("a"),
        NearDup.minHashSignatureHof($"toks", h).as("b")).head
      assert(row.getSeq[Long](0) === row.getSeq[Long](1),
        s"toks=$toks numHashes=$h")
    }
  }

  test("union count additivity (A6 invariant)") {
    forAll(Gen.chooseNum(0, 20), Gen.chooseNum(0, 20)) { (n, m) =>
      val a = spark.range(n.toLong).toDF("id")
      val b = spark.range(m.toLong).toDF("id")
      assert(a.unionByName(b).count() === (n + m).toLong)
    }
  }

  // random corpora with planted duplication: word-soup docs over a tiny
  // vocabulary (forces shared shingles), plus exact copies (exercises
  // the adaptive exact-dup collapse) and near-copies (one word tweaked)
  private val corpusGen: Gen[Seq[(Long, String)]] = {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val doc = Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, doc)).map { texts =>
      val base = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val copies = base.take(2).map { case (id, t) => (id + 1000L, t) }
      val tweaked = base.take(1).map { case (id, t) =>
        (id + 2000L, t + " zz") }
      base ++ copies ++ tweaked
    }
  }

  test("prefixJaccardJoin ≡ quadratic all-pairs on random duplicated corpora") {
    import graft.operators.NearDup
    forAll(Gen.zip(corpusGen, Gen.oneOf(0.5, 0.8)), n = 12) {
      case (rows, tau) =>
        val df = rows.toDF("doc_id", "text")
        val pairs = df.select($"doc_id".as("id_a"))
          .crossJoin(df.select($"doc_id".as("id_b")))
          .filter($"id_a" < $"id_b")
        val want = NearDup.jaccardVerify(df, "doc_id", "text", pairs)
          .filter($"jaccard" >= tau)
          .as[(Long, Long, Double)].collect.toSet
        val got = NearDup.prefixJaccardJoin(df, "doc_id", "text", tau)
          .as[(Long, Long, Double)].collect.toSet
        assert(got === want, s"tau=$tau rows=$rows")
    }
  }

  test("prefixJaccardJoin salted ≡ unsalted on an adversarial shared-prefix corpus") {
    import graft.operators.NearDup
    // every document contains ONE rare 3-gram ("qq rr ss") that lands in
    // every prefix — the pathological corpus where the rarest-first
    // order cannot spread the inverted-index join key; the rest of each
    // doc is distinct filler so the collapse stays on the distinct path
    val base = (0L until 40L).map { i =>
      (i, s"qq rr ss w${i}a w${i}b w${i}c w${i % 7}d w${i % 5}e")
    }
    // near-duplicates of the first five docs (one filler token swapped)
    // so the threshold actually admits pairs — the all-shared rare
    // prefix alone gives J ≈ 1/13, below any useful tau
    val rows = base ++ base.take(5).map { case (i, t) =>
      (100L + i, t.replace(s"w${i}c", "zz"))
    }
    val df = rows.toDF("doc_id", "text")
    for (tau <- Seq(0.3, 0.5)) {
      val plain = NearDup.prefixJaccardJoin(df, "doc_id", "text", tau)
        .as[(Long, Long, Double)].collect.toSet
      val salted = NearDup.prefixJaccardJoin(df, "doc_id", "text", tau,
        saltFactor = 4)
        .as[(Long, Long, Double)].collect.toSet
      assert(salted === plain, s"tau=$tau")
    }
    // and against the quadratic ground truth at the lower tau
    val pairs = df.select($"doc_id".as("id_a"))
      .crossJoin(df.select($"doc_id".as("id_b")))
      .filter($"id_a" < $"id_b")
    val want = NearDup.jaccardVerify(df, "doc_id", "text", pairs)
      .filter($"jaccard" >= 0.3)
      .as[(Long, Long, Double)].collect.toSet
    val got = NearDup.prefixJaccardJoin(df, "doc_id", "text", 0.3,
      saltFactor = 4)
      .as[(Long, Long, Double)].collect.toSet
    assert(got === want)
    assert(got.nonEmpty) // the adversarial corpus does produce pairs
  }

  test("CDC applyChanges ≡ driver-side change fold on random change logs, any batch split") {
    import graft.sources.VersionedCorpus
    // random change log over a small key space (forcing key collisions,
    // multi-wave updates, delete/re-insert churn), applied through the
    // store in 1..3 ordered batches vs a reference last-writer-wins
    // fold executed entirely driver-side
    val changeGen = Gen.listOfN(25, Gen.zip(
      Gen.chooseNum(0L, 9L),                  // key (dense -> collisions)
      Gen.oneOf("U", "U", "U", "D"),          // op, update-heavy
      Gen.chooseNum(1, 5),                    // within-batch seq
      Gen.alphaLowerStr.map(_.take(6))))      // payload
    forAll(Gen.zip(changeGen, Gen.chooseNum(1, 3)), n = 8) {
      case (rawChanges, nBatches) =>
        // a real change log sequences each key strictly — equal
        // (key, seq) with different payloads is unordered by contract
        // (the tie-to-delete rule is pinned deterministically in
        // VersionedCorpusSpec), so keep one change per (key, seq)
        val changes = rawChanges.distinctBy(c => (c._1, c._3))
        val root = java.nio.file.Files
          .createTempDirectory("graft-cdcprop").toString + "/corpus"
        VersionedCorpus.append(
          (0L until 5L).map(i => (i, s"base$i")).toDF("k", "payload"), root)
        // reference: fold batches in order; within a batch the max-seq
        // change per key wins
        var ref: Map[Long, String] = (0L until 5L).map(i => i -> s"base$i").toMap
        val batches = changes.grouped(
          math.max(1, changes.size / nBatches + 1)).toSeq
        batches.foreach { b =>
          b.groupBy(_._1).foreach { case (k, cs) =>
            val (_, op, _, payload) = cs.maxBy(_._3)
            ref = if (op == "D") ref - k else ref.updated(k, payload)
          }
        }
        batches.foreach { b =>
          VersionedCorpus.applyChanges(
            b.toDF("k", "op", "seq", "payload")
              .select($"k", $"payload", $"op", $"seq"),
            root, "k", "op", "seq")
        }
        val got = VersionedCorpus.snapshot(spark, root)
          .as[(Long, String)].collect().toMap
        assert(got === ref, s"changes=$changes nBatches=$nBatches")
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(root).getParentFile)
    }
  }

  test("two-phase prefix sum ≡ naive window on randomized grouped frames") {
    // random group cardinality (1-12, incl. the one-giant-group shape),
    // random sizes, negative values, duplicate-free order keys — the
    // two-phase scan must reproduce the naive window row for row no
    // matter how the range partitioner slices the groups
    val frameGen = for {
      nGroups <- Gen.chooseNum(1, 12)
      n <- Gen.chooseNum(1, 400)
      vals <- Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L))
      grps <- Gen.listOfN(n, Gen.chooseNum(0, nGroups - 1))
    } yield grps.zip(vals).zipWithIndex.map { case ((g, v), i) =>
      (s"g$g", i.toLong, v)
    }
    forAll(frameGen, n = 10) { rows =>
      val df = rows.toDF("grp", "ord", "v")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("grp")).orderBy(col("ord"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val want = df.withColumn("cum", sum(col("v")).over(w))
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      val got = graft.operators.PrefixSum
        .groupedRunningSum(df, "grp", "ord", "v", "cum",
          smallInputBytes = 0L) // force the two-phase plan under test
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(got.toSeq === want.toSeq)
    }
  }
}
