package graft.expressions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** All non-ASCII test data is built from \\u escape sequences so the
  * fixtures are immune to editor/source-encoding normalization (which
  * would silently pre-compose the decomposed inputs and hollow out the
  * tests). */
class NfcNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** sample-based property runner (same pattern as PropertySpec — the
    * scalatestplus bridge isn't in the offline dependency cache) */
  private def forAll[A](g: Gen[A], n: Int = 50)(f: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(f)

  private def nfcOf(ss: Seq[String]): Seq[String] =
    ss.toDF("s").select(TextAnalysis.nfc(col("s")).as("n"))
      .as[String].collect.toSeq

  private def javaNfc(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  private val combAcute = "\u0301"
  private val combTilde = "\u0303"
  private val eAcute = "\u00e9"     // precomposed
  private val nTilde = "\u00f1"     // precomposed

  test("composes decomposed sequences; precomposed and ASCII unchanged") {
    val got = nfcOf(Seq(
      "cafe" + combAcute,           // decomposed e + combining acute
      "nin" + combTilde + "o",      // decomposed n + combining tilde
      eAcute, "plain", ""))
    assert(got === Seq(
      "caf" + eAcute, "ni" + nTilde + "o", eAcute, "plain", ""))
  }

  test("property: ASCII is a fixed point (fast path)") {
    val asciiGen = Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)
    forAll(asciiGen) { s =>
      assert(nfcOf(Seq(s)) === Seq(s))
    }
  }

  test("property: idempotent and agrees with java.text.Normalizer on arbitrary strings") {
    val charGen = Gen.oneOf(
      Gen.choose(' ', '~'),
      Gen.oneOf('\u0301', '\u0303', '\u0308', '\u0306',  // combining marks
        '\u00e9', '\u00f1', '\u4e2d', '\u0439'))          // precomposed + CJK
    val uniGen = Gen.listOf(charGen).map(_.mkString)
    forAll(uniGen) { s =>
      val Seq(once) = nfcOf(Seq(s))
      assert(once === javaNfc(s))
      assert(nfcOf(Seq(once)) === Seq(once), "idempotence")
    }
  }

  test("null-safe and registered as SQL function graft_nfc") {
    graft.GraftExtensions.install(spark)
    val got = spark.sql(
      "SELECT graft_nfc(s) AS n FROM VALUES ('cafe\\u0301'), (CAST(NULL AS STRING)) AS t(s)")
      .as[String].collect.toSeq
    assert(got === Seq("caf" + eAcute, null))
  }

  test("interpreted eval matches the DataFrame (codegen) path") {
    Seq("cafe" + combAcute, "abc", eAcute + combAcute + "x",
      "nin" + combTilde + "o").foreach { s =>
      val expr = NfcNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)))
      val interpreted = expr.eval(null)
        .asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      assert(nfcOf(Seq(s)) === Seq(interpreted))
    }
  }
}
