package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Expectations.Rule

/** The data-quality gate: one-pass evaluation, conservative NULL
  * handling, split/quarantine semantics, gated durable ingest. */
class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rules = Seq(
    Rule("id_pos", col("id") > 0),
    Rule("name_set", col("name").isNotNull),
    Rule("score_range", col("score").between(0.0, 1.0)))

  private def fixture = Seq(
    (1L, "a", 0.5),                 // clean
    (2L, null.asInstanceOf[String], 0.3), // name_set
    (-3L, "c", 1.5),                // id_pos + score_range
    (4L, "d", 0.0)                  // clean (boundary passes)
  ).toDF("id", "name", "score")

  test("split: clean rows drop bookkeeping, quarantined rows carry their rule lists in order") {
    val (clean, bad) = Expectations.split(fixture, rules)
    assert(clean.columns.toSeq === Seq("id", "name", "score"))
    assert(clean.select(col("id")).collect().map(_.getLong(0)).toSet === Set(1L, 4L))
    val got = bad.select(col("id"), array_join(col("_violations"), ",").as("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "name_set", -3L -> "id_pos,score_range"))
  }

  test("NULL predicate results are violations (conservative), not passes") {
    val df = Seq((1L, null.asInstanceOf[java.lang.Double])).toDF("id", "score")
    val r = Seq(Rule("score_range", col("score") <= 1.0))
    val (clean, bad) = Expectations.split(df, r)
    assert(clean.count() === 0L && bad.count() === 1L)
  }

  test("metrics: one aggregate pass, per-rule counts + total, no join") {
    val m = Expectations.metrics(fixture, rules)
    val got = m.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("_rows" -> 4L, "id_pos" -> 1L,
      "name_set" -> 1L, "score_range" -> 1L))
    val plan = Expectations.metrics(fixture, rules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "metrics must not join")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"two-phase agg:\n$plan")
  }

  test("appendChecked: clean rows reach the corpus, violations the quarantine, empty slices commit nothing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-expect")
    val corpus = s"$tmp/corpus"; val quarantine = s"$tmp/quarantine"
    val (nc, nb) = Expectations.appendChecked(fixture, rules, corpus, quarantine)
    assert((nc, nb) === (2L, 2L))
    assert(graft.sources.VersionedCorpus.snapshot(spark, corpus).count() === 2L)
    val q = graft.sources.VersionedCorpus.snapshot(spark, quarantine)
    assert(q.filter(col("_violations") === "id_pos,score_range").count() === 1L)
    // an all-clean batch commits nothing to quarantine
    val before = graft.sources.VersionedCorpus.latest(quarantine)
    val (nc2, nb2) = Expectations.appendChecked(
      Seq((9L, "z", 0.9)).toDF("id", "name", "score"), rules, corpus, quarantine)
    assert((nc2, nb2) === (1L, 0L))
    assert(graft.sources.VersionedCorpus.latest(quarantine) === before)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }
}
