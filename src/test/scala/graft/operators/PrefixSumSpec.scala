package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Pins the two-phase prefix sum to the naive single-window form it
  * replaces: identical rows on the real fixture, on a skewed synthetic
  * frame, and on the edge shapes (null group, single-row group, one
  * group spanning many range partitions). */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def naive(df: org.apache.spark.sql.DataFrame, group: String,
                    order: String, value: String, out: String) = {
    val w = Window.partitionBy(col(group)).orderBy(col(order))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, sum(col(value)).over(w))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString(""))

  test("documents fixture: two-phase ≡ naive window, row for row") {
    val base = Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n"))
    val got = PrefixSum.groupedRunningSum(base, "lang", "doc_id", "n", "cum")
    val want = naive(base, "lang", "doc_id", "n", "cum")
    assert(got.columns.toSeq === want.columns.toSeq)
    assert(rows(got) === rows(want))
  }

  test("skew + edges: one giant group across partitions, a singleton, a null group") {
    import spark.implicits._
    // 10k rows in ONE group (guaranteed to span several of the 32 range
    // partitions), one single-row group, and a null group — the shapes
    // that break a pid-offset scheme if the offsets mis-join
    val big = (1 to 10000).map(i => (Option("hot"), i.toLong, (i % 7 + 1).toLong))
    val rest = Seq((Option("solo"), 1L, 42L),
      (Option.empty[String], 1L, 5L), (Option.empty[String], 2L, 6L))
    val df = (big ++ rest).toDF("grp", "ord", "v")
    val got = PrefixSum.groupedRunningSum(df, "grp", "ord", "v", "cum")
    val want = naive(df, "grp", "ord", "v", "cum")
    assert(rows(got) === rows(want))
    // the hot group's final total survives the offset chain exactly
    val hotMax = got.filter(col("grp") === "hot").agg(max("cum")).head.getLong(0)
    assert(hotMax === big.map(_._3).sum)
  }

  test("plan: local scan is salted by partition id, offsets broadcast — no per-group window") {
    val base = Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("lang"), lit(1L).as("n"))
    val p = PrefixSum.groupedRunningSum(base, "lang", "doc_id", "n", "cum")
      .queryExecution.executedPlan.toString
    // every big-side window spec must carry the pid salt next to the
    // group key: a bare partitionBy(lang) is the #langs-parallel shape
    // this operator exists to remove (the offsets' own tiny window runs
    // over ≤ partitions+groups rows and keeps the bare key — exempt)
    val bigWindows = p.linesIterator
      .filter(l => l.contains("windowspecdefinition(lang#"))
      .filterNot(_.contains("_ps_pid"))
    assert(bigWindows.isEmpty,
      s"per-lang single-task window reappeared:\n${bigWindows.mkString("\n")}")
    assert(p.contains("BroadcastHashJoin"),
      "offsets must come back as a broadcast, not a shuffle join")
  }

  test("plan: both phases read ONE materialized range Exchange (reuse)") {
    // Correctness of the offset join requires _ps_pid to be IDENTICAL in
    // the partials subtree and the final scan. That holds because both
    // consumers canonicalize to the same range Exchange and Spark's
    // reuse rule (physical planning with AQE off, stage-level reuse with
    // AQE on) materializes it once. If a rule change ever defeated the
    // reuse over a nondeterministic upstream, rows could land in
    // different pids per consumer and the running sums would be silently
    // wrong — so the reused shape is pinned HERE, on the operator
    // itself, not just via the declared rows' oracle hashes. AQE is
    // disabled for the inspection: with it on, the pre-execution plan
    // hides reuse inside runtime stage creation; with it off, the
    // ReuseExchange rule must fire in planning, which asserts exactly
    // the canonical-equality property stage-level reuse depends on.
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val base = Tables.load(spark, TestSpark.sf0001, "documents")
        .select(col("doc_id"), col("lang"), lit(1L).as("n"))
      val p = PrefixSum.groupedRunningSum(base, "lang", "doc_id", "n", "cum")
        .queryExecution.executedPlan.toString
      val materialized = p.linesIterator
        .filter(l => l.contains("Exchange rangepartitioning") &&
          !l.contains("ReusedExchange")).size
      assert(materialized === 1,
        s"expected exactly one materialized range Exchange, got $materialized:\n$p")
      assert(p.contains("ReusedExchange"),
        s"second consumer must read the reused Exchange, not its own:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
