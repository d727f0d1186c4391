package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality EXPECTATIONS — the constraint gate a production ingest
  * pipeline runs before rows reach the corpus (the Delta Live Tables /
  * Great Expectations shape, engine-native): each rule is a named
  * Column predicate, every rule is evaluated in ONE row-local
  * projection (an array of per-rule verdicts — no joins, no shuffle,
  * no per-rule pass), and the batch splits into the clean slice and a
  * quarantine slice that carries WHICH rules each row violated.
  *
  * Scale shape: rules are pure expressions inside whole-stage codegen;
  * [[metrics]] is one partial+final aggregate (a handful of longs per
  * task crosses the wire); the split is two filters over one shared
  * subtree — at 100 TB the gate costs one scan, nothing else.
  */
object Expectations {

  /** One named constraint: `predicate` must hold for a row to pass.
    * NULL predicate results count as violations (the conservative side
    * — an unevaluable constraint is not a passed constraint). */
  final case class Rule(name: String, predicate: Column)

  /** The per-row violation list, in rule order: names of every rule the
    * row fails. Empty array = clean row. */
  def violations(rules: Seq[Rule]): Column =
    filter(
      array(rules.map(r =>
        when(coalesce(r.predicate, lit(false)), lit(null).cast("string"))
          .otherwise(lit(r.name))): _*),
      _.isNotNull)

  /** Annotate every row with its `_violations` array — the single-pass
    * evaluation the other entry points share. */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.withColumn("_violations", violations(rules))

  /** Split into (clean, quarantined): clean rows drop the bookkeeping
    * column; quarantined rows keep `_violations` so downstream triage
    * knows why each row was held. Both sides share one subtree — on a
    * cached or exchanged input the rules evaluate once. */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val marked = annotate(df, rules)
    (marked.filter(size(col("_violations")) === 0).drop("_violations"),
      marked.filter(size(col("_violations")) > 0))
  }

  /** Per-rule violation counts + the row totals, as ONE aggregate pass
    * (partial+final; no per-rule scan). Output: (rule, n_violations)
    * ordered by rule name, plus a `_rows` total row. */
  def metrics(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.map(r =>
      sum(when(coalesce(r.predicate, lit(false)), 0L).otherwise(1L))
        .as(r.name)) :+ count(lit(1)).as("_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row into (rule, n) — driver-free, stays a DF
    val pairs = (rules.map(_.name) :+ "_rows").map(n =>
      struct(lit(n).as("rule"), col(n).as("n_violations")))
    one.select(explode(array(pairs: _*)).as("kv"))
      .select(col("kv.rule"), col("kv.n_violations"))
      .orderBy(col("rule"))
  }

  /** Gated durable ingest: clean rows append to the corpus store,
    * quarantined rows (with their violation lists, serialized to a
    * comma-joined string so the store schema stays flat) append to
    * `quarantineRoot`. Either append is skipped when its slice is
    * empty — an all-clean batch commits nothing to quarantine and vice
    * versa. Returns (cleanCount, quarantinedCount). */
  def appendChecked(df: DataFrame, rules: Seq[Rule], corpusRoot: String,
                    quarantineRoot: String): (Long, Long) = {
    val marked = annotate(df, rules)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val clean = marked.filter(size(col("_violations")) === 0)
        .drop("_violations")
      val bad = marked.filter(size(col("_violations")) > 0)
        .withColumn("_violations",
          array_join(col("_violations"), ","))
      val nClean = clean.count(); val nBad = bad.count()
      if (nClean > 0) graft.sources.VersionedCorpus.append(clean, corpusRoot)
      if (nBad > 0) graft.sources.VersionedCorpus.append(bad, quarantineRoot)
      (nClean, nBad)
    } finally marked.unpersist()
  }
}
