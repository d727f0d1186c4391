package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Embedder, TransformerEmbedder, VectorFunctions}
import graft.functions.VectorFunctions._
import graft.operators.{Decontaminate, Dedup, Expectations, Forget, IvfIndex, LangId, Multimodal, NearDup, PdfText, PqIndex, Sampling, Search, Sketch, SpanDedup, SqIndex, TextAnalysis, TextIndex}
import graft.sources.{IncrementalView, VersionedCorpus}
import graft.streaming.Streams


/** Relational core over the TPC-H-ish fixtures.
  *
  * One tier of [[Queries.all]] — split from the single registry so a
  * reviewer can hold each family; mixed back into [[Queries]], which
  * concatenates the tiers in the original declaration order (bench and
  * oracle iteration order unchanged). Helpers, shared builds, and the
  * determinism contract live on [[Queries]] itself. */
private[graft] trait QueriesTierRelational { this: Queries.type =>

  private[graft] lazy val tierRelational: ListMap[String, DeclaredQuery] = ListMap(

    // ----- relational core over the TPC-H-ish fixtures --------------------

    "q1_pricing" -> DeclaredQuery(
      (s, dir) => T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r4(dbl(decSum(col("l_quantity")))).as("sum_qty"),
          r4(dbl(decSum(col("l_extendedprice")))).as("sum_price"),
          r4(dbl(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))))
            .as("sum_disc"),
          r4(dbl(decSum(col("l_quantity"))) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
         |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price,
         |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_disc,
         |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
         |  count(*) AS cnt
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      "B22: two-phase hash aggregation (TPC-H Q1 shape)"),

    "q_region_acct" -> DeclaredQuery(
      (s, dir) => T(s, dir, "customer")
        .join(broadcast(T(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_cust"),
          r4(dbl(decSum(col("c_acctbal")))).as("sum_acctbal"))
        .orderBy(col("r_name")),
      Some("""SELECT r_name, count(*) AS n_cust,
         |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_acctbal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin),
      "B18: broadcast hash joins through the dimension chain"),

    "q_priority_join" -> DeclaredQuery(
      (s, dir) => T(s, dir, "orders")
        .join(T(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          r4(dbl(decSum(col("l_quantity")))).as("sum_qty"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, count(*) AS n_items,
         |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      "B19: shuffle (sort-merge) fact-to-fact equi-join"),

    "q_semi" -> DeclaredQuery(
      (s, dir) => T(s, dir, "customer")
        .join(T(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, count(*) AS n_cust
         |FROM customer WHERE EXISTS
         |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      "B20: left-semi join (EXISTS)"),

    "q_anti" -> DeclaredQuery(
      (s, dir) => T(s, dir, "customer")
        .join(T(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")).limit(100),
      Some("""SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS
         |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |ORDER BY c_custkey LIMIT 100""".stripMargin),
      "B20: left-anti join (NOT EXISTS)"),

    "q_top_order_per_cust" -> DeclaredQuery(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        T(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("top_price"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS top_price
         |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
         |        row_number() OVER (PARTITION BY o_custkey
         |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
         |      FROM orders)
         |WHERE rn = 1 ORDER BY o_custkey""".stripMargin),
      "B26: window row_number per partition"),

    "q_mov_sum" -> DeclaredQuery(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id")).rowsBetween(-2, 0)
        T(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            r4(dbl(sum(col("value").cast(DecimalType(18, 4))).over(w)))
              .as("msum"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
         |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS msum
         |FROM events ORDER BY user_id, event_id""".stripMargin),
      "B26: sliding window frame (exact DECIMAL so retraction is lossless)"),

    "q_funnel" -> DeclaredQuery(
      (s, dir) => {
        val ev = T(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("t1"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("u2"), col("ts").as("t2"))
        clicks.join(purchases,
          col("user_id") === col("u2") &&
            col("t2") >= col("t1") &&
            col("t2") <= col("t1") + expr("INTERVAL 10 MINUTES"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT c.user_id, count(*) AS n_pairs
         |FROM events c JOIN events p
         |  ON p.user_id = c.user_id
         | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
         |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
         |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin),
      "B21: range join (equi on user + time-window predicate)"),

    "q_asof" -> DeclaredQuery(
      (s, dir) => {
        val ev = T(s, dir, "events")
        graft.operators.AsOf.asOfJoin(
          ev.filter(col("event_type") === "purchase"), "event_id", "user_id", "ts",
          ev.filter(col("event_type") === "click"), "event_id", "user_id", "ts",
          expr("INTERVAL 30 MINUTES"))
          .select(col("_lid").as("pid"), col("_rid").as("cid"),
            col("_rt").as("cts"))
          .orderBy(col("pid"))
      },
      Some("""WITH p AS (SELECT event_id AS pid, user_id, ts FROM events
         |          WHERE event_type = 'purchase'),
         |c AS (SELECT event_id AS cid, user_id, ts AS cts FROM events
         |      WHERE event_type = 'click')
         |SELECT pid, cid, cts FROM (
         |  SELECT p.pid, c.cid, c.cts,
         |    row_number() OVER (PARTITION BY p.pid
         |      ORDER BY c.cts DESC, c.cid DESC) AS rn
         |  FROM p JOIN c ON c.user_id = p.user_id
         |    AND c.cts <= p.ts AND c.cts >= p.ts - INTERVAL 30 MINUTE)
         |WHERE rn = 1 ORDER BY pid""".stripMargin),
      "B21: as-of join = range join + latest-match pick via max(struct)"),

    "q_setops" -> DeclaredQuery(
      (s, dir) => T(s, dir, "customer")
        .filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"))
        .intersect(T(s, dir, "orders").select(col("o_custkey")))
        .orderBy(col("c_custkey")).limit(200),
      Some("""SELECT c_custkey FROM customer WHERE c_acctbal > 5000
         |INTERSECT
         |SELECT o_custkey FROM orders
         |ORDER BY c_custkey LIMIT 200""".stripMargin),
      "B28: INTERSECT"),

    "q_cube" -> DeclaredQuery(
      (s, dir) => T(s, dir, "documents")
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("cnt"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"), col("cnt"))
        .orderBy(asc("lang"), asc("source")),
      Some("""SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
         |  count(*) AS cnt
         |FROM documents GROUP BY CUBE(lang, source)
         |ORDER BY lang, source""".stripMargin),
      "B25: CUBE grouping sets"),

    "q_intersect_all" -> DeclaredQuery(
      (s, dir) => T(s, dir, "orders").select(col("o_custkey"))
        .intersectAll(T(s, dir, "orders")
          .filter(col("o_totalprice") > 1000).select(col("o_custkey")))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_custkey")).limit(300),
      Some("""SELECT o_custkey, count(*) AS n FROM (
         |  SELECT o_custkey FROM orders
         |  INTERSECT ALL
         |  SELECT o_custkey FROM orders WHERE o_totalprice > 1000)
         |GROUP BY o_custkey ORDER BY o_custkey LIMIT 300""".stripMargin),
      "B28: INTERSECT ALL (multiset semantics)"),

    "q_pivot" -> DeclaredQuery(
      (s, dir) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        val p = T(s, dir, "documents")
          .groupBy(col("source")).pivot("lang", langs).agg(count(lit(1)))
        p.select(col("source") +:
          langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
          .orderBy(col("source"))
      },
      Some("""SELECT source,
         |  count(*) FILTER (lang = 'de') AS de,
         |  count(*) FILTER (lang = 'en') AS en,
         |  count(*) FILTER (lang = 'es') AS es,
         |  count(*) FILTER (lang = 'fr') AS fr,
         |  count(*) FILTER (lang = 'zh') AS zh
         |FROM documents GROUP BY source ORDER BY source""".stripMargin),
      "pivot (wide conditional aggregation)"),

    "q_sample_split" -> DeclaredQuery(
      // deterministic train/val/test split — the training-pipeline
      // sampling op. The split key is a Knuth multiplicative hash of the
      // row id, NOT rand(): a seeded rand() is partition-order-dependent
      // and re-rolls on task retry (the SPARK-23207 class), whereas a
      // content-derived hash reproduces the same split on any cluster,
      // any partitioning, any engine — which is what makes it
      // oracle-checkable here
      (s, dir) => {
        // pre-modulo bounds the product to ~2.6e15 (< int64 max), so the
        // arithmetic never overflows: Spark would wrap silently where
        // DuckDB errors, breaking the engine-portability claim on ids
        // past ~3.5e9
        val bucket = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
          lit(1000L))
        T(s, dir, "documents")
          .withColumn("split",
            when(bucket < 800, "train").when(bucket < 900, "val")
              .otherwise("test"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n"),
            sum(length(col("text")).cast("long")).as("total_chars"),
            countDistinct(col("lang")).as("n_langs"))
          .orderBy(col("split"))
      },
      Some("""SELECT CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000 < 800 THEN 'train'
         |            WHEN ((doc_id % 1000003) * 2654435761) % 1000 < 900 THEN 'val'
         |            ELSE 'test' END AS split,
         |  count(*) AS n,
         |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |FROM documents GROUP BY split ORDER BY split""".stripMargin),
      "deterministic hash-based train/val/test split (retry-safe, engine-portable)"),

    "q_shard_output" -> DeclaredQuery(
      // deterministic shard routing + the balance audit a training-mix
      // WRITER emits: every doc hash-routes to one of 16 shards
      // (Sampling.hashShard — retry-safe and parallelism-independent,
      // so a resumed job rewrites identical shards), and the row set
      // reports each shard's doc count and token mass. The write-time
      // layout is repartition(shard) + partitionBy(shard) — exercised
      // and checked in SamplingSpec; this row oracle-checks the ROUTING
      // and the balance accounting, which is the part with cross-engine
      // semantics.
      (s, dir) => Sampling.hashShard(T(s, dir, "documents"), "doc_id", 16)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextAnalysis.tokens(col("text"))).cast("long"))
            .as("shard_tokens"))
        .orderBy(col("shard")),
      Some("""SELECT ((doc_id % 1000003) * 2654435761) % 16 AS shard,
         |  count(*) AS n_docs,
         |  CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
         |    AS BIGINT) AS shard_tokens
         |FROM documents GROUP BY shard ORDER BY shard""".stripMargin),
      "deterministic hash-shard routing + per-shard balance audit (training-mix writer)"),

    "q_stratified" -> DeclaredQuery(
      // deterministic STRATIFIED sampling — training-mix construction
      // with per-source rates (downsample the over-represented language,
      // keep more of the rare ones). Same Knuth-hash bucket discipline
      // as q_sample_split (retry-safe, partition-independent,
      // engine-portable — a per-group sampleBy(rand) would be none of
      // those); the per-lang rate is a plain CASE threshold on the
      // bucket, so admission is a row-local projection and the only
      // shuffle is the final per-lang rollup.
      (s, dir) => {
        val bucket = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
          lit(1000L))
        val thresh = when(col("lang") === "en", 500)
          .when(col("lang") === "fr", 250).otherwise(100)
        T(s, dir, "documents")
          .withColumn("_keep", bucket < thresh)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("_keep"), size(TextAnalysis.tokens(col("text")))
              .cast("long")).otherwise(0L)).as("kept_tokens"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_total,
         |  CAST(sum(CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000 <
         |      (CASE WHEN lang = 'en' THEN 500 WHEN lang = 'fr' THEN 250 ELSE 100 END)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000 <
         |      (CASE WHEN lang = 'en' THEN 500 WHEN lang = 'fr' THEN 250 ELSE 100 END)
         |    THEN len(list_filter(string_split(text, ' '), x -> x <> ''))
         |    ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
      "deterministic stratified per-lang sampling (training-mix rates via hash thresholds)"),

    "q_temperature_mix" -> DeclaredQuery(
      // TEMPERATURE-weighted source mixing (α = 0.5) — the multinomial
      // rebalancing the multilingual/multi-source training mixes use:
      // source s is sampled ∝ n_s^α instead of ∝ n_s, flattening the
      // head and upweighting rare sources. The whole chain is
      // INTEGER-exact so it stays oracle-green across engines: the
      // weight is floor(sqrt(n_s)) — sqrt is IEEE-correctly-rounded
      // (unlike pow, which is why α is 0.5 and not a free parameter
      // here) and the floor can never cross an integer for non-square
      // n (|√n − m| ≥ 1/(2m+1) ≫ ulp) — the per-source admission
      // threshold is pure int64 arithmetic (div, not /), and admission
      // is the q_sample_split Knuth-hash bucket (retry-safe,
      // partition-independent, engine-portable). Plan shape: one tiny
      // per-source agg, a broadcast of |sources| threshold rows back
      // onto the corpus scan, one final rollup — the corpus flows once.
      (s, dir) => {
        val docs = Tw(s, dir, "documents")
        val budget = 100L // target docs in the mix
        val counts = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_total"))
          .withColumn("w", floor(sqrt(col("n_total"))).cast("long"))
        // Σw as a whole-frame window over the ALREADY-AGGREGATED counts
        // (|sources| rows in one partition — the single-partition window
        // warning is exactly right-sized here) instead of the old
        // crossJoin(counts.agg(...)): that form consumed the counts
        // subtree twice and re-ran the corpus aggregation to build the
        // broadcast side (r14 job-count profile)
        val thr = counts
          .withColumn("_wsum", sum(col("w")).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
          .withColumn("_num", lit(1000000L) * lit(budget) * col("w"))
          .withColumn("_den", col("_wsum") * col("n_total"))
          // int64 `div`, not `/`: float division re-rounds the quotient
          // and the oracle compare is bit-strict on the threshold
          .withColumn("thr", least(lit(1000000L), expr("_num div _den")))
          .select(col("source"), col("n_total"), col("w"), col("thr"))
        val hash6 = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L),
          lit(1000000L))
        docs.join(broadcast(thr), "source")
          .withColumn("_keep", hash6 < col("thr"))
          .groupBy(col("source"), col("n_total"), col("w"), col("thr"))
          .agg(sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("_keep"), size(TextAnalysis.tokens(col("text")))
              .cast("long")).otherwise(0L)).as("kept_tokens"))
          .orderBy(col("source"))
      },
      Some("""WITH c AS (
         |  SELECT source, count(*) AS n_total,
         |    CAST(floor(sqrt(count(*))) AS BIGINT) AS w
         |  FROM documents GROUP BY source),
         |t AS (
         |  SELECT c.source, c.n_total, c.w,
         |    CAST(least(1000000,
         |      (1000000 * 100 * c.w) // (CAST(ws.wsum AS BIGINT) * c.n_total))
         |      AS BIGINT) AS thr
         |  FROM c, (SELECT sum(w) AS wsum FROM c) ws)
         |SELECT t.source, t.n_total, t.w, t.thr,
         |  CAST(sum(CASE WHEN ((d.doc_id % 1000003) * 2654435761) % 1000000 < t.thr
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN ((d.doc_id % 1000003) * 2654435761) % 1000000 < t.thr
         |    THEN len(list_filter(string_split(d.text, ' '), x -> x <> ''))
         |    ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM documents d JOIN t ON d.source = t.source
         |GROUP BY t.source, t.n_total, t.w, t.thr
         |ORDER BY t.source""".stripMargin),
      "temperature-weighted (alpha=0.5) source mix: integer-exact sqrt weights + hash admission"),

    "q_unpivot" -> DeclaredQuery(
      // wide→long melt via the native unpivot operator (pure projection +
      // generate — no shuffle before the final sort)
      (s, dir) => T(s, dir, "part")
        .filter(col("p_partkey") <= 100)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          col("p_retailprice").cast("double").as("retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
          "metric", "value")
        .orderBy(col("p_partkey"), col("metric")),
      Some("""SELECT p_partkey, metric, value FROM (
         |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
         |  FROM part WHERE p_partkey <= 100
         |  UNION ALL
         |  SELECT p_partkey, 'retailprice', CAST(p_retailprice AS DOUBLE)
         |  FROM part WHERE p_partkey <= 100)
         |ORDER BY p_partkey, metric""".stripMargin),
      "unpivot/melt (wide→long), UNION ALL-equivalent"),

    "q_stats" -> DeclaredQuery(
      (s, dir) => T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(r4(median(col("l_quantity"))).as("med_qty"),
          r4(percentile(col("l_extendedprice"), lit(0.9))).as("p90_price"),
          r4(stddev_samp(col("l_quantity"))).as("sd_qty"),
          r4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
          r4(covar_samp(col("l_quantity"), col("l_discount"))).as("cov_qd"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, round(median(l_quantity), 4) AS med_qty,
         |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
         |  round(stddev_samp(l_quantity), 4) AS sd_qty,
         |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
         |  round(covar_samp(l_quantity, l_discount), 4) AS cov_qd
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      "statistical aggregates: median / percentile / stddev / corr / covar"),

    "q_grouping_sets" -> DeclaredQuery(
      // deliberately through the spark.sql surface (direct-file SQL):
      // the engine's SQL entry point is part of the contract
      // NULL key values are excluded so coalesce's 'ALL' marker can only
      // mean "grouping null" — otherwise a NULL-lang group and the grand
      // total would share a sort key and the row order would be ambiguous
      (s, dir) => s.sql(
        s"""SELECT coalesce(lang, 'ALL') AS lang,
           |  coalesce(source, 'ALL') AS source, count(*) AS cnt
           |FROM parquet.`$dir/documents.parquet`
           |WHERE lang IS NOT NULL AND source IS NOT NULL
           |GROUP BY GROUPING SETS ((lang), (source), ())
           |ORDER BY lang, source""".stripMargin),
      Some("""SELECT coalesce(lang, 'ALL') AS lang,
         |  coalesce(source, 'ALL') AS source, count(*) AS cnt
         |FROM documents
         |WHERE lang IS NOT NULL AND source IS NOT NULL
         |GROUP BY GROUPING SETS ((lang), (source), ())
         |ORDER BY lang, source""".stripMargin),
      "B25: explicit GROUPING SETS via the SQL surface"),

    "q_corr_subquery" -> DeclaredQuery(
      (s, dir) => s.sql(
        s"""SELECT c_custkey,
           |  (SELECT count(*) FROM parquet.`$dir/orders.parquet` o
           |   WHERE o.o_custkey = c.c_custkey) AS n_orders
           |FROM parquet.`$dir/customer.parquet` c
           |ORDER BY c_custkey LIMIT 200""".stripMargin),
      Some("""SELECT c_custkey,
         |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
         |    AS n_orders
         |FROM customer c ORDER BY c_custkey LIMIT 200""".stripMargin),
      "correlated scalar subquery (Catalyst decorrelates to an aggregate join)"),

    "q_lateral" -> DeclaredQuery(
      // correlated LATERAL derived table (SQL surface): per-customer
      // top-2 orders by price — Catalyst decorrelates + plans the inner
      // top-k per group without a per-row re-execution
      (s, dir) => s.sql(
        s"""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
           |FROM parquet.`$dir/customer.parquet` c,
           |LATERAL (
           |  SELECT o_orderkey, o_totalprice
           |  FROM parquet.`$dir/orders.parquet` o
           |  WHERE o.o_custkey = c.c_custkey
           |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
           |WHERE c.c_custkey <= 100
           |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin),
      Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
         |FROM customer c,
         |LATERAL (
         |  SELECT o_orderkey, o_totalprice
         |  FROM orders o
         |  WHERE o.o_custkey = c.c_custkey
         |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
         |WHERE c.c_custkey <= 100
         |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin),
      "correlated LATERAL derived table (per-key top-k via SQL surface)"),

    "q_lag_rank" -> DeclaredQuery(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wv = Window.partitionBy(col("user_id"))
          .orderBy(desc("value"), asc("event_id"))
        T(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            r4(col("value") - lag(col("value"), 1).over(w)).as("d_prev"),
            rank().over(wv).cast("long").as("rnk"),
            dense_rank().over(wv).cast("long").as("drnk"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
         |  round(value - lag(value, 1) OVER
         |    (PARTITION BY user_id ORDER BY ts, event_id), 4) AS d_prev,
         |  rank() OVER (PARTITION BY user_id
         |    ORDER BY value DESC, event_id) AS rnk,
         |  dense_rank() OVER (PARTITION BY user_id
         |    ORDER BY value DESC, event_id) AS drnk
         |FROM events ORDER BY user_id, event_id""".stripMargin),
      "B26: lag / rank / dense_rank window family"),

    "q_monthly" -> DeclaredQuery(
      (s, dir) => T(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"),
          r4(dbl(decSum(col("o_totalprice")))).as("sum_price"))
        .orderBy(col("month")),
      Some("""SELECT date_trunc('month', o_orderdate) AS month,
         |  count(*) AS n_orders,
         |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price
         |FROM orders GROUP BY month ORDER BY month""".stripMargin),
      "B29: date_trunc bucket aggregation"),

    "q_string_fns" -> DeclaredQuery(
      (s, dir) => T(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("pfx"),
          length(col("p_name")).cast("long").as("nlen"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("bt"),
          regexp_extract(col("p_name"), "^([a-z]+)", 1).as("w1"))
        .orderBy(col("p_partkey")).limit(300),
      Some("""SELECT p_partkey, upper(p_name) AS uname,
         |  substring(p_name, 1, 5) AS pfx,
         |  length(p_name) AS nlen,
         |  concat(p_brand, '/', p_type) AS bt,
         |  regexp_extract(p_name, '^([a-z]+)', 1) AS w1
         |FROM part ORDER BY p_partkey LIMIT 300""".stripMargin),
      "B14: string scalar functions"),

    "q_math_fns" -> DeclaredQuery(
      (s, dir) => T(s, dir, "part")
        .select(col("p_partkey"),
          r4(sqrt(col("p_retailprice"))).as("rsqrt"),
          r4(log(col("p_retailprice"))).as("rln"),
          pow(col("p_size"), 2).as("p2"),
          floor(col("p_retailprice")).cast("long").as("fl"),
          ceil(col("p_retailprice")).cast("long").as("ce"),
          abs(col("p_size") - 25).as("ab"))
        .orderBy(col("p_partkey")).limit(300),
      Some("""SELECT p_partkey, round(sqrt(p_retailprice), 4) AS rsqrt,
         |  round(ln(p_retailprice), 4) AS rln,
         |  pow(p_size, 2) AS p2,
         |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
         |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
         |  abs(p_size - 25) AS ab
         |FROM part ORDER BY p_partkey LIMIT 300""".stripMargin),
      "B30: math scalar functions"),

    "q_array_fns" -> DeclaredQuery(
      // first5 is emitted as a space-joined STRING, not a raw array: the
      // driver's comparer sorts result columns with pandas, which cannot
      // hash numpy array cells (round-1 red row). The array ops under it
      // (slice/sort_array/array_distinct/array_contains) are unchanged.
      (s, dir) => T(s, dir, "documents")
        .select(col("doc_id"),
          array_join(slice(sort_array(split(col("text"), " ")), 1, 5), " ")
            .as("first5"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct"),
          array_contains(split(col("text"), " "), "spark").as("has_spark"))
        .orderBy(col("doc_id")).limit(500),
      Some("""SELECT doc_id,
         |  array_to_string((list_sort(string_split(text, ' ')))[1:5], ' ') AS first5,
         |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
         |  list_contains(string_split(text, ' '), 'spark') AS has_spark
         |FROM documents ORDER BY doc_id LIMIT 500""".stripMargin),
      "B31: array functions"),

    "q_json_agg" -> DeclaredQuery(
      (s, dir) => T(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(get_json_object(col("props"), "$.k").cast("long")).as("k_sum"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n,
         |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      "B15: JSON extraction + aggregation"),

    "q_distinct_parts" -> DeclaredQuery(
      (s, dir) => T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(*) AS n_rows,
         |  count(DISTINCT l_partkey) AS n_parts,
         |  count(DISTINCT l_suppkey) AS n_supps
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      "B23: distinct aggregation"),

    "corpus_stats" -> DeclaredQuery(
      (s, dir) => T(s, dir, "documents")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources")),
      Some("""SELECT count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
         |  count(DISTINCT lang) AS n_langs, count(DISTINCT source) AS n_sources
         |FROM documents""".stripMargin),
      "A8: corpus stats (count/min/max/distinct)"),

    "q_filter_pushdown" -> DeclaredQuery(
      (s, dir) => T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber")).limit(500),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_quantity < 10
         |ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin),
      "B17: predicate + projection pushdown to the parquet scan")
  )
}
