package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All real logic lives in [[Queries]] (declared query set) and the
  * graft.functions / graft.operators packages. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship path (app.py:40-48): brute-force dot-product
    * top-k over the embeddings corpus. */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("knn_topk").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map { case (k, q) => k -> q.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.all.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }

  /** Streaming mirrors of the windowed/stateful batch queries (SURVEY.md
    * §2 B33-B37), same Column expressions behind `readStream` over the
    * sfDir's events fixture. Each returns an UNSTARTED streaming frame
    * (`isStreaming == true`) — attach a sink + trigger to run. Not part
    * of the batch Verify contract; the batch twins are oracle-checked,
    * and `StreamsSpec` asserts stream ≡ batch on these. */
  def streamingQueries: Map[String, (SparkSession, String) => DataFrame] = {
    import graft.streaming.Streams
    Map(
      "s_tumbling" -> ((s, dir) =>
        Streams.tumblingAgg(Streams.fixtureEventSource(s, dir), "1 hour")),
      "s_sliding" -> ((s, dir) =>
        Streams.slidingAgg(Streams.fixtureEventSource(s, dir), "1 hour", "30 minutes")),
      "s_session" -> ((s, dir) =>
        Streams.sessionAgg(Streams.fixtureEventSource(s, dir), "10 minutes")),
      "s_watermark_tumbling" -> ((s, dir) =>
        Streams.watermarkedTumbling(Streams.fixtureEventSource(s, dir),
          "1 hour", "30 minutes")),
      "s_dedup" -> ((s, dir) =>
        Streams.dedupWithinWatermark(Streams.fixtureEventSource(s, dir), "1 hour")),
      // LLM-pipeline tier behind readStream: exact content dedup on the
      // document stream (B7's streaming twin; batch ≡ stream in
      // StreamsSpec)
      "s_doc_dedup" -> ((s, dir) =>
        Streams.contentDedup(Streams.fixtureDocumentSource(s, dir))),
      "s_running_totals" -> ((s, dir) =>
        Streams.runningUserTotals(Streams.fixtureEventSource(s, dir)).toDF()),
      // stream-stream interval join (B37), q_funnel's 10-minute
      // click→purchase window; two independent source instances, one per
      // join side, each with its own watermark
      "s_click_purchase" -> ((s, dir) => {
        import org.apache.spark.sql.functions.col
        Streams.clickPurchaseJoin(
          Streams.fixtureEventSource(s, dir)
            .filter(col("event_type") === "click"),
          Streams.fixtureEventSource(s, dir)
            .filter(col("event_type") === "purchase"),
          "10 MINUTES", "1 hour")
      })
    )
  }
}
