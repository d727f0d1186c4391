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


/** Streaming-tier expressions, batch-checked (B34/B35).
  *
  * One tier of [[Queries.all]] — split from the single registry so a
  * reviewer can hold each family; mixed back into [[Queries]], which
  * concatenates the tiers in the original declaration order (bench and
  * oracle iteration order unchanged). Helpers, shared builds, and the
  * determinism contract live on [[Queries]] itself. */
private[graft] trait QueriesTierStreamingBatch { this: Queries.type =>

  private[graft] lazy val tierStreamingBatch: ListMap[String, DeclaredQuery] = ListMap(

    // ----- streaming-tier expressions, batch-checked (B34/B35) ------------

    "q_tumbling" -> DeclaredQuery(
      (s, dir) => Streams.tumblingAgg(T(s, dir, "events"), "1 hour")
        .orderBy(col("bucket"), col("event_type")),
      Some("""SELECT date_trunc('hour', ts) AS bucket, event_type,
         |  count(*) AS n,
         |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
         |FROM events GROUP BY bucket, event_type
         |ORDER BY bucket, event_type""".stripMargin),
      "B34: tumbling window agg (same expression runs under readStream)"),

    "q_sliding" -> DeclaredQuery(
      (s, dir) => Streams.slidingAgg(T(s, dir, "events"), "1 hour", "30 minutes")
        .orderBy(col("bucket"), col("event_type")),
      Some("""SELECT TIMESTAMP '1970-01-01'
         |    + ((CAST(floor(epoch(ts) / 1800) AS BIGINT) - o.i) * 1800) * INTERVAL 1 SECOND
         |    AS bucket,
         |  event_type, count(*) AS n
         |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) o
         |GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin),
      "B34: sliding window agg — each event lands in width/slide buckets"),

    "q_session" -> DeclaredQuery(
      // tail stays a distributed orderBy: the r18 localFrameOrdered
      // experiment REGRESSED this row (0.36 → 0.77 s) — the collect
      // gate's small-plan AQE-off path caps the shuffle at width 4,
      // and the session-window aggregation over ~500k events is
      // compute-bound, not floor-bound; it needs the parallelism
      (s, dir) => Streams.sessionAgg(T(s, dir, "events"), "10 minutes")
        .orderBy(col("user_id"), col("session_start")),
      Some("""WITH x AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |              >= INTERVAL 10 MINUTE
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM events),
         |y AS (
         |  SELECT user_id, ts,
         |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM x)
         |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
         |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin),
      "B35: session windows ≡ gaps-and-islands in batch")
  )
}
