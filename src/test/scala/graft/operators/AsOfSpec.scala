package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("picks the latest in-window right row per left row; drops no-match rows") {
    val purchases = Seq(
      (100L, 1L, t("2024-01-01 10:00:00")),
      (101L, 1L, t("2024-01-01 12:00:00")),  // no click within 30 min
      (102L, 2L, t("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (1L, 1L, t("2024-01-01 09:40:00")),
      (2L, 1L, t("2024-01-01 09:50:00")),   // latest in-window for 100
      (3L, 1L, t("2024-01-01 10:30:00")),   // after purchase 100, > 30min before 101
      (4L, 2L, t("2024-01-01 09:59:00"))
    ).toDF("event_id", "user_id", "ts")

    val got = AsOf.asOfJoin(purchases, "event_id", "user_id", "ts",
      clicks, "event_id", "user_id", "ts", expr("INTERVAL 30 MINUTES"))
      .select($"_lid", $"_rid").as[(Long, Long)].collect.toSet
    assert(got === Set((100L, 2L), (102L, 4L)))
  }

  test("equal timestamps tie-break to the larger right id, right.ts == left.ts included") {
    val l = Seq((10L, 1L, t("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val r = Seq(
      (5L, 1L, t("2024-01-01 10:00:00")),
      (6L, 1L, t("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = AsOf.asOfJoin(l, "event_id", "user_id", "ts",
      r, "event_id", "user_id", "ts", expr("INTERVAL 30 MINUTES"))
      .select($"_rid").as[Long].head
    assert(got === 6L)
  }
}
