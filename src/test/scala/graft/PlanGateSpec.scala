package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the conf-scope concurrency contract (r16 verdict): every
  * session-conf-scoped window (AQE-off small-plan scope, capped
  * collects) runs under a process-wide reentrant lock, so two
  * overlapping scopes can never capture each other's TEMPORARY value
  * as "previous" and make the override permanent. These tests are
  * deterministic under the lock and were flaky-to-failing without it.
  */
class PlanGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("concurrent AQE-off scopes restore the session's steady state") {
    import graft.sources.{VersionedCorpus => VC}
    val aqeKey = "spark.sql.adaptive.enabled"
    val spKey = "spark.sql.shuffle.partitions"
    val (aqe0, sp0) = (spark.conf.get(aqeKey, "true"), spark.conf.get(spKey))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        try {
          (1 to 20).foreach { _ =>
            // the method under test is private[graft]; each scope
            // asserts it OBSERVES its own override mid-body — under
            // the lock no interleaving can corrupt the saved previous
            VC.withAqeOff(spark) {
              if (spark.conf.get(aqeKey) != "false")
                errs.add(s"t$i: aqe not off inside scope")
              if (spark.conf.get(spKey).toInt > 4)
                errs.add(s"t$i: width not capped inside scope")
            }
          }
        } catch { case t: Throwable => errs.add(s"t$i: $t") }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, errs.toString)
    assert(spark.conf.get(aqeKey, "true") === aqe0,
      "AQE flag not restored after concurrent scopes")
    assert(spark.conf.get(spKey) === sp0,
      "shuffle width not restored after concurrent scopes")
  }

  test("nested scope (withAqeOffIfSmall around cappedCollect) self-locks") {
    val df = spark.range(10).toDF("id")
    val rows = PlanGate.withAqeOffIfSmall(df)(
      PlanGate.cappedCollect(df, 100))
    assert(rows.length === 10)
    assert(spark.conf.getOption("spark.sql.limit.initialNumPartitions")
      .forall(_ != "1000000"),
      "capped-collect override leaked past its scope")
  }

  test("concurrent cappedCollects restore limit.initialNumPartitions") {
    val key = "spark.sql.limit.initialNumPartitions"
    val before = spark.conf.getOption(key)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 6).map { i =>
      new Thread(() => {
        try {
          (1 to 10).foreach { _ =>
            val got = PlanGate.cappedCollect(
              spark.range(50).toDF("id").filter(col("id") >= 0), 1000)
            if (got.length != 50) errs.add(s"t$i: ${got.length} rows")
          }
        } catch { case t: Throwable => errs.add(s"t$i: $t") }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, errs.toString)
    assert(spark.conf.getOption(key) === before,
      "limit.initialNumPartitions not restored after concurrent scopes")
  }

  test("scope bodies run OUTSIDE the lock: two scopes overlap in time") {
    // r17 advice: the old whole-window lock serialized every gated
    // collect end-to-end. With the set/restore-only critical section,
    // a scope body can be entered while another scope's body is still
    // open — this rendezvous would deadlock (then time out) under the
    // old contract.
    import graft.sources.{VersionedCorpus => VC}
    val aInside = new java.util.concurrent.CountDownLatch(1)
    val bInside = new java.util.concurrent.CountDownLatch(1)
    val ok = new java.util.concurrent.atomic.AtomicBoolean(false)
    val a = new Thread(() => VC.withAqeOff(spark) {
      aInside.countDown()
      // hold the scope open until B proves it reached its own body
      ok.set(bInside.await(10, java.util.concurrent.TimeUnit.SECONDS))
    })
    val b = new Thread(() => {
      aInside.await()
      VC.withAqeOff(spark) { bInside.countDown() }
    })
    a.start(); b.start(); a.join(15000); b.join(15000)
    assert(ok.get(), "second scope body never opened while first was open")
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") !== "false",
      "AQE flag not restored after overlapping scopes")
  }

  test("nested same-key scopes: depth ledger restores the steady state") {
    import graft.sources.{VersionedCorpus => VC}
    val aqeKey = "spark.sql.adaptive.enabled"
    val spKey = "spark.sql.shuffle.partitions"
    val (aqe0, sp0) = (spark.conf.get(aqeKey, "true"), spark.conf.get(spKey))
    VC.withAqeOff(spark) {
      VC.withAqeOff(spark) {
        assert(spark.conf.get(aqeKey) === "false")
        assert(spark.conf.get(spKey).toInt <= 4)
      }
      // inner close must NOT restore while the outer scope is open
      assert(spark.conf.get(aqeKey) === "false",
        "inner scope close restored the key under an open outer scope")
      assert(spark.conf.get(spKey).toInt <= 4)
    }
    assert(spark.conf.get(aqeKey, "true") === aqe0)
    assert(spark.conf.get(spKey) === sp0)
  }
}
