package graft

import org.apache.spark.sql.DataFrame

/** Stats-adaptive execution gates shared by the driver-side collect
  * points (declared-query local frames, candidate-spine
  * materialization, admission reject sets).
  *
  * The one decision here: a plan whose LEAF SCANS total under
  * `smallPlanBytes` runs its consuming action with adaptive query
  * execution scoped OFF — at that size AQE's per-exchange query-stage
  * materialization pays a scheduler-floor job per shuffle with nothing
  * to re-plan (the r15 job-floor watch list was exactly this class),
  * while a plan reading real volume keeps runtime re-planning (skew
  * splits, runtime broadcast, partition coalescing — the things that
  * matter at 100 TB). The gate keys on what the query READS
  * (file-stat-backed leaf relation statistics, conservative), never on
  * the final frame's post-aggregate estimate, which is tiny even over
  * a 100 TB scan. Purely physical: results are identical either way.
  */
object PlanGate {

  val smallPlanBytes: Long = 256L << 20

  /** Process-wide lock serializing every session-conf-scoped window
    * (this object's [[cappedCollect]], `VersionedCorpus.withAqeOff`,
    * and everything built on them). The scopes mutate SESSION-level
    * conf around an action and restore in a finally; unserialized, two
    * overlapping scopes on the shared session could each capture the
    * other's TEMPORARY value as its "previous" and make the override
    * permanent (r16 verdict). The lock closes that capture race — the
    * save/mutate/act/restore sequence is atomic per scope. Reentrant,
    * so the standing nesting (`withAqeOffIfSmall(cappedCollect(...))`)
    * self-locks without deadlock.
    *
    * Residual, documented: a concurrent query on ANOTHER thread that
    * compiles while a scope is open still plans with the scope's
    * physical knobs (AQE off / capped width / high limit
    * initial-partitions). Those knobs are physical-only — results are
    * identical — and the gated scopes are by construction small-plan
    * fast paths, so the window is milliseconds; serving deployments
    * wanting zero cross-talk run maintenance actions on a dedicated
    * session (`spark.newSession()` shares the catalog and cache but
    * not the conf). */
  private[graft] val confScopeLock =
    new java.util.concurrent.locks.ReentrantLock()

  private[graft] def confScoped[T](body: => T): T = {
    confScopeLock.lock()
    try body finally confScopeLock.unlock()
  }

  /** Sum of the optimizer's leaf-relation size estimates — the plan's
    * read volume. `Long.MaxValue` when statistics are unavailable, so
    * an unknown plan NEVER takes the small-plan path. */
  def leafBytes(df: DataFrame): BigInt =
    try df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    catch { case _: Throwable => BigInt(Long.MaxValue) }

  /** Run `body` (the consuming action of `df`) with AQE off when the
    * plan's leaf scans are small; unchanged otherwise. */
  def withAqeOffIfSmall[T](df: DataFrame)(body: => T): T =
    if (leafBytes(df) <= BigInt(smallPlanBytes))
      graft.sources.VersionedCorpus.withAqeOff(df.sparkSession)(body)
    else body

  /** `df.limit(maxRows).collect()` in ONE job: CollectLimit's
    * incremental partition scaling (initialNumPartitions = 1, then
    * scale-up) pays up to three jobs for a capped safety collect whose
    * cap almost never binds — the probe-collect shape every
    * driver-bounded materialization uses. Scoping
    * `spark.sql.limit.initialNumPartitions` high makes the one
    * execution scan every partition, which is what the scale-up would
    * have done anyway by the time the cap is the question. */
  def cappedCollect(df: DataFrame,
                    maxRows: Int): Array[org.apache.spark.sql.Row] = confScoped {
    val spark = df.sparkSession
    val key = "spark.sql.limit.initialNumPartitions"
    val prev = try Some(spark.conf.get(key)) catch { case _: Throwable => None }
    spark.conf.set(key, "1000000")
    try df.limit(maxRows).collect()
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
