package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2 B21): for each left row, the single most
  * recent right row of the same key with `right.time <= left.time`,
  * optionally bounded by a tolerance window.
  *
  * Composed Spark-first per the survey: an equi+range join followed by a
  * per-left-row "latest" pick. The pick is `max(struct(time, id))` — an
  * ordinary partial-aggregatable hash aggregate with a deterministic
  * (time, id) tie-break — NOT a window: a window would need every match
  * of a left row in one partition; the aggregate reduces map-side, so the
  * shuffle carries one candidate per (task × left row). The range
  * predicate rides on the key equi-join (sort-merge), so no cross
  * product ever forms.
  */
object AsOf {

  /** Result: one row per left row that has ≥1 match — (_lid, _lk, _lt,
    * _rid, _rt) renamed by the caller. */
  def asOfJoin(left: DataFrame, lId: String, lKey: String, lTime: String,
               right: DataFrame, rId: String, rKey: String, rTime: String,
               tolerance: Column): DataFrame = {
    val l = left.select(col(lId).as("_lid"), col(lKey).as("_lk"),
      col(lTime).as("_lt"))
    val r = right.select(col(rId).as("_rid"), col(rKey).as("_rk"),
      col(rTime).as("_rt"))
    l.join(r,
      col("_lk") === col("_rk") &&
        col("_rt") <= col("_lt") &&
        col("_rt") >= col("_lt") - tolerance)
      .groupBy(col("_lid"), col("_lk"), col("_lt"))
      .agg(max(struct(col("_rt").as("t"), col("_rid").as("id"))).as("_m"))
      .select(col("_lid"), col("_lk"), col("_lt"),
        col("_m.id").as("_rid"), col("_m.t").as("_rt"))
  }
}
