package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (SURVEY.md §4.2 "shuffle/partitioning";
  * the 100 TB mandate). AQE's skew-join split handles most cases at
  * runtime; this explicit salted join is for the planned-ahead case —
  * e.g. a fact table where one hot key holds 10% of all rows and the
  * other side is too big to broadcast but small enough to replicate
  * `factor`×.
  *
  * The big side's rows get a salt in [0, factor); the small side is
  * exploded once per salt value; the join key becomes (key, salt). Every
  * big-side row still meets every matching small-side row exactly once,
  * so the result multiset is identical to the plain join — only the
  * shuffle key space is `factor`× finer.
  */
object Skew {

  def saltedJoin(big: DataFrame, bigKey: String, bigSaltCols: Seq[String],
                 small: DataFrame, smallKey: String,
                 factor: Int): DataFrame = {
    require(factor > 1, "salting with factor <= 1 is a no-op")
    require(bigSaltCols.nonEmpty, "need columns to derive the salt from")
    // salting exists to SPREAD rows of one hot key; a salt derived only
    // from the join key is constant within a key — all cost, no benefit
    require(bigSaltCols != Seq(bigKey),
      "salt columns must distinguish rows WITHIN a join key " +
        "(e.g. add a line-number or unique id column)")
    // the internal working column must not silently clobber caller data
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs must not already have a _salt column")
    // the salt MUST be deterministic per row: it becomes a shuffle key,
    // and a nondeterministic salt (rand, monotonically_increasing_id)
    // silently duplicates/loses rows when lost map tasks are recomputed
    // with different values (the SPARK-23207 failure class). Derive it
    // from row content — ideally a unique id — so retries re-produce it.
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(bigSaltCols.map(col): _*), lit(factor.toLong)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    saltedBig.join(replicatedSmall,
      saltedBig(bigKey) === replicatedSmall(smallKey) &&
        saltedBig("_salt") === replicatedSmall("_salt"))
      .drop("_salt")
  }
}
