package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-pipeline tier (SURVEY.md §2
  * B7-B9). The reference has NO dedup — `app.py:105-118` appends without
  * any duplicate check despite documenting `chunk_id` as unique
  * (`app.py:131`); this family is the north-star extension surface.
  *
  * Everything is groupBy/agg over a deterministic key, i.e. one hash
  * shuffle with map-side partial aggregation — the shape that scales:
  * at 100 TB the shuffle carries one (key-hash, id) pair per row, never
  * the document bodies.
  */
object Dedup {

  /** Canonical text fingerprint: the sorted token multiset. Catches
    * reordered-but-identical word-soup documents, not just byte-equal
    * ones. */
  def tokenFingerprint(text: Column): Column =
    array_join(sort_array(split(text, " ")), " ")

  /** Exact dedup (B7): group rows by `key`, keep the deterministic
    * representative `min(id)` plus the duplicate count. */
  def exact(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("fp"))
      .agg(min(id).as("rep_id"), count(lit(1)).as("dup_cnt"))

  /** Exact dedup keeping one full row per group: the row with the
    * smallest `id`. Window-free formulation: aggregate the whole row as a
    * (id, struct) min — partial-aggregatable, single shuffle. */
  def dropDuplicatesByKey(df: DataFrame, key: Column, id: Column): DataFrame = {
    val packed = struct(id.as("_id"), struct(df.columns.map(col): _*).as("_row"))
    df.groupBy(key.as("_fp"))
      .agg(min(packed).as("_keep"))
      .select(col("_keep._row.*"))
  }
}
