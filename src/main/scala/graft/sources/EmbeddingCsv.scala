package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's on-disk corpus contract (reference `app.py:131-141` +
  * parse at `app.py:56`): CSV with header, four columns, the embedding as
  * ONE quoted field of comma-separated floats. (The reference's own docs
  * show the embedding unquoted — malformed CSV; SURVEY.md §1.3.)
  *
  * Deliberate semantic upgrades, documented per SURVEY.md §1.5:
  *   - explicit schema + FAILFAST instead of pandas inference — the
  *     reference's `np.fromstring` silently turns garbage into empty
  *     vectors that crash later at query time;
  *   - decode/encode are pure built-in expressions
  *     (`transform(split(...))` / `array_join`), no UDF, fully codegen'd.
  */
object EmbeddingCsv {

  /** chunk_id, document_id, chunk_text, vector_embedding — SURVEY.md §1.1 */
  val rawSchema: StructType = StructType(Seq(
    StructField("chunk_id", LongType),
    StructField("document_id", StringType),
    StructField("chunk_text", StringType),
    StructField("vector_embedding", StringType)))

  /** Read the reference CSV format into the engine schema
    * (`vector_embedding: ArrayType(FloatType)`). */
  def read(spark: SparkSession, path: String): DataFrame =
    decode(spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .schema(rawSchema)
      .csv(path))

  /** String → float[] decode (A2), applied to the raw string column. */
  def decode(df: DataFrame): DataFrame =
    df.withColumn("vector_embedding",
      transform(split(col("vector_embedding"), ","), _.cast(FloatType)))

  /** float[] → string encode for the CSV sink (round-trips with
    * `decode`). */
  def encode(df: DataFrame): DataFrame =
    df.withColumn("vector_embedding",
      array_join(col("vector_embedding"), ","))

  /** Write in the reference CSV contract (quoted embedding field). */
  def write(df: DataFrame, path: String): Unit =
    encode(df).write.option("header", "true").mode("overwrite").csv(path)
}
