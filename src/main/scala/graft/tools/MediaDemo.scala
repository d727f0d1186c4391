package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Forget, Multimodal, NearDup}
import graft.sources.VersionedCorpus

/** Runnable end-to-end consumer example of the multimodal pipeline —
  * the composition a training-data team would actually run:
  *
  *   1. raw assets arrive (real PNG/WAV/MP4 payloads);
  *   2. header-only TRIAGE classifies them without decoding pixels;
  *   3. perceptual ADMISSION dedups against the corpus hash index
  *      (exact byte tier + banded dHash tier);
  *   4. admitted payloads and hashes commit to two versioned stores;
  *   5. near-dup ANALYSIS groups what the corpus holds;
  *   6. an ERASURE request forgets an asset from both stores and the
  *      freed content re-admits.
  */
object MediaDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-mediademo")
    val corpus = s"$tmp/corpus"; val index = s"$tmp/index"

    println("== 1. raw assets (genuine payloads)")
    val batch1 = Multimodal.syntheticGridMedia(spark, nGroups = 4, perGroup = 2)
    batch1.toDF().groupBy(col("meta_format")).count().show()

    println("== 2. header-only triage (no pixel decode)")
    Multimodal.scanMetadata(batch1).toDF()
      .select(col("media_id"), col("kind"), col("width"), col("height")).show(4)

    println("== 3-4. admission + durable commit (first batch: all novel)")
    val empty = spark.range(0).select(col("id").as("media_id"),
      col("id").as("payload_hash"), col("id").as("phash"),
      col("id").cast("int").as("cbucket"))
    val (adm1, dec1) = Multimodal.admitMediaPerceptual(batch1, empty)
    VersionedCorpus.append(adm1, corpus)
    VersionedCorpus.append(Multimodal.mediaIndexProjection(dec1), index)
    println(s"admitted ${adm1.count()} of ${batch1.count()}")

    println("== 3-4 again. a re-export batch (brightness-shifted dupes + one novel group)")
    val batch2 = Multimodal.syntheticGridMedia(spark, nGroups = 5, perGroup = 5)
      .filter(col("media_id") % 5 === 3)
      .map(r => r.copy(media_id = r.media_id + 1000))
    val idx = VersionedCorpus.snapshot(spark, index)
    val (adm2, dec2) = Multimodal.admitMediaPerceptual(batch2, idx)
    println(s"admitted ${adm2.count()} of ${batch2.count()} (the novel group)")
    VersionedCorpus.append(adm2, corpus)
    VersionedCorpus.append(Multimodal.mediaIndexProjection(dec2), index)

    println("== 5. perceptual near-dup analysis over the stored index")
    val pairs = NearDup.signatureCandidates(
      VersionedCorpus.snapshot(spark, index).filter(col("phash").isNotNull),
      "media_id", "phash", maxHamming = 3)
    println(s"near-dup pairs in corpus: ${pairs.count()} (expected 4: the groups' rep pairs)")

    println("== 6. right-to-be-forgotten across both stores")
    // erase ALL of pattern group 0 (ids 0 and 1) — while ANY member
    // stays live, the perceptual tier keeps rejecting the pattern,
    // which is exactly the dedup-memory semantics erasure must clear
    val removed = Forget.forget(spark, Seq(0L, 1L).toDF("media_id"),
      extraStores = Seq(corpus -> "media_id", index -> "media_id"))
    println(s"forgot group 0 (assets 0, 1): $removed")
    val (readmit, _) = Multimodal.admitMediaPerceptual(
      batch1.filter(col("media_id") === 0L)
        .map(r => r.copy(media_id = r.media_id + 5000)),
      VersionedCorpus.snapshot(spark, index))
    println(s"re-consented content re-admits: ${readmit.count()} row(s)")

    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    spark.stop()
  }
}
