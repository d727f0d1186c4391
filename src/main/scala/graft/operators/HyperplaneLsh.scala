package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** LSH-bucketed ANN for cosine similarity (the brief's "LSH-bucketed
  * variant" alongside [[IvfIndex]]): each vector's bucket is the sign
  * pattern of its dot products with `nBits` fixed pseudo-random
  * hyperplanes (sign-random-projection LSH — vectors with high cosine
  * share sign patterns with high probability).
  *
  * Everything is deterministic: the hyperplanes are exact-decimal
  * literals generated from a fixed formula (same trick as
  * [[graft.QueryVectors]]), so the driver-side bucket of a query vector
  * (computed in plain Scala) bit-matches the executor-side bucket column.
  *
  * Scale shape: bucketing is a pure projection; search filters the corpus
  * to the query's multi-probe bucket set BEFORE the exact re-rank, so
  * with a bucketed/partitioned layout on `bucket` the scan prunes to
  * (nBits+1)/2^nBits of the data — same directory-pruning story as
  * [[IvfIndex.writePartitioned]].
  */
object HyperplaneLsh {

  /** Deterministic exact-decimal hyperplanes. Components come from a
    * splitmix-style integer hash of (dim index, plane index) mapped to
    * 6-decimal values in [-1, 1] — deterministic and bit-identical
    * between the driver-side [[bucketOf]] and the executor-side
    * [[bucketCol]], but WELL-MIXED across planes. (An earlier short
    * periodic formula produced near-parallel planes: on the sf0.1
    * fixture its largest sign bucket held 73 of 2000 vectors at nBits=9
    * vs 14 for this hash — a 4.7× inflation of every bucketed join's
    * candidate volume.) */
  def planes(dim: Int, nBits: Int): Seq[IndexedSeq[Double]] = {
    // bucket ids live in a Long bitmask; 0 bits has no planes to reduce
    // and >63 silently wraps the shift (bit 64 aliases bit 0)
    require(nBits >= 1 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")
    (0 until nBits).map { b =>
      (0 until dim).map { i =>
        var x = i.toLong * 2654435761L + b.toLong * 0x9E3779B97F4A7C15L + 11L
        x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
        x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
        x = x ^ (x >>> 31)
        (math.floorMod(x, 2000001L) - 1000000L) / 1000000.0
      }
    }
  }

  /** bucket id column: bit b set iff dot(vec, plane_b) > 0 */
  def bucketCol(vec: Column, planes: Seq[IndexedSeq[Double]]): Column =
    planes.zipWithIndex.map { case (p, b) =>
      when(dot(vec, vecLit(p)) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** driver-side bucket of a plain query vector — same fold, same sign
    * decisions as [[bucketCol]] */
  def bucketOf(q: Seq[Double], planes: Seq[IndexedSeq[Double]]): Long =
    planes.zipWithIndex.map { case (p, b) =>
      var acc = 0.0
      var i = 0
      while (i < p.length) { acc += q(i) * p(i); i += 1 }
      if (acc > 0) 1L << b else 0L
    }.sum

  /** multi-probe set: the query's bucket plus every single-bit flip */
  def probeSet(q: Seq[Double], planes: Seq[IndexedSeq[Double]]): Seq[Long] = {
    val b = bucketOf(q, planes)
    b +: planes.indices.map(i => b ^ (1L << i))
  }

  /** ANN top-k: restrict to the multi-probe buckets, exact re-rank by
    * `score` inside them. */
  def annSearch(corpus: DataFrame, idCol: String, vecCol: String,
                q: Seq[Double], k: Int, nBits: Int = 8,
                score: (Column, Column) => Column = dot): DataFrame = {
    val ps = planes(q.length, nBits)
    corpus
      .withColumn("_bucket", bucketCol(col(vecCol), ps))
      .filter(col("_bucket").isin(probeSet(q, ps): _*))
      .withColumn("sim", round(score(col(vecCol), vecLit(q)), 4))
      .orderBy(desc("sim"), asc(idCol))
      .limit(k)
      .drop("_bucket")
  }
}
