package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator` (the UDAF surface, SURVEY.md §2
  * "UDF/UDAF/UDTF").
  *
  * This is the scale-correct per-key top-k: unlike a window
  * `row_number() <= k` — which must shuffle EVERY scored row to its key's
  * partition before ranking — an Aggregator is partial-aggregatable, so
  * each map task reduces its rows to at most k locally and the shuffle
  * carries k rows per (task × key). With a handful of query keys and a
  * 100 TB corpus that is the difference between shuffling the corpus and
  * shuffling kilobytes.
  *
  * Rows are (score, id) pairs; ordering is score DESC then id ASC (the
  * engine-wide deterministic tie-break, SURVEY.md §7.5).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), mutable.PriorityQueue[(Double, Long)], Seq[(Double, Long)]] {

  // min-heap on (score, -id): the root is the WORST kept row, evicted first
  private def heapOrder: Ordering[(Double, Long)] =
    Ordering.by { case (s, id) => (-s, id) }

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrder)

  override def reduce(b: mutable.PriorityQueue[(Double, Long)],
                      a: (Double, Long)): mutable.PriorityQueue[(Double, Long)] = {
    b.enqueue(a)
    while (b.size > k) b.dequeue()
    b
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long)],
                     b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach { a => b1.enqueue(a); while (b1.size > k) b1.dequeue() }
    b1
  }

  /** best-first: score DESC, id ASC */
  override def finish(b: mutable.PriorityQueue[(Double, Long)]): Seq[(Double, Long)] =
    b.toSeq.sortBy { case (s, id) => (-s, id) }

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
