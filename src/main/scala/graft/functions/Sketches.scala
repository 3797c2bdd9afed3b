package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Misra–Gries heavy-hitters sketch as a typed Spark Aggregator: a bounded
  * (k-entry) counter map that provably contains every element with
  * frequency > n/k, mergeable across partitions — the classic map-side
  * sketch for "top words in a 100 TB corpus" where an exact groupBy would
  * shuffle every distinct term.
  *
  * reduce/merge are standard MG: decrement all counters when the map
  * overflows; merged counts are lower bounds within n/k of the truth.
  */
class MisraGries(k: Int) extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(m: mutable.Map[String, Long], x: String): mutable.Map[String, Long] = {
    if (m.contains(x) || m.size < k) m(x) = m.getOrElse(x, 0L) + 1L
    else {
      // decrement-all; drop zeros
      val dead = mutable.ArrayBuffer[String]()
      m.keys.foreach { key =>
        val v = m(key) - 1L
        if (v == 0L) dead += key else m(key) = v
      }
      dead.foreach(m.remove)
    }
    m
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (key, v) => a(key) = a.getOrElse(key, 0L) + v }
    if (a.size > k) {
      // subtract the (k+1)-th largest count (Agarwal et al. mergeable
      // summaries): at most k survive and the n/k error bound is preserved
      val cut = a.values.toSeq.sorted(Ordering[Long].reverse).drop(k).headOption.getOrElse(0L)
      val dead = mutable.ArrayBuffer[String]()
      a.keys.foreach { key =>
        val v = a(key) - cut
        if (v <= 0L) dead += key else a(key) = v
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(m: mutable.Map[String, Long]): Map[String, Long] = m.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    implicitly[Encoder[mutable.Map[String, Long]]](Encoders.kryo[mutable.Map[String, Long]])

  override def outputEncoder: Encoder[Map[String, Long]] =
    implicitly[Encoder[Map[String, Long]]](Encoders.kryo[Map[String, Long]])
}
