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

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator
  * (Bar-Yossef et al. 2002): keep the k smallest hash values seen; with
  * hashes uniform on [0,1), the k-th minimum U estimates the cardinality
  * as (k-1)/U. O(k) memory per group regardless of cardinality, and merge
  * is set-union-keep-k-smallest — fully mergeable map-side partials, so a
  * 100 TB distinct-count never shuffles raw values (the exact
  * `count(distinct)` shuffles every distinct key to its group).
  *
  * Input is an ALREADY-HASHED long (hash in the plan via codegen'd
  * `xxhash64`; the Aggregator only maintains order statistics). Hashes are
  * stored sign-flipped so natural Long order equals unsigned hash order.
  *
  * EXACTNESS CONTRACT: while fewer than k distinct hashes have been seen,
  * the buffer IS the distinct hash set and the result is the exact
  * distinct count (modulo 64-bit hash collisions, ~n²/2⁶⁵) — sketches with
  * this property gate-check against `COUNT(DISTINCT …)`; the estimation
  * path (cardinality ≥ k, relative error ≈ 1/√(k−2)) is spec-asserted.
  */
object KMinValues {
  /** NDV from a sorted array of sign-flipped min-hashes: exact while the
    * sketch is unsaturated (the buffer IS the distinct hash set), the
    * (k-1)/U order-statistics estimate past k.
    */
  def estimate(k: Int, sortedMins: Array[Long]): Long =
    if (sortedMins.length < k) sortedMins.length.toLong
    else {
      // k-th minimum as a fraction of the hash space: flipped values are
      // uniform on [Long.Min, Long.Max] → u = v/2⁶⁴ + 0.5 ∈ (0, 1)
      val kth = sortedMins(k - 1)
      val u = kth.toDouble / 18446744073709551616.0 + 0.5
      Math.round((k - 1).toDouble / u)
    }
}

class KMinValues(k: Int) extends Aggregator[Long, mutable.HashSet[Long], Long] {
  require(k >= 16, "k too small for a meaningful estimate")

  private def flip(h: Long): Long = h ^ Long.MinValue

  // buffer is an unordered set trimmed to the k smallest whenever it grows
  // past 2k (amortized O(log) per insert; kryo round-trips HashSet
  // faithfully where sorted collections lose their ordering)
  private def trim(s: mutable.HashSet[Long]): mutable.HashSet[Long] =
    if (s.size <= 2 * k) s
    else {
      val kept = s.toArray.sorted.take(k)
      s.clear()
      s ++= kept
    }

  override def zero: mutable.HashSet[Long] = mutable.HashSet.empty[Long]

  override def reduce(s: mutable.HashSet[Long], x: Long): mutable.HashSet[Long] = {
    s.add(flip(x))
    trim(s)
  }

  override def merge(a: mutable.HashSet[Long], b: mutable.HashSet[Long]): mutable.HashSet[Long] = {
    a ++= b
    trim(a)
  }

  override def finish(s: mutable.HashSet[Long]): Long =
    KMinValues.estimate(k, s.toArray.sorted.take(k))

  override def bufferEncoder: Encoder[mutable.HashSet[Long]] =
    implicitly[Encoder[mutable.HashSet[Long]]](Encoders.kryo[mutable.HashSet[Long]])

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** [[KMinValues]] variant that outputs the sketch BUFFER (the k smallest
  * sign-flipped hashes, sorted) instead of the finished estimate, and
  * SKIPS NULL inputs — the persistence shape: the buffer is what a
  * Puffin-style stats file stores, because set-union-keep-k-smallest
  * makes it mergeable with the sketches of later-appended files while
  * the finished number is not. NULL skipping keeps `COUNT(DISTINCT …)`
  * semantics (xxhash64 maps NULL to the unchanged seed, which would
  * otherwise count as one phantom distinct value).
  */
class KMinValuesSketch(k: Int)
    extends Aggregator[java.lang.Long, mutable.HashSet[Long], Array[Long]] {
  require(k >= 16, "k too small for a meaningful estimate")

  private def flip(h: Long): Long = h ^ Long.MinValue

  private def trim(s: mutable.HashSet[Long]): mutable.HashSet[Long] =
    if (s.size <= 2 * k) s
    else {
      val kept = s.toArray.sorted.take(k)
      s.clear()
      s ++= kept
    }

  override def zero: mutable.HashSet[Long] = mutable.HashSet.empty[Long]

  override def reduce(s: mutable.HashSet[Long], x: java.lang.Long): mutable.HashSet[Long] =
    if (x == null) s
    else {
      s.add(flip(x.longValue()))
      trim(s)
    }

  override def merge(a: mutable.HashSet[Long], b: mutable.HashSet[Long]): mutable.HashSet[Long] = {
    a ++= b
    trim(a)
  }

  override def finish(s: mutable.HashSet[Long]): Array[Long] =
    s.toArray.sorted.take(k)

  override def bufferEncoder: Encoder[mutable.HashSet[Long]] =
    implicitly[Encoder[mutable.HashSet[Long]]](Encoders.kryo[mutable.HashSet[Long]])

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
